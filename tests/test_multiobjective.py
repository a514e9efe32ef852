"""MoG-VQE multi-objective search tests: NSGA-II machinery and a full
solve on a Heisenberg chain (BASELINE config-5 family: energy vs
two-qubit-gate count)."""

import numpy as np
import pytest

from queasars_tpu.evolve.multiobjective import (
    crowding_distance,
    non_dominated_sort,
    pareto_front,
)
from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum
from queasars_tpu.solver import ConfiguredEstimator, EVQEMinimumEigensolverConfiguration
from queasars_tpu.solver.mog_vqe import MoGVQEMinimumEigensolver, result_pareto_front


def heisenberg(n: int, j: float = 1.0) -> PauliSum:
    from queasars_tpu.problems.spin_chains import heisenberg_chain

    return heisenberg_chain(n, coupling=j)


def test_non_dominated_sort():
    objectives = np.array([
        [1.0, 5.0],   # front 0
        [2.0, 2.0],   # front 0
        [5.0, 1.0],   # front 0
        [2.0, 6.0],   # dominated by [1,5]
        [6.0, 6.0],   # dominated by everything above
    ])
    fronts = non_dominated_sort(objectives)
    assert sorted(fronts[0]) == [0, 1, 2]
    assert fronts[1] == [3]
    assert fronts[2] == [4]


def test_crowding_distance_extremes_infinite():
    objectives = np.array([[0.0, 3.0], [1.0, 2.0], [2.0, 1.0], [3.0, 0.0]])
    distance = crowding_distance(objectives, [0, 1, 2, 3])
    assert np.isinf(distance[0]) and np.isinf(distance[3])
    assert np.isfinite(distance[1]) and np.isfinite(distance[2])


def test_pareto_front_helper():
    population = EVQEPopulation.random_population(3, 2, 6, True, random_seed=0)
    individuals = list(population.individuals)
    energies = [3.0, 1.0, 2.0, 1.5, 4.0, 0.5]
    front = pareto_front(individuals, energies)
    # every front member must be non-dominated
    for ind, energy, gates in front:
        for other, other_e, other_g in zip(
            individuals, energies, [i.get_n_controlled_gates() for i in individuals]
        ):
            assert not (other_e <= energy and other_g <= gates and (other_e < energy or other_g < gates))


def test_mog_vqe_solve_heisenberg():
    n = 3
    hamiltonian = heisenberg(n)
    ground = float(np.linalg.eigvalsh(hamiltonian.to_dense_matrix())[0])
    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=25, reset_interval=4)),
        optimizer_n_circuit_evaluations=None,
        max_generations=5,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=8,
        speciation_genetic_distance_threshold=2,  # unused by MoG-VQE
        selection_alpha_penalty=0.0,
        selection_beta_penalty=0.0,
        parameter_search_probability=0.4,
        topological_search_probability=0.5,
        layer_removal_probability=0.05,
    )
    result = MoGVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)
    assert result.eigenvalue >= ground - 1e-3  # variational bound
    assert result.eigenvalue < 0.0  # made real progress below E=0

    front = result_pareto_front(result)
    assert len(front) >= 1
    # the front is sorted-compatible: no member dominates another
    for a_ind, a_e, a_g in front:
        for b_ind, b_e, b_g in front:
            if a_ind is b_ind:
                continue
            assert not (a_e <= b_e and a_g <= b_g and (a_e < b_e or a_g < b_g))
    # the front contains the generation's best-energy individual
    final = result.final_population_evaluation_result
    best_energy = min(final.expectation_values)
    assert any(abs(e - best_energy) < 1e-9 for _, e, _ in front)


def test_mog_vqe_mesh_solve_matches_single_device():
    """MoG-VQE accepts the mesh knobs too: a non-diagonal (Heisenberg)
    solve sharded over the 8-device mesh matches 1-device.

    Tolerance note: on the CPU-emulated mesh, XLA picks different
    vectorized-vs-scalar transcendental code paths for different local
    batch widths, so the general (non-diagonal) path can differ by an
    ulp that NFT then amplifies slightly; the diagonal hot path is
    bit-identical (test_mesh_solver.py), and on real TPU meshes the VPU
    evaluates transcendentals identically at every shape."""
    from queasars_tpu.parallel import population_mesh

    n = 3
    hamiltonian = heisenberg(n)

    def solve(n_devices):
        config = EVQEMinimumEigensolverConfiguration(
            configured_estimator=ConfiguredEstimator(),
            configured_sampler=None,
            optimizer=BatchedNFT(NFTConfig(maxiter=6)),
            optimizer_n_circuit_evaluations=None,
            max_generations=2,
            max_circuit_evaluations=None,
            termination_criterion=None,
            random_seed=3,
            population_size=6,
            speciation_genetic_distance_threshold=2,
            selection_alpha_penalty=0.0,
            selection_beta_penalty=0.0,
            parameter_search_probability=0.4,
            topological_search_probability=0.5,
            layer_removal_probability=0.05,
            mesh=population_mesh(n_devices),
        )
        return MoGVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)

    result_1 = solve(1)
    result_8 = solve(8)
    assert result_1.eigenvalue == pytest.approx(result_8.eigenvalue, abs=1e-5)
    for gen_a, gen_b in zip(
        result_1.population_evaluation_results, result_8.population_evaluation_results
    ):
        np.testing.assert_allclose(
            gen_a.expectation_values, gen_b.expectation_values, atol=1e-3
        )
