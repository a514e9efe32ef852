"""Non-diagonal Hamiltonian support: batched NFT and the full EVQE solve
on a transverse-field Ising model (the BASELINE.json config-2 family).

The reference supports arbitrary operators through its estimator path;
here the batched optimizers use the matrix-free general Pauli objective.
"""

import numpy as np
import pytest

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum
from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def tfim(n: int, g: float = 1.0) -> PauliSum:
    from queasars_tpu.problems.spin_chains import transverse_field_ising

    return transverse_field_ising(n, coupling=1.0, field=g)


@pytest.fixture(scope="module")
def tfim_problem():
    n = 4
    hamiltonian = tfim(n, g=1.0)
    ground_energy = float(np.linalg.eigvalsh(hamiltonian.to_dense_matrix())[0])
    return n, hamiltonian, ground_energy


def test_batched_nft_on_tfim(tfim_problem):
    n, hamiltonian, ground_energy = tfim_problem
    evaluator = StatevectorExpectationEvaluator(hamiltonian)
    population = EVQEPopulation.random_population(n, 3, 8, True, random_seed=0)
    packed = PackedPopulation.pack(list(population.individuals))
    coords = np.stack(
        [
            np.pad(packed.param_coordinates(i), ((0, int(packed.n_params.max()) - packed.n_params[i]), (0, 0)))
            for i in range(8)
        ]
    )
    before = evaluator.evaluate_packed(packed)
    # non-diagonal H: CU3-theta picks up half-harmonics, so NFT steps are
    # approximate — a small reset_interval keeps the recycled z0 honest
    # (see the exactness caveat in optim/nft.py)
    angles, energies, _ = BatchedNFT(NFTConfig(maxiter=40, reset_interval=4)).minimize(
        evaluator, packed, coords, packed.n_params, np.ones(8, bool)
    )
    after = evaluator.evaluate_packed(packed, angles=angles)
    assert after.sum() < before.sum()
    # the best individual should get close to the true ground state
    assert after.min() < ground_energy + 1.5


def test_nft_recycling_exact_for_pure_rotations_on_tfim(tfim_problem):
    """Without CU3 gates the single-harmonic fit is exact even for
    non-diagonal Hamiltonians: recycled minima match fresh evaluations."""
    from queasars_tpu.genome import EVQECircuitLayer, EVQEIndividual, RotationGate

    n, hamiltonian, _ = tfim_problem
    layer = EVQECircuitLayer(
        n_qubits=n, gates=tuple(RotationGate(qubit_index=q) for q in range(n))
    )
    rng = np.random.default_rng(0)
    individuals = [
        EVQEIndividual(
            n_qubits=n,
            layers=(layer,),
            parameter_values=tuple(rng.uniform(0, 2 * np.pi, 3 * n)),
        )
        for _ in range(4)
    ]
    evaluator = StatevectorExpectationEvaluator(hamiltonian)
    packed = PackedPopulation.pack(individuals)
    coords = np.stack([packed.param_coordinates(i) for i in range(4)])
    angles, energies, _ = BatchedNFT(NFTConfig(maxiter=30, reset_interval=999)).minimize(
        evaluator, packed, coords, packed.n_params, np.ones(4, bool)
    )
    after = evaluator.evaluate_packed(packed, angles=angles)
    np.testing.assert_allclose(energies, after, atol=1e-3)


def test_five_point_nft_exact_with_cu3_on_tfim(tfim_problem):
    """The five-point NFT variant handles CU3 half-harmonics: recycled
    minima match fresh evaluations even for CROT-bearing circuits against
    a non-diagonal Hamiltonian (where 3-point NFT — and qiskit's — is
    only approximate), and it reaches at least as low an energy."""
    n, hamiltonian, ground_energy = tfim_problem
    evaluator = StatevectorExpectationEvaluator(hamiltonian)
    population = EVQEPopulation.random_population(n, 3, 8, True, random_seed=0)
    packed = PackedPopulation.pack(list(population.individuals))
    coords = np.stack(
        [
            np.pad(packed.param_coordinates(i), ((0, int(packed.n_params.max()) - packed.n_params[i]), (0, 0)))
            for i in range(8)
        ]
    )
    assert any(ind.get_n_controlled_gates() > 0 for ind in population.individuals)

    angles, energies, nfev = BatchedNFT(NFTConfig(maxiter=40, reset_interval=999, five_point=True)).minimize(
        evaluator, packed, coords, packed.n_params, np.ones(8, bool)
    )
    after = evaluator.evaluate_packed(packed, angles=angles)
    # exact fit => recycled z0 stays honest over 40 unreset steps
    np.testing.assert_allclose(energies, after, atol=2e-3)
    assert nfev == 4 * 40 + 1  # 4 evals/step + 1 initial reset

    # and it optimizes at least as well as the approximate 3-point variant
    angles3, _, _ = BatchedNFT(NFTConfig(maxiter=40, reset_interval=4)).minimize(
        evaluator, packed, coords, packed.n_params, np.ones(8, bool)
    )
    after3 = evaluator.evaluate_packed(packed, angles=angles3)
    assert after.sum() <= after3.sum() + 0.5


def test_full_evqe_solve_on_tfim(tfim_problem):
    n, hamiltonian, ground_energy = tfim_problem
    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=30)),
        optimizer_n_circuit_evaluations=None,
        max_generations=5,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=8,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.05,
        selection_beta_penalty=0.05,
        parameter_search_probability=0.4,
        topological_search_probability=0.5,
        layer_removal_probability=0.05,
        use_tournament_selection=True,  # TFIM energies are negative
        tournament_size=2,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)
    # ground energy of 4-site TFIM at g=1 is about -4.76
    assert result.eigenvalue < ground_energy + 1.0
    assert result.eigenvalue >= ground_energy - 1e-3  # variational bound
