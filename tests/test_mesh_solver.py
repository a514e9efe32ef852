"""Mesh-integrated solver tests: a full EVQE solve sharded over devices.

The reference's parallelism story is that the *solve* scales across
workers (selection.py:75-84, mutation.py:206-218, executor plumbing
base/evolutionary_algorithm.py:110-118).  Here that seam is the
``mesh``/``n_devices`` configuration knob: the whole generation pipeline
runs with the population axis sharded.  The gate assertion (SURVEY.md §7
stage 6): seeded solves are bit-identical on a 1-device and an 8-device
mesh.
"""

import numpy as np

from queasars_tpu.parallel import population_mesh
from queasars_tpu.paulis import PauliSum, pauli_z_string
from queasars_tpu.optim.nft import BatchedNFT, NFTConfig
from queasars_tpu.optim.spsa import BatchedSPSA, SPSAConfig
from queasars_tpu.solver.configured_evaluators import ConfiguredEstimator, ConfiguredSampler
from queasars_tpu.solver.evqe import EVQEMinimumEigensolver, EVQEMinimumEigensolverConfiguration


N_QUBITS = 4


def _hamiltonian():
    return PauliSum.sum(
        [pauli_z_string(q, N_QUBITS) * float(q + 1) for q in range(N_QUBITS)]
    )


def _solve(n_devices, *, sampler=False, optimizer=None, generations=3, precision=None):
    configuration = EVQEMinimumEigensolverConfiguration(
        configured_estimator=None if sampler else ConfiguredEstimator(precision=precision, seed=7),
        configured_sampler=ConfiguredSampler(shots=256, seed=5) if sampler else None,
        optimizer=optimizer or BatchedNFT(NFTConfig(maxiter=6)),
        optimizer_n_circuit_evaluations=None,
        max_generations=generations,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=11,
        population_size=10,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.5,
        topological_search_probability=0.7,
        layer_removal_probability=0.3,
        use_tournament_selection=True,
        tournament_size=2,
        mesh=population_mesh(n_devices) if n_devices else None,
    )
    solver = EVQEMinimumEigensolver(configuration)
    return solver.compute_minimum_eigenvalue(_hamiltonian())


def _assert_identical_trajectories(result_a, result_b):
    assert result_a.generations == result_b.generations
    for gen_a, gen_b in zip(
        result_a.population_evaluation_results, result_b.population_evaluation_results
    ):
        assert gen_a.expectation_values == gen_b.expectation_values
        assert gen_a.best_individual == gen_b.best_individual
    assert result_a.eigenvalue == result_b.eigenvalue
    assert result_a.best_individual == result_b.best_individual
    assert result_a.circuit_evaluations == result_b.circuit_evaluations


def test_estimator_solve_bit_identical_1_vs_8_devices():
    result_1 = _solve(1)
    result_8 = _solve(8)
    _assert_identical_trajectories(result_1, result_8)
    assert result_1.generations == 3


def test_sampler_solve_bit_identical_1_vs_8_devices():
    """Shot noise uses per-individual keys, so the sampled trajectory must
    not depend on how the population is sharded."""
    result_1 = _solve(1, sampler=True)
    result_8 = _solve(8, sampler=True)
    _assert_identical_trajectories(result_1, result_8)


def test_spsa_solve_bit_identical_1_vs_8_devices():
    optimizer = BatchedSPSA(SPSAConfig(maxiter=4, learning_rate=0.1, perturbation=0.2))
    result_1 = _solve(1, optimizer=optimizer, generations=2)
    result_8 = _solve(8, optimizer=optimizer, generations=2)
    _assert_identical_trajectories(result_1, result_8)


def test_precision_noise_solve_bit_identical_1_vs_8_devices():
    """The estimator precision knob draws per-individual noise — also
    shard-invariant."""
    result_1 = _solve(1, precision=0.05, generations=2)
    result_8 = _solve(8, precision=0.05, generations=2)
    _assert_identical_trajectories(result_1, result_8)


def test_mesh_solve_reaches_ground_state_energy():
    """With the full pipeline sharded over all 8 devices the solve still
    optimizes: the Z-chain ground state energy is -sum(q+1) = -10."""
    result = _solve(8, generations=4)
    assert result.eigenvalue < -6.0


def test_population_smaller_than_mesh():
    """pop < n_devices: padding fills whole devices with masked
    individuals; results still match the 1-device mesh exactly."""
    configuration = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=4)),
        optimizer_n_circuit_evaluations=None,
        max_generations=2,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=2,
        population_size=3,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.5,
        topological_search_probability=0.5,
        layer_removal_probability=0.1,
        use_tournament_selection=True,
        tournament_size=2,
        mesh=population_mesh(8),
    )
    result_8 = EVQEMinimumEigensolver(configuration).compute_minimum_eigenvalue(_hamiltonian())
    from dataclasses import replace

    result_1 = EVQEMinimumEigensolver(
        replace(configuration, mesh=population_mesh(1))
    ).compute_minimum_eigenvalue(_hamiltonian())
    _assert_identical_trajectories(result_1, result_8)
