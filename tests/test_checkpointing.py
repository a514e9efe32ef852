"""Full-solver-state checkpointing: crash-resume reproduces the exact
uninterrupted trajectory (operator RNGs, ledger, best-so-far, evaluator
randomness all restored — solver/checkpoint.py)."""

import os

from queasars_tpu.genome.serialization import load_population
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum, pauli_z_string
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def make_config(**overrides):
    defaults = dict(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=10)),
        optimizer_n_circuit_evaluations=None,
        max_generations=3,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=6,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.3,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
        use_tournament_selection=True,
        tournament_size=2,
    )
    defaults.update(overrides)
    return EVQEMinimumEigensolverConfiguration(**defaults)


def _hamiltonian():
    return PauliSum.sum([pauli_z_string(q, 3) for q in range(3)])


def _trajectory(result):
    return [
        (gen.expectation_values, gen.best_expectation_value)
        for gen in result.population_evaluation_results
    ]


def test_checkpoint_written_and_population_loadable(tmp_path):
    path = os.path.join(tmp_path, "state.json")
    EVQEMinimumEigensolver(make_config(checkpoint_path=path)).compute_minimum_eigenvalue(
        _hamiltonian()
    )
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")  # atomic replace cleaned up
    population = load_population(path)
    assert len(population.individuals) == 6


def test_resume_reproduces_uninterrupted_trajectory(tmp_path):
    """The headline guarantee: crash after generation 2, resume, and the
    remaining generations are bit-identical to the run that never
    crashed."""
    hamiltonian = _hamiltonian()
    path = os.path.join(tmp_path, "state.json")

    uninterrupted = EVQEMinimumEigensolver(
        make_config(max_generations=5)
    ).compute_minimum_eigenvalue(hamiltonian)

    # "crash" after two generations, then resume up to five
    EVQEMinimumEigensolver(
        make_config(max_generations=2, checkpoint_path=path)
    ).compute_minimum_eigenvalue(hamiltonian)
    resumed = EVQEMinimumEigensolver(
        make_config(max_generations=5, resume_from_checkpoint=path)
    ).compute_minimum_eigenvalue(hamiltonian)

    assert resumed.generations == uninterrupted.generations == 5
    assert _trajectory(resumed) == _trajectory(uninterrupted)
    assert resumed.eigenvalue == uninterrupted.eigenvalue
    assert resumed.best_individual == uninterrupted.best_individual
    assert resumed.circuit_evaluations == uninterrupted.circuit_evaluations


def test_resume_reproduces_sampler_shot_stream(tmp_path):
    """The sampler evaluator's shot-key counter is part of the checkpoint,
    so resumed shot noise continues the uninterrupted stream."""
    hamiltonian = _hamiltonian()
    path = os.path.join(tmp_path, "state.json")
    sampler_overrides = dict(
        configured_estimator=None,
        configured_sampler=ConfiguredSampler(shots=128, seed=9),
    )

    uninterrupted = EVQEMinimumEigensolver(
        make_config(max_generations=4, **sampler_overrides)
    ).compute_minimum_eigenvalue(hamiltonian)

    EVQEMinimumEigensolver(
        make_config(max_generations=2, checkpoint_path=path, **sampler_overrides)
    ).compute_minimum_eigenvalue(hamiltonian)
    resumed = EVQEMinimumEigensolver(
        make_config(max_generations=4, resume_from_checkpoint=path, **sampler_overrides)
    ).compute_minimum_eigenvalue(hamiltonian)

    assert _trajectory(resumed) == _trajectory(uninterrupted)
    assert resumed.eigenvalue == uninterrupted.eigenvalue


def test_resume_reproduces_precision_noise_stream(tmp_path):
    """The estimator precision-noise generator state round-trips too."""
    hamiltonian = _hamiltonian()
    path = os.path.join(tmp_path, "state.json")
    noisy = dict(configured_estimator=ConfiguredEstimator(precision=0.05, seed=3))

    uninterrupted = EVQEMinimumEigensolver(
        make_config(max_generations=4, **noisy)
    ).compute_minimum_eigenvalue(hamiltonian)

    EVQEMinimumEigensolver(
        make_config(max_generations=2, checkpoint_path=path, **noisy)
    ).compute_minimum_eigenvalue(hamiltonian)
    resumed = EVQEMinimumEigensolver(
        make_config(max_generations=4, resume_from_checkpoint=path, **noisy)
    ).compute_minimum_eigenvalue(hamiltonian)

    assert _trajectory(resumed) == _trajectory(uninterrupted)


def test_population_only_resume_still_supported(tmp_path):
    """Backward-compatible path: start a fresh solve from a checkpointed
    population via initial_population."""
    hamiltonian = _hamiltonian()
    path = os.path.join(tmp_path, "state.json")
    result = EVQEMinimumEigensolver(
        make_config(checkpoint_path=path)
    ).compute_minimum_eigenvalue(hamiltonian)
    population = load_population(path)
    resumed = EVQEMinimumEigensolver(
        make_config(max_generations=1, initial_population=population, random_seed=1)
    ).compute_minimum_eigenvalue(hamiltonian)
    assert resumed.eigenvalue <= result.eigenvalue + 1e-6
