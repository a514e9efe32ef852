"""Configuration validation and error-surface tests."""

import pytest

from queasars_tpu.genome.parameter_order import set_parameter_order
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.parallel import population_mesh
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
        optimizer=BatchedNFT(NFTConfig(maxiter=4)),
        optimizer_n_circuit_evaluations=None,
        max_generations=1,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=4,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.3,
        topological_search_probability=0.3,
        layer_removal_probability=0.1,
    )
    defaults.update(overrides)
    return EVQEMinimumEigensolverConfiguration(**defaults)


def test_no_stopping_condition_rejected():
    with pytest.raises(ValueError, match="stopping condition"):
        make_config(max_generations=None)


def test_probability_range_validated():
    with pytest.raises(ValueError, match="parameter_search_probability"):
        make_config(parameter_search_probability=1.5)


def test_tournament_knobs_validated():
    with pytest.raises(ValueError, match="tournament_size"):
        make_config(use_tournament_selection=True, tournament_size=None)
    with pytest.raises(ValueError, match="positive"):
        make_config(use_tournament_selection=True, tournament_size=0)
    with pytest.raises(ValueError, match="exceed"):
        make_config(use_tournament_selection=True, tournament_size=9)


def test_negative_precision_rejected():
    with pytest.raises(ValueError, match="non-negative"):
        ConfiguredEstimator(precision=-0.1)


def test_invalid_parameter_order_rejected():
    with pytest.raises(ValueError, match="unknown parameter order"):
        set_parameter_order("alphabetic")


def test_shard_amplitudes_sampler_path_supported():
    """Round 3: a sampler-only configuration may shard amplitudes (the
    round-2 restriction is lifted; distributed finite-shot sampling)."""
    import numpy as np

    config = make_config(
        configured_estimator=None,
        configured_sampler=ConfiguredSampler(shots=64),
        shard_amplitudes=True,
        mesh=population_mesh(2),
    )
    hamiltonian = PauliSum.sum([pauli_z_string(q, 3) for q in range(3)])
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)
    assert np.isfinite(result.eigenvalue)


def test_shard_amplitudes_accepts_initial_state():
    """Round 3: the sharded evaluator prepares the start state once,
    amp-sharded (the round-2 restriction is lifted)."""
    import numpy as np

    config = make_config(shard_amplitudes=True, mesh=population_mesh(2))
    hamiltonian = PauliSum.sum([pauli_z_string(q, 3) for q in range(3)])
    state = np.zeros(8, np.complex64)
    state[0] = 1.0
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue_with_initial_state(
        hamiltonian, initial_state=state
    )
    assert np.isfinite(result.eigenvalue)


def test_resume_from_missing_checkpoint_raises():
    config = make_config(resume_from_checkpoint="/nonexistent/ckpt.json")
    hamiltonian = PauliSum.sum([pauli_z_string(q, 3) for q in range(3)])
    with pytest.raises(FileNotFoundError):
        EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)
