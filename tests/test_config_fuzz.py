"""Config-interaction fuzz: random knob combinations must solve without
crashing, respect budgets, and stay deterministic.

Complements the per-feature tests: knob interactions (sampler + CVaR +
mesh + fusion toggles + tournament + precision + qiskit ordering ...)
are drawn jointly, seeded, on tiny problems.
"""

from __future__ import annotations

from random import Random

import numpy as np
import pytest

from queasars_tpu.optim import BatchedNFT, BatchedSPSA, NFTConfig, SPSAConfig
from queasars_tpu.paulis import PauliSum, diagonal_energy_table
from queasars_tpu.problems.qubo import qubo_hamiltonian
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def _random_config(rng: Random, draw: int) -> EVQEMinimumEigensolverConfiguration:
    use_sampler_path = rng.random() < 0.4
    use_spsa = rng.random() < 0.3
    if use_spsa:
        optimizer = BatchedSPSA(
            SPSAConfig(
                maxiter=rng.choice([5, 8]),
                calibration_steps=3,
                cache_prefix=rng.choice([None, True, False]),
            )
        )
    else:
        optimizer = BatchedNFT(
            NFTConfig(
                maxiter=rng.choice([4, 7]),
                cache_prefix=rng.choice([None, True, False]),
                five_point=rng.random() < 0.2,
            )
        )
    kwargs = dict(
        configured_estimator=None
        if use_sampler_path
        else ConfiguredEstimator(
            precision=rng.choice([None, 0.02]), seed=draw
        ),
        configured_sampler=ConfiguredSampler(shots=rng.choice([64, 256]), seed=draw),
        distribution_alpha_tail=rng.choice([1.0, 0.5]) if use_sampler_path else 1.0,
        optimizer=optimizer,
        optimizer_n_circuit_evaluations=None,
        max_generations=rng.choice([2, 3]),
        max_circuit_evaluations=rng.choice([None, 400]),
        termination_criterion=None,
        random_seed=draw,
        population_size=rng.choice([4, 6]),
        speciation_genetic_distance_threshold=rng.choice([2, 3]),
        selection_alpha_penalty=rng.choice([0.0, 0.2]),
        selection_beta_penalty=rng.choice([0.0, 0.2]),
        parameter_search_probability=rng.choice([0.0, 0.5, 1.0]),
        topological_search_probability=rng.choice([0.0, 0.5]),
        layer_removal_probability=rng.choice([0.0, 0.3]),
        use_tournament_selection=True,
        tournament_size=2,
        parameter_order=rng.choice(["canonical", "qiskit"]),
        reuse_selection_energies=rng.choice([None, True, False]),
        n_devices=rng.choice([None, 2]),
    )
    return EVQEMinimumEigensolverConfiguration(**kwargs)


@pytest.mark.parametrize("draw", range(8))
def test_random_config_solves(draw):
    rng = Random(1000 + draw)
    operator, _ = qubo_hamiltonian(np.array([[-1.0, 0.7], [0.0, -2.0]]))
    config = _random_config(rng, draw)
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(operator)
    assert np.isfinite(float(result.eigenvalue))
    assert result.generations >= 1
    if config.max_generations is not None:
        assert result.generations <= config.max_generations
    assert result.best_individual is not None
    assert sum(result.circuit_evaluations) > 0
    # energies can never undershoot the exact spectrum floor by more than
    # the configured noise scales
    floor = float(diagonal_energy_table(operator).min())
    assert float(result.eigenvalue) >= floor - 1.0

    # determinism: the identical configuration reproduces the eigenvalue
    repeat = EVQEMinimumEigensolver(_random_config(Random(1000 + draw), draw))
    assert float(repeat.compute_minimum_eigenvalue(operator).eigenvalue) == float(
        result.eigenvalue
    )
