"""Seeded trajectory determinism: identical configs produce identical
solves — the run-to-run reproducibility contract.

Reference *parity* (as opposed to self-consistency) is pinned elsewhere:
genome structures/draws against a reference-derived oracle + static
fixtures (test_reference_fixtures.py), the reference's E2E anchor
(test_reference_anchor.py), and committed solve-trajectory fixtures
(test_trajectory_fixtures.py)."""

import numpy as np

from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.problems.jssp import JSSPDomainWallHamiltonianEncoder
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)

from tests.jssp_fixtures import problem_instance


def run_solve(seed):
    encoder = JSSPDomainWallHamiltonianEncoder(jssp_instance=problem_instance(), makespan_limit=3)
    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=1024, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=15)),
        optimizer_n_circuit_evaluations=None,
        max_generations=3,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=seed,
        population_size=6,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.3,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
    )
    return EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(
        encoder.get_problem_hamiltonian()
    )


def test_identical_seeds_identical_trajectories():
    a = run_solve(seed=0)
    b = run_solve(seed=0)
    assert a.eigenvalue == b.eigenvalue
    assert a.best_individual == b.best_individual
    assert a.circuit_evaluations == b.circuit_evaluations
    assert a.eigenstate == b.eigenstate
    # full per-generation trajectories match
    for result_a, result_b in zip(a.population_evaluation_results, b.population_evaluation_results):
        assert result_a.expectation_values == result_b.expectation_values
        assert result_a.population.individuals == result_b.population.individuals


def test_different_seeds_differ():
    a = run_solve(seed=0)
    c = run_solve(seed=1)
    assert (
        a.best_individual != c.best_individual
        or a.circuit_evaluations != c.circuit_evaluations
        or not np.isclose(a.eigenvalue, c.eigenvalue)
    )
