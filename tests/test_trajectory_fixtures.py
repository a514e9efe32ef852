"""Committed solve-trajectory fixtures: regression guard for the full
pipeline's numerics.

Two pinned configurations (exact estimator path, canonical and qiskit
parameter ordering) have their per-generation best-energy trajectories
committed to tests/fixtures/solve_trajectories.json.  Any change to the
engine, optimizers, operators or RNG plumbing that alters seeded solve
trajectories fails here loudly instead of drifting silently — the
trajectory-level complement of the structure-level reference fixtures.

Regenerate intentionally with:
    python tests/test_trajectory_fixtures.py --regenerate
(run under the test environment: JAX_PLATFORMS=cpu, 8 virtual devices).
"""

import json
import os

import pytest

FIXTURE_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "solve_trajectories.json")


def _solve(parameter_order: str, seed: int):
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.paulis import PauliSum, pauli_z_string
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    hamiltonian = PauliSum.sum([pauli_z_string(q, 4) * float(q + 1) for q in range(4)])
    configuration = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=8)),
        optimizer_n_circuit_evaluations=None,
        max_generations=3,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=seed,
        population_size=6,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.4,
        topological_search_probability=0.5,
        layer_removal_probability=0.1,
        use_tournament_selection=True,
        tournament_size=2,
        parameter_order=parameter_order,
    )
    result = EVQEMinimumEigensolver(configuration).compute_minimum_eigenvalue(hamiltonian)
    return {
        "parameter_order": parameter_order,
        "seed": seed,
        "best_per_generation": [
            gen.best_expectation_value for gen in result.population_evaluation_results
        ],
        "eigenvalue": result.eigenvalue,
        "circuit_evaluations": result.circuit_evaluations,
    }


CASES = [("canonical", 0), ("canonical", 7), ("qiskit", 0)]


def compute_all():
    return [_solve(order, seed) for order, seed in CASES]


@pytest.mark.parametrize("index", range(len(CASES)))
def test_pinned_solve_trajectory(index):
    with open(FIXTURE_PATH) as fh:
        fixtures = json.load(fh)
    order, seed = CASES[index]
    got = _solve(order, seed)
    want = fixtures[index]
    assert want["parameter_order"] == order and want["seed"] == seed
    assert got == want


if __name__ == "__main__":
    import sys

    if "--regenerate" in sys.argv:
        os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
        with open(FIXTURE_PATH, "w") as fh:
            json.dump(compute_all(), fh, indent=1)
        print(f"wrote {FIXTURE_PATH}")
