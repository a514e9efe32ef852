"""TSP and graph-coloring encodings: exhaustive-spectrum oracles plus an
end-to-end solve (same validation style as the JSSP/QUBO encoders)."""

from __future__ import annotations

from itertools import permutations

import numpy as np
import pytest

from queasars_tpu.paulis import diagonal_energy_table
from queasars_tpu.problems.qubo import (
    decode_coloring,
    decode_tsp_tour,
    graph_coloring_hamiltonian,
    tour_length,
    tsp_hamiltonian,
)


def test_tsp_spectrum_exhaustive():
    """3 asymmetric cities (9 qubits): every valid-tour state's energy is
    exactly its tour length; every invalid state sits at least `penalty`
    above the worst valid tour."""
    d = np.array([[0.0, 1.0, 4.0], [2.0, 0.0, 1.0], [1.0, 3.0, 0.0]])
    n = 3
    hamiltonian, offset = tsp_hamiltonian(d)
    table = np.asarray(diagonal_energy_table(hamiltonian), dtype=float) + offset

    tour_lengths = {
        tuple(p): tour_length(p, d) for p in permutations(range(n))
    }
    best = min(tour_lengths.values())
    worst = max(tour_lengths.values())
    penalty = n * d.max() + 1.0

    n_valid = 0
    for state in range(1 << (n * n)):
        tour = decode_tsp_tour(state, n)
        if tour is not None:
            n_valid += 1
            assert table[state] == pytest.approx(tour_lengths[tuple(tour)], abs=1e-6)
        else:
            # at least one broken one-hot constraint costs >= penalty
            assert table[state] >= penalty - 1e-6
    assert n_valid == 6  # 3! permutations
    # the global minimum decodes to an optimal tour
    state = int(np.argmin(table))
    tour = decode_tsp_tour(state, n)
    assert tour is not None
    assert tour_lengths[tuple(tour)] == pytest.approx(best)


def test_coloring_spectrum_exhaustive():
    """Triangle with 3 colors (9 qubits): proper colorings at energy 0,
    monochromatic edges cost conflict_weight, broken one-hots >= penalty."""
    edges = [(0, 1), (1, 2), (0, 2)]
    hamiltonian, offset = graph_coloring_hamiltonian(
        3, edges, 3, penalty=4.0, conflict_weight=1.0
    )
    table = np.asarray(diagonal_energy_table(hamiltonian), dtype=float) + offset
    n_proper = 0
    for state in range(1 << 9):
        colors = decode_coloring(state, 3, 3)
        if colors is None:
            assert table[state] >= 4.0 - 1e-6
            continue
        conflicts = sum(colors[u] == colors[v] for u, v in edges)
        assert table[state] == pytest.approx(float(conflicts), abs=1e-6)
        if conflicts == 0:
            n_proper += 1
    assert n_proper == 6  # 3! proper colorings of a triangle


def test_coloring_infeasible_graph():
    """A triangle with 2 colors has no zero-energy state; the minimum over
    valid assignments is exactly one conflict."""
    edges = [(0, 1), (1, 2), (0, 2)]
    hamiltonian, offset = graph_coloring_hamiltonian(
        3, edges, 2, penalty=4.0, conflict_weight=1.0
    )
    table = np.asarray(diagonal_energy_table(hamiltonian), dtype=float) + offset
    assert table.min() == pytest.approx(1.0, abs=1e-6)
    state = int(np.argmin(table))
    colors = decode_coloring(state, 3, 2)
    assert colors is not None


def test_tsp_e2e_solve():
    """EVQE finds an optimal 3-city tour (9 qubits)."""
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        ConfiguredSampler,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    d = np.array([[0.0, 1.0, 4.0], [2.0, 0.0, 1.0], [1.0, 3.0, 0.0]])
    hamiltonian, offset = tsp_hamiltonian(d)
    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=2048, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=20)),
        optimizer_n_circuit_evaluations=None,
        max_generations=6,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=1,
        population_size=8,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.2,
        selection_beta_penalty=0.2,
        parameter_search_probability=0.3,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
        use_tournament_selection=True,
        tournament_size=2,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)
    best_state = max(result.eigenstate, key=result.eigenstate.get)
    tour = decode_tsp_tour(best_state, 3)
    assert tour is not None
    assert tour_length(tour, d) == pytest.approx(3.0)  # optimal cycle 0->1->2->0
