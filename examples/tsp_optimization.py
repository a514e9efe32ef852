"""Travelling salesman with EVQE: native one-hot TSP encoding.

Three asymmetric cities (9 qubits) — the tour length is read straight
off the diagonal Hamiltonian; no docplex/qiskit-optimization needed.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import numpy as np

from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.problems.qubo import decode_tsp_tour, tour_length, tsp_hamiltonian
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def main() -> None:
    distances = np.array(
        [[0.0, 1.0, 4.0], [2.0, 0.0, 1.0], [1.0, 3.0, 0.0]]
    )
    hamiltonian, offset = tsp_hamiltonian(distances)
    print(f"{hamiltonian.n_qubits} qubits, {hamiltonian.n_terms} Pauli terms")

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
    tour = decode_tsp_tour(best_state, len(distances))
    print(f"best energy {float(result.eigenvalue) + offset:+.4f} "
          f"after {result.generations} generations")
    if tour is None:
        print("likeliest state violates the one-hot constraints (increase budget)")
        return
    print(f"tour: {' -> '.join(map(str, tour + [tour[0]]))} "
          f"(length {tour_length(tour, distances):.1f})")


if __name__ == "__main__":
    main()
