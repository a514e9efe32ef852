"""EVQE on a plain diagonal Pauli-sum (QUBO-style problem).

Script counterpart of the reference's evqe_optimization.ipynb: minimize a
two-integer-variable quadratic objective encoded as an Ising Hamiltonian,
asserting the solver recovers the exact optimum (the reference's E2E
anchor, test_evqe_algorithm.py:23-38, minimizes (x - 2)^2 + (y - 3)^2-style
objectives the same way).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import numpy as np

from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum, diagonal_energy_table, pauli_z_string
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def encode_integer_objective() -> tuple[PauliSum, int]:
    """Objective f(x, y) = (x - 0)^2 + (y - 3)^2 over 2-bit integers x, y
    (optimum at x=0, y=3), encoded as a diagonal Pauli sum on 4 qubits via
    bit indicators n_q = (I - Z_q)/2."""
    n = 4
    identity = PauliSum.identity(n)

    def bit(q):  # indicator of qubit q being 1
        return (identity - pauli_z_string(q, n)) * 0.5

    # x = b0 + 2 b1 (qubits 0,1), y = b2 + 2 b3 (qubits 2,3)
    def integer(q0, q1):
        return bit(q0) + bit(q1) * 2.0

    x = integer(0, 1)
    y = integer(2, 3)
    three = identity * 3.0
    objective = x @ x + (y - three) @ (y - three)
    return objective.simplify(), n


def main() -> None:
    hamiltonian, n = encode_integer_objective()
    table = diagonal_energy_table(hamiltonian)
    exact_minimum = float(table.min())
    exact_state = int(np.argmin(table))
    print(f"exact optimum: state {exact_state:0{n}b} with value {exact_minimum}")

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=2048, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=40)),
        optimizer_n_circuit_evaluations=None,
        max_generations=10,
        max_circuit_evaluations=20000,
        termination_criterion=None,
        random_seed=0,
        population_size=10,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.25,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
        use_tournament_selection=True,
        tournament_size=2,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)
    likeliest = max(result.eigenstate, key=result.eigenstate.get)
    x = (likeliest & 1) + 2 * ((likeliest >> 1) & 1)
    y = ((likeliest >> 2) & 1) + 2 * ((likeliest >> 3) & 1)
    print(f"EVQE eigenvalue {result.eigenvalue:.4f}; likeliest state decodes to x={x}, y={y}")
    assert (x, y) == (0, 3), "expected the exact optimum [0, 3]"
    print("exact optimum recovered")


if __name__ == "__main__":
    main()
