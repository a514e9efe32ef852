"""QAOA on weighted MaxCut: fixed-ansatz baseline next to the VQE family.

A 6-node weighted graph (6 qubits): the cost layer is an exact
elementwise phase by the diagonal energy table, the mixer a
transverse-field RX layer, and eight random (gamma, beta) schedules
descend with Adam inside one jitted scan.  The best measured bitstring
decodes straight into a graph partition.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import numpy as np

from queasars_tpu.problems import maxcut_hamiltonian
from queasars_tpu.solver import QAOAConfiguration, QAOAMinimumEigensolver


def main() -> None:
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (2, 4), (3, 5), (4, 5), (1, 4)]
    weights = [1.0, 2.0, 1.0, 1.5, 1.0, 2.0, 1.0, 0.5]
    hamiltonian, offset = maxcut_hamiltonian(6, edges, weights)
    print(f"{hamiltonian.n_qubits} qubits, {hamiltonian.n_terms} Pauli terms")

    config = QAOAConfiguration(
        reps=3,
        n_starts=8,
        maxiter=200,
        learning_rate=0.05,
        shots=1024,
        seed=7,
    )
    result = QAOAMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)

    cut_value = offset - result.best_bitstring_energy
    partition = [(result.best_bitstring >> q) & 1 for q in range(6)]
    print(f"optimized <H> = {result.eigenvalue:.4f}  (offset {offset:.2f})")
    print(f"best sampled cut value = {cut_value:.2f}")
    print(f"partition: {partition}")
    crossing = [
        (i, j, w)
        for (i, j), w in zip(edges, weights)
        if partition[i] != partition[j]
    ]
    print(f"edges cut: {[(i, j) for i, j, _ in crossing]}")
    assert abs(sum(w for _, _, w in crossing) - cut_value) < 1e-9


if __name__ == "__main__":
    main()
