"""Evolving-ansatz VQE driven by exact adjoint gradients (Adam).

Beyond-reference capability: the reference can only host gradient-free
qiskit-algorithms optimizers because its simulator is an opaque RPC
endpoint (mutation.py:77-81).  Here the simulator is a differentiable
JAX program, so `BatchedGradientDescent` descends the whole population
in lock-step using analytic gradients from one reverse-mode pass — and
it works on non-diagonal Hamiltonians too, demonstrated below on a
transverse-field Ising chain whose ground state is not a basis state.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import numpy as np

from queasars_tpu.optim import BatchedGradientDescent, GradientDescentConfig
from queasars_tpu.paulis import PauliSum
from queasars_tpu.solver import (
    ConfiguredEstimator,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def tfim_chain(n: int, h: float = 1.0) -> PauliSum:
    """H = -sum ZZ - h sum X (open chain)."""
    terms = [("ZZ", [q, q + 1], -1.0) for q in range(n - 1)]
    terms += [("X", [q], -h) for q in range(n)]
    return PauliSum.from_sparse_list(terms, n)


def exact_ground_energy(op: PauliSum) -> float:
    dense = op.to_dense_matrix()
    return float(np.linalg.eigvalsh(dense).min())


def main() -> None:
    n = 4
    hamiltonian = tfim_chain(n)
    target = exact_ground_energy(hamiltonian)
    print(f"TFIM chain n={n}: exact ground energy {target:.6f}")

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedGradientDescent(
            GradientDescentConfig(maxiter=60, learning_rate=0.1)
        ),
        optimizer_n_circuit_evaluations=None,
        max_generations=8,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=1,
        population_size=8,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.05,
        selection_beta_penalty=0.05,
        parameter_search_probability=0.4,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
        use_tournament_selection=True,
        tournament_size=2,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)
    gap = float(result.eigenvalue) - target
    print(f"Adam-driven EVQE eigenvalue {result.eigenvalue:.6f} (gap {gap:.4f})")
    assert gap < 0.35, f"expected near-ground energy, gap {gap}"
    print("near-ground TFIM energy recovered with adjoint gradients")


if __name__ == "__main__":
    main()
