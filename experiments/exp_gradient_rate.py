"""Adjoint-gradient (Adam) vs production NFT on the last-layer search.

Apples-to-apples quality-per-second at the bench shape (n=20, pop 32,
5 layers): each optimizer minimizes the LAST layer's parameters of the
same packed population against the same diagonal operator, and we record
wall time plus the mean exact energy actually reached (fresh evaluation
at the final angles).

NFT runs its production configuration (fused Pallas evaluator, prefix
cache, one coordinate per iteration — maxiter=30 covers 30 of the
layer's ~60 coordinates).  Adam moves ALL coordinates every step and is
measured on both differentiable engines: the per-slot jnp engine and the
kron-fold objective (``use_fold=True`` — XLA-emitted MXU group matmuls
on the forward and the adjoint pass).

Run: ``python experiments/exp_gradient_rate.py`` (remote kernel compiles
on first run; jnp paths compile in seconds).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import N_QUBITS, POPULATION, build_workload
from queasars_tpu.optim import (
    BatchedGradientDescent,
    BatchedNFT,
    GradientDescentConfig,
    NFTConfig,
)
from queasars_tpu.paulis import PauliSum
from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator


def diagonal_operator(n_qubits: int, seed: int = 7) -> PauliSum:
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(8):
        z = int(rng.integers(1, 1 << min(n_qubits, 62)))
        label = "".join("Z" if (z >> q) & 1 else "I" for q in range(n_qubits))[::-1]
        parts.append(PauliSum.from_label(label, float(rng.normal())))
    return PauliSum.sum(parts)


def last_layer_problem(packed):
    real_layers = packed.layer_mask.sum(axis=1).astype(np.int32)
    pop = packed.n_individuals
    coords_list = [
        packed.layer_param_coordinates(i, int(real_layers[i] - 1)) for i in range(pop)
    ]
    k_max = max(c.shape[0] for c in coords_list)
    coords = np.zeros((pop, k_max, 3), np.int32)
    n_free = np.zeros(pop, np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
        n_free[i] = c.shape[0]
    return coords, n_free, real_layers - 1


def run(optimizer, evaluator, packed, coords, n_free, label, **kwargs):
    active = np.ones(packed.n_individuals, bool)
    # warm (compile), then timed
    optimizer.minimize(evaluator, packed, coords, n_free, active, **kwargs)
    start = time.perf_counter()
    angles, _, _ = optimizer.minimize(evaluator, packed, coords, n_free, active, **kwargs)
    elapsed = time.perf_counter() - start
    exact = StatevectorExpectationEvaluator(evaluator.operator)
    reached = float(np.asarray(exact.evaluate_packed(packed, angles=angles)).mean())
    print(f"{label:34s}: {elapsed * 1e3:8.1f} ms   mean energy {reached:+.5f}")
    return elapsed, reached


def main():
    packed, _, _ = build_workload()
    op = diagonal_operator(N_QUBITS)
    coords, n_free, last_layer = last_layer_problem(packed)
    start_energy = float(
        np.asarray(
            StatevectorExpectationEvaluator(op).evaluate_packed(packed)
        ).mean()
    )
    print(
        f"n={N_QUBITS} pop={POPULATION}, last-layer coords/individual "
        f"~{int(n_free.max())}; start mean energy {start_energy:+.5f}\n"
    )

    ev_pallas = StatevectorExpectationEvaluator(op, use_pallas=True)
    run(
        BatchedNFT(NFTConfig(maxiter=30)), ev_pallas, packed, coords, n_free,
        "NFT maxiter=30 (production)", last_layer=last_layer,
    )
    run(
        BatchedNFT(NFTConfig(maxiter=60)), ev_pallas, packed, coords, n_free,
        "NFT maxiter=60 (full coverage)", last_layer=last_layer,
    )
    ev_jnp = StatevectorExpectationEvaluator(op)
    for iters in (30, 60):
        run(
            BatchedGradientDescent(
                GradientDescentConfig(
                    maxiter=iters, learning_rate=0.1, cache_prefix=True, use_fold=False
                )
            ),
            ev_jnp, packed, coords, n_free,
            f"Adam maxiter={iters} (slot adjoint, prefix)", last_layer=last_layer,
        )
    for iters in (30, 60):
        run(
            BatchedGradientDescent(
                GradientDescentConfig(
                    maxiter=iters, learning_rate=0.1, cache_prefix=True, use_fold=True
                )
            ),
            ev_jnp, packed, coords, n_free,
            f"Adam maxiter={iters} (MXU fold adjoint)", last_layer=last_layer,
        )


if __name__ == "__main__":
    main()
