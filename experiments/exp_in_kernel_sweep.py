"""In-kernel last-layer NFT sweep vs the prefix-cached scan path.

Measures the production last-layer search (the always-on pipeline
stage) both ways on hardware and checks the outcomes agree.

Run on the TPU: python experiments/exp_in_kernel_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim.nft import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum
from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator

MAXITER = 30


def build(n_qubits, pop, layers, seed=0):
    rng = np.random.default_rng(seed)
    population = EVQEPopulation.random_population(n_qubits, layers, pop, True, random_seed=seed)
    packed = PackedPopulation.pack(list(population.individuals), min_layers=layers)
    parts = []
    for _ in range(6):
        z = int(rng.integers(1, 1 << n_qubits))
        label = "".join("Z" if (z >> q) & 1 else "I" for q in range(n_qubits))[::-1]
        parts.append(PauliSum.from_label(label, float(rng.normal())))
    op = PauliSum.sum(parts)
    real_layers = packed.layer_mask.sum(axis=1).astype(np.int32)
    last_layer = real_layers - 1
    coords_list = [packed.layer_param_coordinates(i, -1) for i in range(packed.n_individuals)]
    k_max = max(c.shape[0] for c in coords_list)
    coords = np.zeros((packed.n_individuals, k_max, 3), np.int32)
    n_free = np.zeros(packed.n_individuals, np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
        n_free[i] = c.shape[0]
    return packed, op, coords, n_free, n_free > 0, last_layer


def timed_sweep(optimizer, evaluator, problem, repeats=4):
    packed, _, coords, n_free, active, last_layer = problem
    run = lambda: optimizer.minimize(
        evaluator, packed, coords, n_free, active, last_layer=last_layer, seed=3
    )
    out = run()  # compile + warm
    start = time.perf_counter()
    for _ in range(repeats):
        out = run()
    per_sweep = (time.perf_counter() - start) / repeats
    return per_sweep, out


def main() -> None:
    for n_qubits, pop, layers in ((18, 16, 6), (20, 32, 6)):
        problem = build(n_qubits, pop, layers)
        packed, op, *_ = problem
        evaluator = StatevectorExpectationEvaluator(op, use_pallas=True)
        evals = BatchedNFT(NFTConfig(maxiter=MAXITER)).config.n_circuit_evaluations()

        t_scan, (a_scan, e_scan, _) = timed_sweep(
            BatchedNFT(NFTConfig(maxiter=MAXITER, cache_prefix=True, in_kernel_sweep=False)),
            evaluator, problem,
        )
        t_kern, (a_kern, e_kern, _) = timed_sweep(
            BatchedNFT(NFTConfig(maxiter=MAXITER, cache_prefix=True, in_kernel_sweep=True)),
            evaluator, problem,
        )
        check_scan = np.asarray(evaluator.evaluate_packed(packed, angles=a_scan))
        check_kern = np.asarray(evaluator.evaluate_packed(packed, angles=a_kern))
        agree = np.allclose(check_kern, check_scan, rtol=1e-3, atol=1e-3)
        exact = np.allclose(check_kern, e_kern, rtol=1e-3, atol=1e-3)
        print(
            f"n={n_qubits} pop={pop}: prefix-scan {t_scan*1e3:.0f} ms/sweep "
            f"({pop*evals/t_scan:.0f} eff evals/s) | in-kernel {t_kern*1e3:.0f} ms/sweep "
            f"({pop*evals/t_kern:.0f} eff evals/s) | speedup {t_scan/t_kern:.2f}x | "
            f"outcomes agree: {agree}, z exact: {exact}"
        )


if __name__ == "__main__":
    main()
