"""Hardware measurement: layer-prefix-cached NFT last-layer sweep vs the
full-circuit sweep at the benchmark shape (n=20, pop=32, 5 real layers).

Run on the TPU: python experiments/exp_prefix.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench
from queasars_tpu.optim.nft import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum
from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator

MAXITER = 30


def main() -> None:
    packed, z_masks, coeffs = bench.build_workload()
    n = bench.N_QUBITS
    operator = PauliSum(
        n_qubits=n,
        coeffs=coeffs.astype(np.complex128),
        z=np.asarray(z_masks, np.uint64)[:, None],
        x=np.zeros((len(coeffs), 1), np.uint64),
    )
    evaluator = StatevectorExpectationEvaluator(operator, use_pallas=True)

    real_layers = packed.layer_mask.sum(axis=1).astype(np.int32)
    last_layer = real_layers - 1
    coords_list = [packed.layer_param_coordinates(i, -1) for i in range(packed.n_individuals)]
    k_max = max(c.shape[0] for c in coords_list)
    coords = np.zeros((packed.n_individuals, k_max, 3), np.int32)
    n_free = np.zeros(packed.n_individuals, np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
        n_free[i] = c.shape[0]
    active = n_free > 0

    for label, cache in [("full-circuit", False), ("prefix-cached", True)]:
        opt = BatchedNFT(NFTConfig(maxiter=MAXITER, cache_prefix=cache))

        def run(seed):
            return opt.minimize(
                evaluator, packed, coords, n_free, active,
                seed=seed, last_layer=last_layer,
            )

        a0, e0, nfev = run(0)  # compile
        run(1)  # warm
        start = time.perf_counter()
        reps = 3
        for i in range(reps):
            _, e, _ = run(i + 2)
        elapsed = time.perf_counter() - start
        per_sweep = elapsed / reps
        rate = nfev * packed.n_individuals / per_sweep
        print(
            f"{label}: {per_sweep * 1e3:.1f} ms/sweep ({nfev} evals x {packed.n_individuals} "
            f"individuals -> {rate:.0f} effective evals/s); final mean energy {np.mean(e):.4f}"
        )


if __name__ == "__main__":
    main()
