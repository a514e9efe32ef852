"""Batched grid steps for the folded energies kernel, on hardware.

The fold cost decomposition (docs/performance.md) showed ~175 us of
per-grid-step overhead against ~25 us of actual plane traffic at
n=20/pop=32.  Processing B individuals per grid step reuses the two
VMEM scratch planes sequentially, so VMEM is unchanged while the
per-step machinery is amortized B-fold.  This measures sustained
exact-energy rates (including per-iteration fold builds, as in
exp_fold_rate.py) for QUEASARS_FOLD_BATCH in {1, 2, 4, 8} at the bench
workload, plus a device-side correctness cross-check batch-4 vs
batch-1.

Run: ``python experiments/exp_fold_batch.py``.
"""

from __future__ import annotations

import sys, os, time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import N_QUBITS, POPULATION, build_table, build_workload
from queasars_tpu.sim.fold_pipeline import build_fold_pipeline
from queasars_tpu.sim.pallas_fold_kernels import pallas_energies_exact_folded

SCAN_ITERS = 40
PRECISION = "high"


def energies_fn(batch):
    os.environ["QUEASARS_FOLD_BATCH"] = str(batch)

    @partial(jax.jit, static_argnames=("iters",))
    def scan_evals(gt, c, a, lm, tab, iters):
        def step(carry, k):
            pipe = build_fold_pipeline(gt, c, a + 0.001 * k.astype(jnp.float32), lm, N_QUBITS)
            e = pallas_energies_exact_folded(pipe, tab, N_QUBITS, precision=PRECISION)
            return carry + e, None

        out, _ = jax.lax.scan(step, jnp.zeros(a.shape[0], jnp.float32), jnp.arange(iters))
        return out

    return scan_evals


def main():
    packed, z_masks, coeffs = build_workload()
    table = jnp.asarray(build_table(z_masks, coeffs, N_QUBITS))
    args = (packed.gate_types, packed.controls, packed.angles, packed.layer_mask, table)

    outs = {}
    for batch in (1, 2, 4, 8):
        fn = energies_fn(batch)
        outs[batch] = np.asarray(fn(*args, SCAN_ITERS))
        np.asarray(fn(*args, SCAN_ITERS))
        start = time.perf_counter()
        reps = 3
        for _ in range(reps):
            np.asarray(fn(*args, SCAN_ITERS))
        elapsed = time.perf_counter() - start
        rate = POPULATION * reps * SCAN_ITERS / elapsed
        print(f"batch {batch}: {rate:8.1f} evals/s sustained "
              f"({elapsed / reps / SCAN_ITERS * 1e3:.2f} ms per batched eval)",
              flush=True)

    for batch in (2, 4, 8):
        err = float(np.abs(outs[batch] - outs[1]).max() / np.abs(outs[1]).max())
        print(f"batch {batch} vs 1: max rel |diff| = {err:.3e}")


if __name__ == "__main__":
    main()
