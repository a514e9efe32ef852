"""Decompose the slot kernel's fixed per-batch cost (~13 ms in-scan at
n=20/pop=32, docs/performance.md) using only already-compiled shapes.

Components probed (all reuse the benchmark kernel shape — no new Pallas
compiles):
- T_full: normal benchmark genome (5 real layers)
- T_alloff: all layers masked off -> init + epilogue + 6 layer-region
  syncs + everything shape-constant (SMEM DMA, launch, pipeline)
- T_xla: the same lax.scan with the kernel replaced by a trivial jnp
  reduction of the angle tensor -> XLA scan/step overhead alone

Run on the TPU: python experiments/exp_fixed_cost.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench
from queasars_tpu.sim.pallas_kernels import pallas_energies_exact

SCAN_ITERS = 40
REPEATS = 3


def timed_scan(packed_args, table, label):
    gt, ctrl, ang, lm = packed_args

    @partial(jax.jit, static_argnames=("iters",))
    def scan(gt, ctrl, ang, lm, tab, iters):
        def step(carry, k):
            e = pallas_energies_exact(
                gt, ctrl, ang + 0.001 * k.astype(jnp.float32), lm, tab, bench.N_QUBITS
            )
            return carry + e, None

        out, _ = jax.lax.scan(step, jnp.zeros(ang.shape[0], jnp.float32), jnp.arange(iters))
        return out

    np.asarray(scan(gt, ctrl, ang, lm, table, SCAN_ITERS))
    np.asarray(scan(gt, ctrl, ang + np.float32(0.5), lm, table, SCAN_ITERS))
    start = time.perf_counter()
    for i in range(REPEATS):
        np.asarray(scan(gt, ctrl, ang + np.float32(0.01 * i), lm, table, SCAN_ITERS))
    per_batch = (time.perf_counter() - start) / (REPEATS * SCAN_ITERS)
    print(f"{label}: {per_batch * 1e3:.2f} ms per batched evaluation")
    return per_batch


def main() -> None:
    packed, z_masks, coeffs = bench.build_workload()
    table = jnp.asarray(bench.build_table(z_masks, coeffs, bench.N_QUBITS))

    t_full = timed_scan(
        (packed.gate_types, packed.controls, packed.angles, packed.layer_mask),
        table, "full genome (5 real layers)",
    )
    all_off = np.zeros_like(packed.layer_mask)
    t_alloff = timed_scan(
        (packed.gate_types, packed.controls, packed.angles, all_off),
        table, "all layers masked off",
    )

    @partial(jax.jit, static_argnames=("iters",))
    def xla_only(ang, iters):
        def step(carry, k):
            return carry + jnp.sum(ang + 0.001 * k.astype(jnp.float32), axis=(1, 2, 3)), None

        out, _ = jax.lax.scan(step, jnp.zeros(ang.shape[0], jnp.float32), jnp.arange(iters))
        return out

    np.asarray(xla_only(packed.angles, SCAN_ITERS))
    start = time.perf_counter()
    for _ in range(REPEATS):
        np.asarray(xla_only(packed.angles, SCAN_ITERS))
    t_xla = (time.perf_counter() - start) / (REPEATS * SCAN_ITERS)
    print(f"XLA scan step alone: {t_xla * 1e3:.3f} ms per iteration")

    print(f"\nslot work (full - alloff): {(t_full - t_alloff) * 1e3:.2f} ms/batch")
    print(f"shape-constant floor (alloff): {t_alloff * 1e3:.2f} ms/batch "
          f"(init+epilogue+SMEM DMA+launch, x32 programs)")


if __name__ == "__main__":
    main()
