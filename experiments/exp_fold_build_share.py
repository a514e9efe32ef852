"""How much of the folded exact-path evaluation is the per-iteration
``build_fold_pipeline`` cost?

The bench headline (measure_fold_rate) rebuilds the fold pipeline every
scan iteration — the production shape, since angles change per optimizer
probe.  This experiment separates the two components at the bench
workload (n=20, pop 32, 5 layers, "high" precision):

- ``with_build``: fresh angles -> build_fold_pipeline -> kernel, per
  iteration (the bench measurement);
- ``kernel_only``: one pipeline built outside the scan, the kernel
  re-applied per iteration (angle-independent cost ceiling);
- ``build_only``: the pipeline build alone per iteration (its factor
  tensor summed to keep XLA from eliding the work).

Run: ``python experiments/exp_fold_build_share.py`` (remote kernel
compiles on first run).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import N_QUBITS, POPULATION, build_table, build_workload
from queasars_tpu.sim.fold_pipeline import build_fold_pipeline
from queasars_tpu.sim.pallas_fold_kernels import pallas_energies_exact_folded

SCAN_ITERS = 40
REPEATS = 3


def timed(fn, *args):
    np.asarray(fn(*args))
    np.asarray(fn(*args))
    start = time.perf_counter()
    for _ in range(REPEATS):
        np.asarray(fn(*args))
    elapsed = (time.perf_counter() - start) / REPEATS
    return POPULATION * SCAN_ITERS / elapsed, elapsed


def main() -> None:
    packed, z_masks, coeffs = build_workload()
    table = jnp.asarray(build_table(z_masks, coeffs, N_QUBITS))
    gt, ctrl, ang, lm = (
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
    )

    @partial(jax.jit, static_argnames=("iters",))
    def with_build(gt, c, a, m, tab, iters):
        def step(carry, k):
            pipe = build_fold_pipeline(gt, c, a + 0.001 * k.astype(jnp.float32), m, N_QUBITS)
            return carry + pallas_energies_exact_folded(pipe, tab, N_QUBITS, precision="high"), None

        out, _ = jax.lax.scan(step, jnp.zeros(a.shape[0], jnp.float32), jnp.arange(iters))
        return out

    @partial(jax.jit, static_argnames=("iters",))
    def kernel_only(pipe, tab, iters):
        def step(carry, k):
            return carry + pallas_energies_exact_folded(pipe, tab, N_QUBITS, precision="high"), None

        out, _ = jax.lax.scan(step, jnp.zeros(pipe.factors.shape[0], jnp.float32), jnp.arange(iters))
        return out

    @partial(jax.jit, static_argnames=("iters",))
    def build_only(gt, c, a, m, iters):
        def step(carry, k):
            pipe = build_fold_pipeline(gt, c, a + 0.001 * k.astype(jnp.float32), m, N_QUBITS)
            return carry + jnp.sum(pipe.factors[:, :, :, :, 0, 0], axis=(1, 2, 3)), None

        out, _ = jax.lax.scan(step, jnp.zeros(a.shape[0], jnp.float32), jnp.arange(iters))
        return out

    pipe0 = jax.tree.map(jnp.asarray, build_fold_pipeline(gt, ctrl, ang, lm, N_QUBITS))

    rate_wb, t_wb = timed(lambda: with_build(gt, ctrl, ang, lm, table, SCAN_ITERS))
    rate_ko, t_ko = timed(lambda: kernel_only(pipe0, table, SCAN_ITERS))
    rate_bo, t_bo = timed(lambda: build_only(gt, ctrl, ang, lm, SCAN_ITERS))

    ms = lambda t: 1000.0 * t / SCAN_ITERS
    print(f"with_build : {rate_wb:8.1f} evals/s  ({ms(t_wb):6.2f} ms/batched eval)")
    print(f"kernel_only: {rate_ko:8.1f} evals/s  ({ms(t_ko):6.2f} ms/batched eval)")
    print(f"build_only : {rate_bo:8.1f} evals/s  ({ms(t_bo):6.2f} ms/batched eval)")
    share = (t_wb - t_ko) / t_wb
    print(f"build share of the with-build eval: {100 * share:.1f}% "
          f"(standalone build: {100 * t_bo / t_wb:.1f}%)")


if __name__ == "__main__":
    main()
