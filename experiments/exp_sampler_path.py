"""Sampler-path (shots + CVaR) sustained rate at the benchmark shape.

Measures the in-scan rate of the shot-sampled CVaR objective (the
reference's sampler-primitive configuration: finite shots, lower-tail
CVaR) with the fused probs kernel, comparing the counts-materializing
path against the shot-multiset fast path (gather sampled energies,
sort shots instead of 2^n work).

Run on the TPU: python experiments/exp_sampler_path.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import bench
from queasars_tpu.optim.objective import population_energies

SCAN_ITERS = 30
REPEATS = 2
SHOTS = 512
ALPHA = 0.5


@partial(jax.jit, static_argnames=("iters", "fast"))
def scan(gt, ctrl, ang, lm, tab, sorted_e, order, keys, iters, fast):
    def step(carry, k):
        e = population_energies(
            gt, ctrl, ang + 0.001 * k.astype(jnp.float32), lm, tab, sorted_e, order,
            jnp.float32(ALPHA), jax.vmap(lambda pk: jax.random.fold_in(pk, k))(keys),
            n_qubits=bench.N_QUBITS, shots=SHOTS, use_cvar=True, use_shots=True,
            use_pallas=True, fast_shots=fast,
        )
        return carry + e, None

    out, _ = jax.lax.scan(step, jnp.zeros(gt.shape[0], jnp.float32), jnp.arange(iters))
    return out


def timed(fast, gt, ctrl, ang, lm, tab, sorted_e, order, keys):
    np.asarray(scan(gt, ctrl, ang, lm, tab, sorted_e, order, keys, SCAN_ITERS, fast))
    start = time.perf_counter()
    for i in range(REPEATS):
        np.asarray(
            scan(gt, ctrl, ang + np.float32(0.01 * i), lm, tab, sorted_e, order, keys,
                 SCAN_ITERS, fast)
        )
    per_eval = (time.perf_counter() - start) / (REPEATS * SCAN_ITERS)
    return per_eval


def main() -> None:
    packed, z_masks, coeffs = bench.build_workload()
    table = np.asarray(bench.build_table(z_masks, coeffs, bench.N_QUBITS))
    order = np.argsort(table, kind="stable").astype(np.int32)
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(0), packed.n_individuals))
    args = (
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
        jnp.asarray(table), jnp.asarray(table[order]), jnp.asarray(order),
        jnp.asarray(keys),
    )
    pop = packed.n_individuals
    for fast in (False, True):
        per_eval = timed(fast, *args)
        print(
            f"fast_shots={fast}: {per_eval * 1e3:.1f} ms/batched-eval -> "
            f"{pop / per_eval:.0f} evals/s (pop {pop}, {SHOTS} shots, CVaR {ALPHA})"
        )


if __name__ == "__main__":
    main()
