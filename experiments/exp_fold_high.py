"""Measure the folded (MXU) exact path at Precision.HIGH (3-pass bf16).

HIGHEST (6-pass) is the production exact-path precision (1114 evals/s at
the bench workload); default (1-pass) is 2100 but ~1e-3 error.  HIGH
halves the MXU passes of HIGHEST — if its full-circuit error stays
within the 1e-5 engine gate it becomes the exact production precision.

Prints, at the bench workload (n=20, pop 32, 5 layers):
- max |prob diff| vs the jnp engine for HIGH (gate criterion 1e-5);
- sustained exact-energy evals/s (40-eval scan, fold rebuilt per
  iteration) for highest / high / default.

Run: ``python experiments/exp_fold_high.py``
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
from queasars_tpu.sim.pallas_fold_kernels import (
    pallas_energies_exact_folded,
    pallas_population_probs_folded,
)
from queasars_tpu.sim.statevector import probabilities

SCAN_ITERS = 40


def correctness(packed) -> None:
    want = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            N_QUBITS,
        )
    )
    for precision in ("highest", "high", "default"):
        pipe = build_fold_pipeline(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            N_QUBITS,
        )
        got = np.asarray(
            pallas_population_probs_folded(pipe, N_QUBITS, precision=precision)
        )
        err = float(np.abs(got - want).max())
        print(f"fold probs vs engine ({precision:8s}): max |diff| = {err:.3e}", flush=True)


def measure(packed, table, precision: str, repeats: int = 2) -> float:
    table_dev = jnp.asarray(table)

    @partial(jax.jit, static_argnames=("iters",))
    def scan_evals(gt, c, a, lm, tab, iters):
        def step(carry, k):
            pipe = build_fold_pipeline(gt, c, a + 0.001 * k.astype(jnp.float32), lm, N_QUBITS)
            e = pallas_energies_exact_folded(pipe, tab, N_QUBITS, precision=precision)
            return carry + e, None

        out, _ = jax.lax.scan(step, jnp.zeros(a.shape[0], jnp.float32), jnp.arange(iters))
        return out

    args = (packed.gate_types, packed.controls, packed.angles, packed.layer_mask, table_dev)
    np.asarray(scan_evals(*args, iters=SCAN_ITERS))  # compile + warm
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(scan_evals(*args, iters=SCAN_ITERS))
        dt = time.perf_counter() - t0
        rate = POPULATION * SCAN_ITERS / dt
        best = max(best, rate)
    return best


def main() -> None:
    packed, z_masks, coeffs = build_workload()
    table = build_table(z_masks, coeffs, N_QUBITS)
    correctness(packed)
    for precision in ("highest", "high", "default"):
        rate = measure(packed, table, precision)
        print(f"fold exact rate ({precision:8s}): {rate:8.1f} evals/s", flush=True)


if __name__ == "__main__":
    main()
