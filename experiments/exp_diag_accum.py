"""Angle-accumulation diag pass: MEASURED AND REJECTED (0.81x).

The probed variant (`_apply_diag_pass_accum`) replaced the per-slot
complex multiplies of a layer's controlled-diagonal pass with one
masked real-angle add per slot (unit-modulus phases: their product is
``e^{i * sum(angles)}``; angles shipped from the build since Mosaic has
no atan2 lowering) and a single cos/sin complex multiply per chunk —
the state planes touched once per layer instead of once per slot, with
count == 1 layers keeping the complex form.

Measured on this harness (40-eval jit scan, per-iteration build
included, n=20 pop-32 ``"high"``, production absorb on): **1424.7
evals/s vs 1753.5 for the per-slot complex pass (0.812x)**, max |prob
diff| 2.366e-07 (correct, just slower) — the vector cos/sin plus the
full-plane fori carry cost more than the complex multiplies they
remove.  The variant was REVERTED after the measurement, so this
script now measures the production per-slot pass; it reproduces the
rejected numbers only at the commit that carried the variant (the one
adding this file).  docs/performance.md records the entry, and
tests/test_fold_diag_pass.py keeps the handcrafted multi-slot
cross-group workloads as permanent diag-pass coverage.

Run: ``python experiments/exp_diag_accum.py``.
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
from queasars_tpu.sim.pallas_fold_kernels import (
    pallas_energies_exact_folded,
    pallas_population_probs_folded,
)
from queasars_tpu.sim.statevector import probabilities

SCAN_ITERS = 40


def correctness(packed):
    want = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            N_QUBITS,
        )
    )
    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
        N_QUBITS, absorb_diag=True,
    )
    got = np.asarray(
        pallas_population_probs_folded(pipe, N_QUBITS, precision="high")
    )
    err = float(np.abs(got - want).max())
    print(f"fold probs vs engine (high): max |diff| = {err:.3e}")
    assert err < 1e-5, "outside the engine gate"


def measure(packed, table, repeats: int = 2) -> float:
    table_dev = jnp.asarray(table)

    @partial(jax.jit, static_argnames=("iters",))
    def scan_evals(gt, c, a, lm, tab, iters):
        def step(carry, k):
            pipe = build_fold_pipeline(
                gt, c, a + 0.001 * k.astype(jnp.float32), lm, N_QUBITS,
                absorb_diag=True,
            )
            e = pallas_energies_exact_folded(pipe, tab, N_QUBITS, precision="high")
            return carry + e, None

        out, _ = jax.lax.scan(step, jnp.zeros(a.shape[0], jnp.float32), jnp.arange(iters))
        return out

    args = (packed.gate_types, packed.controls, packed.angles, packed.layer_mask, table_dev)
    np.asarray(scan_evals(*args, SCAN_ITERS))
    np.asarray(scan_evals(*args, SCAN_ITERS))
    start = time.perf_counter()
    for _ in range(repeats):
        np.asarray(scan_evals(*args, SCAN_ITERS))
    elapsed = time.perf_counter() - start
    rate = POPULATION * repeats * SCAN_ITERS / elapsed
    print(f"diag pass: {rate:8.1f} evals/s sustained "
          f"({elapsed / repeats / SCAN_ITERS * 1e3:.2f} ms per batched eval)")
    return rate


def main():
    packed, z_masks, coeffs = build_workload()
    table = build_table(z_masks, coeffs, N_QUBITS)
    correctness(packed)
    rate = measure(packed, table)
    print(f"\nvs the recorded per-slot complex pass 1753.5 evals/s: {rate / 1753.5:.3f}x")


if __name__ == "__main__":
    main()
