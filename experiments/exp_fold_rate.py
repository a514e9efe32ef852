"""Folded (MXU) kernel vs the production VPU slot kernel on hardware:
correctness at the bench workload and sustained in-scan rates.

Measures, at the BASELINE configuration (n=20, pop 32, 5 layers):

- max |prob diff| of the folded kernel vs the jnp engine on device
  (the bench correctness-gate criterion, 1e-5), at HIGHEST and default
  matmul precision;
- sustained exact-energy evals/s through a 40-iteration lax.scan with
  fresh angles per iteration — INCLUDING the per-iteration
  build_fold_pipeline cost (production rebuilds folds whenever angles
  change) — for the VPU slot kernel and both folded precisions.

Run: ``python experiments/exp_fold_rate.py`` (several minutes of remote
kernel compiles on first run).
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
from queasars_tpu.sim.pallas_kernels import pallas_energies_exact
from queasars_tpu.sim.statevector import probabilities

SCAN_ITERS = 40


def correctness(packed):
    want = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            N_QUBITS,
        )
    )
    for precision in ("highest", "default"):
        pipe = build_fold_pipeline(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            N_QUBITS,
        )
        got = np.asarray(
            pallas_population_probs_folded(pipe, N_QUBITS, precision=precision)
        )
        err = float(np.abs(got - want).max())
        print(f"fold probs vs engine ({precision:8s}): max |diff| = {err:.3e}")


def measure(packed, table, variant: str, repeats: int = 2) -> float:
    table_dev = jnp.asarray(table)

    if variant == "vpu":
        def energies(gt, c, a, lm, tab):
            return pallas_energies_exact(gt, c, a, lm, tab, N_QUBITS)
    else:
        def energies(gt, c, a, lm, tab):
            pipe = build_fold_pipeline(gt, c, a, lm, N_QUBITS)
            return pallas_energies_exact_folded(pipe, tab, N_QUBITS, precision=variant)

    @partial(jax.jit, static_argnames=("iters",))
    def scan_evals(gt, c, a, lm, tab, iters):
        def step(carry, k):
            e = energies(gt, c, a + 0.001 * k.astype(jnp.float32), lm, tab)
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
    print(f"{variant:8s}: {rate:8.1f} evals/s sustained "
          f"({elapsed / repeats / SCAN_ITERS * 1e3:.2f} ms per batched eval)")
    return rate


def main():
    packed, z_masks, coeffs = build_workload()
    table = build_table(z_masks, coeffs, N_QUBITS)
    correctness(packed)
    r_vpu = measure(packed, table, "vpu")
    r_hi = measure(packed, table, "highest")
    r_d = measure(packed, table, "default")
    print(f"\nfolded/VPU speedup: HIGHEST {r_hi / r_vpu:.2f}x, default {r_d / r_vpu:.2f}x")


if __name__ == "__main__":
    main()
