"""Same-group controlled-diagonal absorption: on-device rate + accuracy.

``build_fold_pipeline(absorb_diag=True)`` moves every CROT whose control
and target share one 7-qubit axis group (and whose kron layer is active
in that group) out of the full-state diag pass and into a row-scale of
that group's matmul — ~2^2m elements touched instead of ~2^n.  At the
BASELINE workload (n=20, pop 32, 5 layers) this measures:

- the absorbed fraction of CROT slots (how much of the diag pass the
  rewrite removes);
- max |prob diff| of the absorbed pipeline vs the jnp engine on device
  (the bench correctness-gate criterion, 1e-5) at the production
  ``high`` precision;
- sustained exact-energy evals/s through a 40-iteration lax.scan with
  fresh angles per iteration (per-iteration build included), absorb off
  vs on.

Run: ``python experiments/exp_fold_absorb.py`` (several minutes of
remote kernel compiles on first run).
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


def absorbed_fraction(packed) -> float:
    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
        N_QUBITS, absorb_diag=True,
    )
    n_abs = int(np.asarray(pipe.abs_count).sum())
    n_res = int(np.asarray(pipe.diag_count).sum())
    frac = n_abs / max(n_abs + n_res, 1)
    print(f"absorbed CROT slots: {n_abs}/{n_abs + n_res} ({frac:.1%})")
    return frac


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
    print(f"absorbed fold probs vs engine (high): max |diff| = {err:.3e}")


def measure(packed, table, absorb: bool, repeats: int = 2) -> float:
    table_dev = jnp.asarray(table)

    @partial(jax.jit, static_argnames=("iters",))
    def scan_evals(gt, c, a, lm, tab, iters):
        def step(carry, k):
            pipe = build_fold_pipeline(
                gt, c, a + 0.001 * k.astype(jnp.float32), lm, N_QUBITS,
                absorb_diag=absorb,
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
    label = "absorb on " if absorb else "absorb off"
    print(f"{label}: {rate:8.1f} evals/s sustained "
          f"({elapsed / repeats / SCAN_ITERS * 1e3:.2f} ms per batched eval)")
    return rate


def main():
    packed, z_masks, coeffs = build_workload()
    table = build_table(z_masks, coeffs, N_QUBITS)
    absorbed_fraction(packed)
    correctness(packed)
    r_off = measure(packed, table, absorb=False)
    r_on = measure(packed, table, absorb=True)
    print(f"\nabsorb speedup: {r_on / r_off:.3f}x")


if __name__ == "__main__":
    main()
