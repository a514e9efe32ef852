"""Per-probe cost breakdown of the folded in-kernel sweep at the bench
shape (n=20, pop 32): ablate the diag pass (diag_count=0) and the group
matmuls+builds (group_active=0) via metadata surgery — the kernel shape
is unchanged, so compiles are cached.

Run on the TPU: python experiments/exp_fold_sweep_breakdown.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from experiments.exp_fold_sweep import MAXITER, build
from queasars_tpu.sim.fold_pipeline import build_fold_pipeline
from queasars_tpu.sim.pallas_fold_kernels import (
    fold_sweep_metadata,
    pallas_nft_layer_sweep_folded,
    pallas_population_states_folded,
)


def main() -> None:
    n_qubits, pop, layers = 20, 32, 6
    packed, op, coords, n_free, active, last_layer = build(n_qubits, pop, layers)
    from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator

    evaluator = StatevectorExpectationEvaluator(op, use_pallas=True)
    table = evaluator._table

    prefix_mask = np.logical_and(
        packed.layer_mask,
        np.arange(packed.layer_mask.shape[1])[None, :] < last_layer[:, None],
    )
    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, prefix_mask, n_qubits
    )
    prefix = pallas_population_states_folded(pipe, n_qubits, precision="high")
    pop_idx = np.arange(pop)
    gate1 = packed.gate_types[pop_idx, last_layer]
    ctrl1 = packed.controls[pop_idx, last_layer]
    angles1 = packed.angles[pop_idx, last_layer]
    meta = fold_sweep_metadata(gate1, ctrl1, n_qubits)
    diag_ctrl, diag_tgt, slot_of_q, diag_count, group_active = meta

    variants = {
        "full": meta,
        "no_diag": (diag_ctrl, diag_tgt, slot_of_q, np.zeros_like(diag_count), group_active),
        "no_matmul": (diag_ctrl, diag_tgt, slot_of_q, diag_count, np.zeros_like(group_active)),
        "neither": (
            diag_ctrl, diag_tgt, slot_of_q,
            np.zeros_like(diag_count), np.zeros_like(group_active),
        ),
    }
    evals = 2 * MAXITER + 1
    for name, m in variants.items():
        def run():
            out = pallas_nft_layer_sweep_folded(
                gate1, angles1, coords[:, :, 1:3], n_free, active,
                prefix, jnp.asarray(table), *[jnp.asarray(x) for x in m],
                n_qubits, MAXITER, 32, precision="high",
            )
            np.asarray(out[0])
            return out

        run()
        start = time.perf_counter()
        for _ in range(4):
            run()
        dt = (time.perf_counter() - start) / 4
        per_probe = dt / (pop * evals)
        print(f"{name:10s}: {dt*1e3:6.1f} ms/sweep | {per_probe*1e6:6.1f} us/probe")


if __name__ == "__main__":
    main()
