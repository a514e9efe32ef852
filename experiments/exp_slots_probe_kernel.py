"""Probe-kernel routing data for the fused multi-slot parameter search:
times BatchedNFT.minimize_slots (the EVQEParameterSearch engine) with
folded (MXU) vs slot (VPU) probe kernels at the production shapes.

Mid-circuit probes apply a cached prefix + the suffix layers — short
applications where the fold's fixed per-probe costs (group builds,
pl.when regions) can outweigh its matmul advantage.  This experiment
pins the crossover that population_energies' probe routing uses.

Run on the TPU: python experiments/exp_slots_probe_kernel.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from experiments.exp_fold_sweep import build
from queasars_tpu.optim.nft import BatchedNFT, NFTConfig
from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator

MAXITER = 30


def slots_problem(n_qubits, pop, layers):
    packed, op, coords_last, n_free_last, active, last_layer = build(
        n_qubits, pop, layers
    )
    # one slot per real layer, ascending (the parameter-search shape)
    n_slots = int(packed.layer_mask.sum(axis=1).max())
    pop_n = packed.n_individuals
    real = packed.layer_mask.sum(axis=1).astype(np.int32)
    per_slot = {
        (i, s): packed.layer_param_coordinates(i, s)
        for i in range(pop_n)
        for s in range(n_slots)
        if s < real[i]
    }
    k_max = max(c.shape[0] for c in per_slot.values())
    coords = np.zeros((pop_n, n_slots, k_max, 3), np.int32)
    n_free = np.zeros((pop_n, n_slots), np.int32)
    slot_layers = np.full((pop_n, n_slots), packed.max_layers, np.int32)
    for (i, s), c in per_slot.items():
        coords[i, s, : c.shape[0]] = c
        n_free[i, s] = c.shape[0]
        slot_layers[i, s] = s
    active = np.ones((pop_n, n_slots), bool)
    return packed, op, coords, n_free, active, slot_layers


def main() -> None:
    for n_qubits, pop, layers in ((18, 16, 6), (20, 32, 6)):
        packed, op, coords, n_free, active, slot_layers = slots_problem(
            n_qubits, pop, layers
        )
        n_slots = n_free.shape[1]
        evals = n_slots * (2 * MAXITER + 1)
        rates = {}
        for mxu, label in ((True, "folded"), (False, "slot")):
            os.environ["QUEASARS_MXU"] = "1" if mxu else "0"
            evaluator = StatevectorExpectationEvaluator(op, use_pallas=True)
            nft = BatchedNFT(NFTConfig(maxiter=MAXITER, cache_prefix=True))

            def run():
                return nft.minimize_slots(
                    evaluator, packed, coords, n_free, active, slot_layers
                )

            out = run()
            assert out is not None
            start = time.perf_counter()
            for _ in range(3):
                run()
            dt = (time.perf_counter() - start) / 3
            rates[label] = dt
            print(
                f"n={n_qubits} pop={pop} slots={n_slots}: {label:6s} "
                f"{dt*1e3:6.0f} ms ({pop*evals/dt:.0f} eff evals/s)"
            )
        print(
            f"n={n_qubits}: folded/slot = {rates['slot']/rates['folded']:.2f}x"
        )


if __name__ == "__main__":
    main()
