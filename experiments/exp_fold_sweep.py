"""Folded (MXU) vs slot (VPU) fully-in-kernel last-layer NFT sweep.

Measures both sweep launchers directly on hardware at the production
shapes and checks their outcomes agree through the evaluator (flat
coordinates make raw angles ambiguous up to pi).

Run on the TPU: python experiments/exp_fold_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim.sweep_kernel_launch import (
    nft_layer_sweep_folded_launch,
    nft_layer_sweep_launch,
)
from queasars_tpu.paulis import PauliSum
from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator

MAXITER = 30


def build(n_qubits, pop, layers, seed=0):
    rng = np.random.default_rng(seed)
    population = EVQEPopulation.random_population(n_qubits, layers, pop, True, random_seed=seed)
    packed = PackedPopulation.pack(list(population.individuals), min_layers=layers)
    parts = []
    for _ in range(6):
        z = int(rng.integers(1, 1 << n_qubits))
        label = "".join("Z" if (z >> q) & 1 else "I" for q in range(n_qubits))[::-1]
        parts.append(PauliSum.from_label(label, float(rng.normal())))
    op = PauliSum.sum(parts)
    real_layers = packed.layer_mask.sum(axis=1).astype(np.int32)
    last_layer = real_layers - 1
    coords_list = [packed.layer_param_coordinates(i, -1) for i in range(packed.n_individuals)]
    k_max = max(c.shape[0] for c in coords_list)
    coords = np.zeros((packed.n_individuals, k_max, 3), np.int32)
    n_free = np.zeros(packed.n_individuals, np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
        n_free[i] = c.shape[0]
    return packed, op, coords, n_free, n_free > 0, last_layer


def timed(launch, args, kwargs, repeats=4):
    out = launch(*args, **kwargs)
    np.asarray(out[0])  # host sync
    start = time.perf_counter()
    for _ in range(repeats):
        out = launch(*args, **kwargs)
        np.asarray(out[0])
    return (time.perf_counter() - start) / repeats, out


def main() -> None:
    for n_qubits, pop, layers in ((18, 16, 6), (20, 32, 6)):
        problem = build(n_qubits, pop, layers)
        packed, op, coords, n_free, active, last_layer = problem
        evaluator = StatevectorExpectationEvaluator(op, use_pallas=True)
        evals = 2 * MAXITER + 1
        args = (
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            last_layer, coords[:, :, 1:3], n_free, active, evaluator._table,
        )
        kwargs = dict(n_qubits=n_qubits, maxiter=MAXITER, reset_interval=32)

        t_slot, (a_slot, e_slot) = timed(nft_layer_sweep_launch, args, kwargs)
        t_fold, (a_fold, e_fold) = timed(nft_layer_sweep_folded_launch, args, kwargs)

        pop_idx = np.arange(packed.n_individuals)

        def energies_at(layer_angles):
            merged = packed.angles.copy()
            merged[pop_idx, last_layer] = np.asarray(layer_angles)
            return np.asarray(evaluator.evaluate_packed(packed, angles=merged))

        chk_slot = energies_at(a_slot)
        chk_fold = energies_at(a_fold)
        agree = np.allclose(chk_fold, chk_slot, rtol=1e-3, atol=1e-3)
        exact = np.allclose(chk_fold, np.asarray(e_fold), rtol=1e-3, atol=1e-3)
        print(
            f"n={n_qubits} pop={pop}: slot sweep {t_slot*1e3:.0f} ms "
            f"({pop*evals/t_slot:.0f} eff evals/s) | folded {t_fold*1e3:.0f} ms "
            f"({pop*evals/t_fold:.0f} eff evals/s) | speedup {t_slot/t_fold:.2f}x | "
            f"outcomes agree: {agree}, z exact: {exact}"
        )


if __name__ == "__main__":
    main()
