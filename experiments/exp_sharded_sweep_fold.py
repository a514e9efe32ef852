"""Fold-routed vs per-gate amplitude-sharded NFT sweeps on hardware.

Same single-chip methodology as ``exp_sharded_fold.py`` (a (pop=1,
amp=1) mesh on the real chip runs the identical shard_map programs with
the collectives compiled away): measures the three device sweeps —
plain full-circuit, rest-base prefix, fused multi-slot — with
``use_fold=False`` (per-gate prefix/base/suffix simulation) and
``use_fold=True`` (kron-fold group matmuls), wall time per sweep and
effective evals/s (3 objective evaluations per NFT iteration on the
plain/slots paths; the prefix path's probes are scalar forms, so its
denominator is the per-step base simulation count).

Run: ``python experiments/exp_sharded_sweep_fold.py``
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jax.sharding import Mesh

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim.nft import NFTConfig
from queasars_tpu.paulis import PauliSum
from queasars_tpu.sim.sharded_evaluator import AmplitudeShardedExpectationEvaluator

N = 20
POP = 8
LAYERS = 4
MAXITER = 20


def diagonal_operator(n_qubits: int, seed: int = 7) -> PauliSum:
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(8):
        z = int(rng.integers(1, 1 << min(n_qubits, 62)))
        label = "".join("Z" if (z >> q) & 1 else "I" for q in range(n_qubits))[::-1]
        parts.append(PauliSum.from_label(label, float(rng.normal())))
    return PauliSum.sum(parts)


def workload():
    population = EVQEPopulation.random_population(N, LAYERS, POP, True, random_seed=3)
    packed = PackedPopulation.pack(list(population.individuals))
    return packed


def all_coords(packed):
    coords = np.stack(
        [
            np.pad(
                packed.param_coordinates(i),
                ((0, int(packed.n_params.max()) - packed.n_params[i]), (0, 0)),
            )
            for i in range(packed.n_individuals)
        ]
    )
    return coords


def last_layer_problem(packed):
    real_layers = packed.layer_mask.sum(axis=1).astype(np.int32)
    pop = packed.n_individuals
    coords_list = [
        packed.layer_param_coordinates(i, int(real_layers[i] - 1)) for i in range(pop)
    ]
    k_max = max(c.shape[0] for c in coords_list)
    coords = np.zeros((pop, k_max, 3), np.int32)
    n_free = np.zeros(pop, np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
        n_free[i] = c.shape[0]
    return coords, n_free, real_layers - 1


def slot_problem(packed):
    pop = packed.n_individuals
    real_layers = packed.layer_mask.sum(axis=1).astype(np.int32)
    max_layers = packed.gate_types.shape[1]
    n_slots = int(real_layers.max())
    coords_ps, n_free_ps, active_ps, slot_layer_ps = [], [], [], []
    for s in range(n_slots):
        coords_list = [
            packed.layer_param_coordinates(i, s)
            if s < real_layers[i]
            else np.zeros((0, 3), np.int32)
            for i in range(pop)
        ]
        k_max = max(max(c.shape[0] for c in coords_list), 1)
        coords = np.zeros((pop, k_max, 3), np.int32)
        n_free = np.zeros(pop, np.int32)
        for i, c in enumerate(coords_list):
            coords[i, : c.shape[0]] = c
            n_free[i] = c.shape[0]
        coords_ps.append(coords)
        n_free_ps.append(n_free)
        active_ps.append(n_free > 0)
        slot_layer_ps.append(np.where(s < real_layers, s, max_layers).astype(np.int32))
    k_all = max(c.shape[1] for c in coords_ps)
    coords_ps = np.stack(
        [np.pad(c, ((0, 0), (0, k_all - c.shape[1]), (0, 0))) for c in coords_ps],
        axis=1,
    )
    return (
        coords_ps,
        np.stack(n_free_ps, axis=1),
        np.stack(active_ps, axis=1),
        np.stack(slot_layer_ps, axis=1),
    )


def timed(label, run, evals):
    run()  # compile
    start = time.perf_counter()
    out = run()
    np.asarray(out[0])  # host transfer = sync
    elapsed = time.perf_counter() - start
    print(f"{label:42s}: {elapsed * 1e3:8.1f} ms   {evals / elapsed:9.1f} evals/s")
    return elapsed


def main():
    packed = workload()
    operator = diagonal_operator(N)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("pop", "amp"))
    config = NFTConfig(maxiter=MAXITER, cache_prefix=False)
    config_prefix = NFTConfig(maxiter=MAXITER, cache_prefix=True)

    coords = all_coords(packed)
    active = np.ones(POP, bool)
    coords_ll, n_free_ll, last_layer = last_layer_problem(packed)
    cps, nfs, acs, sls = slot_problem(packed)
    n_slots = cps.shape[1]

    results = {}
    for use_fold in (False, True):
        tag = "fold" if use_fold else "per-gate"
        ev = AmplitudeShardedExpectationEvaluator(operator, mesh, use_fold=use_fold)

        t = timed(
            f"plain sweep ({tag})",
            lambda: ev.nft_minimize(
                packed, coords, packed.n_params, active, packed.angles, config, seed=0
            ),
            3 * MAXITER * POP,
        )
        results[("plain", use_fold)] = t

        t = timed(
            f"rest-base prefix sweep ({tag})",
            lambda: ev.nft_minimize(
                packed, coords_ll, n_free_ll, n_free_ll > 0, packed.angles,
                config_prefix, seed=0, last_layer=last_layer,
            ),
            MAXITER * POP,
        )
        results[("prefix", use_fold)] = t

        t = timed(
            f"fused multi-slot sweep ({tag})",
            lambda: ev.nft_minimize_slots(
                packed, cps, nfs, acs, sls, packed.angles, config_prefix, seed=0
            ),
            3 * MAXITER * POP * n_slots,
        )
        results[("slots", use_fold)] = t

    print()
    for path in ("plain", "prefix", "slots"):
        ratio = results[(path, False)] / results[(path, True)]
        print(f"{path:8s}: fold speedup {ratio:.2f}x")


if __name__ == "__main__":
    main()
