"""Folded vs per-gate amplitude-sharded application on hardware.

Multi-chip ICI is not available in this environment (one v5e chip), so
this measures the COMPUTE path of the sharded engine on a (pop=1,
amp=1) mesh on the real chip: identical shard_map code, collectives
compiled away — isolating the per-layer group-matmul formulation
against the per-gate barriered slot passes that dominate the sharded
engine's critical path at any width.  (The cross-shard ppermutes cost
the same in both designs for qubits above the fold boundary; the fold
REMOVES all per-gate passes below it, so single-shard compute is the
differing term.)

Measures sustained exact-energy evals/s through a 20-iteration scan at
n=20, pop 8, 4 layers, for both appliers, plus max |energy diff|.

Run: ``python experiments/exp_sharded_fold.py``
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
from jax.sharding import Mesh

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.sim.sharded_fold import make_folded_population_energies_fn
from queasars_tpu.sim.sharded_statevector import make_sharded_population_energies_fn

N = 20
POP = 8
LAYERS = 4
SCAN_ITERS = 20


def measure(fn, args, label):
    @partial(jax.jit, static_argnames=("iters",))
    def scan_evals(gt, c, a, lm, tab, iters):
        def step(carry, k):
            e = fn(gt, c, a + 0.001 * k.astype(jnp.float32), lm, tab)
            return carry + e, None

        out, _ = jax.lax.scan(step, jnp.zeros(a.shape[0], jnp.float32), jnp.arange(iters))
        return out

    np.asarray(scan_evals(*args, SCAN_ITERS))
    np.asarray(scan_evals(*args, SCAN_ITERS))
    reps = 2
    start = time.perf_counter()
    for _ in range(reps):
        np.asarray(scan_evals(*args, SCAN_ITERS))
    elapsed = time.perf_counter() - start
    rate = POP * reps * SCAN_ITERS / elapsed
    print(f"{label:10s}: {rate:8.1f} evals/s ({elapsed / reps / SCAN_ITERS * 1e3:.2f} ms per batched eval)")
    return rate


def main() -> None:
    population = EVQEPopulation.random_population(N, LAYERS, POP, True, random_seed=0)
    packed = PackedPopulation.pack(list(population.individuals))
    table = np.random.default_rng(0).normal(size=1 << N).astype(np.float32)

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("pop", "amp"))
    slot_fn = make_sharded_population_energies_fn(mesh, N)
    fold_fn = make_folded_population_energies_fn(mesh, N)

    args = (
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
        jnp.asarray(table),
    )
    e_slot = np.asarray(slot_fn(*args))
    e_fold = np.asarray(fold_fn(*args))
    print(f"max |energy diff| fold vs slot: {np.abs(e_slot - e_fold).max():.3e}")

    r_slot = measure(slot_fn, args, "per-gate")
    r_fold = measure(fold_fn, args, "folded")
    print(f"\nfolded/per-gate speedup: {r_fold / r_slot:.2f}x")


if __name__ == "__main__":
    main()
