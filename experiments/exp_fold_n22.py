"""Can the folded MXU kernels carry single-chip solves past n=20?

The slot kernel caps at n=20 (2x8 MB state planes; the roll-based
partner exchanges allocate relayout scratch on top).  The folded kernel
touches the state only through matmuls and elementwise phase passes, so
its VMEM budget is just the two planes plus the [S, S] group scratch:
n=21 -> 2x16 MB, n=22 -> 2x32 MB (+8/16 MB energy table on the exact
path), all under the 100 MB scoped limit on paper.

Measures, per n in {21, 22}: correctness of folded probs vs the jnp
engine (population 8, 4 layers) and the sustained exact-energy rate
(including per-iteration fold builds).

Run: ``python experiments/exp_fold_n22.py`` (remote kernel compiles:
minutes per shape).
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

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.sim.fold_pipeline import build_fold_pipeline
from queasars_tpu.sim.pallas_fold_kernels import (
    pallas_energies_exact_folded,
    pallas_population_probs_folded,
)
from queasars_tpu.sim.statevector import probabilities

POP = 8
LAYERS = 4
SCAN_ITERS = 20


def run(n: int) -> None:
    population = EVQEPopulation.random_population(n, LAYERS, POP, True, random_seed=0)
    packed = PackedPopulation.pack(list(population.individuals))
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=1 << n).astype(np.float32))

    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
    )
    got = np.asarray(pallas_population_probs_folded(pipe, n))
    want = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    err = float(np.abs(got - want).max())
    print(f"n={n}: folded probs vs engine max |diff| = {err:.3e}")

    @partial(jax.jit, static_argnames=("iters",))
    def scan_evals(gt, c, a, lm, tab, iters):
        def step(carry, k):
            p = build_fold_pipeline(gt, c, a + 0.001 * k.astype(jnp.float32), lm, n)
            e = pallas_energies_exact_folded(p, tab, n)
            return carry + e, None

        out, _ = jax.lax.scan(step, jnp.zeros(a.shape[0], jnp.float32), jnp.arange(iters))
        return out

    args = (packed.gate_types, packed.controls, packed.angles, packed.layer_mask, table)
    np.asarray(scan_evals(*args, SCAN_ITERS))
    np.asarray(scan_evals(*args, SCAN_ITERS))
    start = time.perf_counter()
    reps = 2
    for _ in range(reps):
        np.asarray(scan_evals(*args, SCAN_ITERS))
    elapsed = time.perf_counter() - start
    rate = POP * reps * SCAN_ITERS / elapsed
    print(
        f"n={n}: {rate:8.1f} exact evals/s sustained "
        f"({elapsed / reps / SCAN_ITERS * 1e3:.2f} ms per batched eval, pop {POP})"
    )


def main() -> None:
    for n in (21, 22):
        try:
            run(n)
        except Exception as exc:
            print(f"n={n}: FAILED — {type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
