"""In-VMEM sampler at n=22: MEASURED NEGATIVE RESULT (round 5).

The epilogue was restructured for the size
(pallas_kernels._sample_shots_from_probs: Bsel hierarchy gather in
128-block half-passes, 256-entry block prefix as two chained lane-tile
scans, probability limbs recomputed per shot chunk instead of held — a
held limb set is 3 x 16 MB on top of the 32 MB of state planes) and the
logic verified in interpret mode.  On the chip the kernel is a compiler
impossibility: after a 28-minute Mosaic compile it fails with

    Ran out of memory in memory space vmem. Used 226.43M of 128.00M
    ...  1. Size: 177.39M  XLA label: register allocator spill slots

— the level ops' 16 MB/plane live set overwhelms the register
allocator regardless of how the explicit buffers are chunked.
``fold_supported(path="sampler")`` therefore caps at n=21, and the
n=22 shot path runs the folded probs kernel + XLA-side sampling (the
optim/objective.py fallback, same uniform stream).

Kept as the reproduction script: run on the TPU (expect the VMEM
failure above unless the toolchain improves):
python experiments/exp_sampler_n22.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from queasars_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.paulis.diagonal import _energy_table_scan
from queasars_tpu.sim.fold_pipeline import build_fold_pipeline
from queasars_tpu.sim.pallas_fold_kernels import (
    pallas_population_probs_folded,
    pallas_sampled_shot_energies_folded,
)

N, POP, SHOTS, K = 22, 8, 512, 20


def main() -> None:
    population = EVQEPopulation.random_population(N, 2, POP, True, random_seed=3)
    packed = PackedPopulation.pack(list(population.individuals))
    rng = np.random.default_rng(0)
    z = rng.integers(0, 1 << N, size=128, dtype=np.uint64)
    c = rng.normal(size=128)
    table = _energy_table_scan(
        jnp.asarray(z.astype(np.uint32)), jnp.asarray(c, jnp.float32), N
    )
    keys = jax.random.split(jax.random.PRNGKey(0), POP)
    frac = jax.vmap(lambda k: jax.random.uniform(k, (SHOTS,), jnp.float32))(keys)

    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, N,
        absorb_diag=True,
    )
    t0 = time.perf_counter()
    e_kernel = np.asarray(
        pallas_sampled_shot_energies_folded(
            pipe, table, frac, N, SHOTS, precision="default"
        )
    )
    print(f"sampler kernel first result in {time.perf_counter() - t0:.0f}s")

    # gate: the sampled multiset against a flat searchsorted over the
    # SAME-precision folded probabilities (same uniforms); boundary draws
    # may flip bins at the summation-tree rounding level
    probs = np.asarray(
        pallas_population_probs_folded(pipe, N, precision="default")
    )
    table_np = np.asarray(table)
    agreements = []
    for i in range(POP):
        cdf = np.cumsum(probs[i].astype(np.float32), dtype=np.float32)
        u = np.asarray(frac[i]) * cdf[-1]
        idx = np.minimum(np.searchsorted(cdf, u, side="right"), (1 << N) - 1)
        agreements.append(float(np.mean(np.isclose(e_kernel[i], table_np[idx]))))
    agreement = float(np.mean(agreements))
    print(f"stream agreement vs flat searchsorted: {agreement:.4f}")
    assert agreement >= 0.98, agreements

    # sustained rate: K evaluations inside one jitted scan, fresh angles
    @jax.jit
    def scan_evals(gt, ctrl, a, lm, tab, fr):
        def step(carry, k):
            p = build_fold_pipeline(
                gt, ctrl, a + 0.001 * k.astype(jnp.float32), lm, N, absorb_diag=True
            )
            e = pallas_sampled_shot_energies_folded(
                p, tab, fr, N, SHOTS, precision="default"
            )
            return carry + e.mean(axis=-1), None

        out, _ = jax.lax.scan(step, jnp.zeros(gt.shape[0], jnp.float32), jnp.arange(K))
        return out

    args = (packed.gate_types, packed.controls, packed.angles, packed.layer_mask, table, frac)
    np.asarray(scan_evals(*args))
    np.asarray(scan_evals(*args))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        np.asarray(scan_evals(*args))
    rate = POP * K * reps / (time.perf_counter() - t0)
    print(f"n={N} pop={POP} shots={SHOTS}: {rate:.1f} evals/s sustained")
    print("GATE OK")


if __name__ == "__main__":
    main()
