"""In-VMEM sampler at n=22: correctness + rate probe (round 5).

n=22 needed three epilogue changes (pallas_kernels._sample_shots_in_vmem):
the Bsel hierarchy gather runs in 128-block half-passes, the 256-entry
block prefix chains two lane-tile scans, and the probability limbs
recompute per shot chunk instead of being held across the level-C loop
(a held limb set is 3 x 16 MB on top of the 32 MB of state planes).
This probe verifies the n=22 folded sampler kernel on the chip against
a flat searchsorted over the SAME-precision folded probabilities, then
measures the sustained rate.

Run on the TPU: python experiments/exp_sampler_n22.py
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
