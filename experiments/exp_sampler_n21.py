"""In-VMEM sampler at n=21: correctness + rate probe (round 4).

Emitting sampled INDICES (instead of energies) moved the diagonal
energy table out of kernel VMEM, which frees enough scratch for the
hierarchical-CDF epilogue one qubit past the old n=20 cap.  This probe
verifies the n=21 folded sampler kernel on the chip against a flat
searchsorted over the SAME-precision folded probabilities (the kernel
simulates at "default" bf16 matmul precision — comparing against exact
probabilities mixes precisions and under-reports agreement), then
measures the sustained rate.

Run on the TPU: python experiments/exp_sampler_n21.py
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

N, POP, SHOTS, K = 21, 8, 512, 20


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
    e_kernel = np.asarray(
        pallas_sampled_shot_energies_folded(pipe, table, frac, N, SHOTS, precision="default")
    )
    probs_fold = pallas_population_probs_folded(pipe, N, precision="default")
    idx = jax.vmap(
        lambda f, p: jnp.searchsorted(jnp.cumsum(p), f * jnp.sum(p), side="right")
    )(frac, probs_fold)
    idx = np.clip(np.asarray(idx), 0, (1 << N) - 1)
    e_ref = np.asarray(table)[idx]
    agreement = float((e_kernel == e_ref).mean())
    print(f"n={N} shot agreement vs same-precision flat stream: {agreement:.4f}")
    assert agreement > 0.98, agreement

    @jax.jit
    def scan_rate(gt, ctrl, ang, lm, fr):
        def step(carry, k):
            p = build_fold_pipeline(
                gt, ctrl, ang + 0.001 * k.astype(jnp.float32), lm, N, absorb_diag=True
            )
            e = pallas_sampled_shot_energies_folded(p, table, fr, N, SHOTS, precision="default")
            return carry + jnp.mean(e, axis=-1), None

        out, _ = jax.lax.scan(step, jnp.zeros(gt.shape[0], jnp.float32), jnp.arange(K))
        return out

    args = (packed.gate_types, packed.controls, packed.angles, packed.layer_mask, frac)
    np.asarray(scan_rate(*args))
    t0 = time.perf_counter()
    np.asarray(scan_rate(*args))
    rate = K * POP / (time.perf_counter() - t0)
    print(f"n={N} folded sampler sustained: {rate:.1f} evals/s (pop {POP}, {SHOTS} shots)")


if __name__ == "__main__":
    main()
