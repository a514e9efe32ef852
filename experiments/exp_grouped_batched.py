"""Batched cross-group sampler epilogue: on-chip rates (round 5).

VERDICT r4 weak #3 / next-round item 4: the one-launch grouped kernel's
residual vs the diagonal ceiling is the per-group sampler epilogue, and
its groups serialize on a write-after-read hazard (group g's epilogue
reads the state planes group g+1's rotation overwrites).  The batched
kernel stages each group's probability plane into stacked VMEM scratch
and resolves every group from there — epilogues detach from the state
planes and from each other (``_grouped_sampled_folded_batched_kernel``).

Measures, sustained over a K-eval fresh-angle scan at n=20 pop=32
shots=512: sequential vs batched one-launch kernels on a TFIM (G=2), a
molecular-style 3-local operator (G~7), and a denser one (G~12), plus
the diagonal sampler kernel (the G=1 ceiling).

Run on the TPU: python experiments/exp_grouped_batched.py
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
from queasars_tpu.problems.spin_chains import transverse_field_ising
from queasars_tpu.sim.fold_pipeline import build_fold_pipeline, rotation_layer_factors
from queasars_tpu.sim.grouped_sampling import grouped_operands
from queasars_tpu.sim.pallas_fold_kernels import pallas_grouped_shot_energies_folded

from exp_grouped_pallas import molecular_like

N, POP, SHOTS, K = 20, 32, 512, 20


def sustained(fn, *args):
    @jax.jit
    def scan_k(gt, c, a, lm):
        def body(carry, k):
            e = fn(gt, c, a + 0.001 * k.astype(jnp.float32), lm)
            return carry + e.sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return total

    np.asarray(scan_k(*args))
    t0 = time.perf_counter()
    np.asarray(scan_k(*args))
    return K * POP / (time.perf_counter() - t0)


def route(operands, keys, batched):
    rot_types, rot_angles, tables, const = operands
    n_groups = int(tables.shape[0])

    def fn(gt, c, a, lm):
        pipe = build_fold_pipeline(gt, c, a, lm, N, absorb_diag=True)
        rot_factors, rot_active = rotation_layer_factors(rot_types, rot_angles, N)
        frac = tuple(
            jax.vmap(
                lambda k, g=g: jax.random.uniform(
                    jax.random.fold_in(k, g), (SHOTS,), jnp.float32
                )
            )(keys)
            for g in range(n_groups)
        )
        shot_energies = pallas_grouped_shot_energies_folded(
            pipe, rot_factors, rot_active, tables, frac, N, (SHOTS,) * n_groups,
            precision="default", batched=batched,
        )
        total = jnp.zeros(gt.shape[0], jnp.float32)
        for e in shot_energies:
            total = total + jnp.mean(e, axis=-1)
        return const + total

    return fn


def main() -> None:
    population = EVQEPopulation.random_population(N, 3, POP, True, random_seed=0)
    packed = PackedPopulation.pack(list(population.individuals))
    args = (packed.gate_types, packed.controls, packed.angles, packed.layer_mask)
    keys = jnp.asarray(jax.random.split(jax.random.PRNGKey(0), POP))

    operators = [
        ("TFIM", transverse_field_ising(N, coupling=1.0, field=0.9)),
        ("molecular-40t", molecular_like(N, 40, seed=1)),
        ("molecular-90t", molecular_like(N, 90, seed=2)),
    ]
    for name, operator in operators:
        operands = grouped_operands(operator)
        n_groups = int(operands[2].shape[0])
        correctness = {}
        for batched in (False, True):
            fn = route(operands, keys, batched)
            correctness[batched] = np.asarray(fn(*args))
            rate = sustained(fn, *args)
            print(
                f"{name:15s} G={n_groups:3d} batched={int(batched)}: "
                f"{rate:8.1f} evals/s", flush=True,
            )
        diff = np.abs(correctness[True] - correctness[False]).max()
        print(f"{name:15s} max |batched - sequential| = {diff:.3e}")
        assert diff == 0.0, "batched epilogue must be bit-identical"


if __name__ == "__main__":
    main()
