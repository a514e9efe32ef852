"""One-launch grouped sampler at n=21: on-chip gate + rate (round 5).

Round 4 capped `grouped_fold_supported` at n=20 ("untested past 20")
although every ingredient — the folded circuit, the rotation kron layer,
the in-VMEM index-emitting sampler — reaches n=21.  This probe verifies
the n=21 one-launch multi-group kernel on the chip against the
per-group folded route (same uniforms, same extended-pipeline op
sequence, so the sampled multisets must agree up to CDF-rounding
boundary flips) and measures both routes' sustained rates.

Run on the TPU: python experiments/exp_grouped_n21.py
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
from queasars_tpu.sim.grouped_sampling import grouped_operands, grouped_shot_energies_pallas

N, POP, SHOTS = 21, 8, 512


def route_energies(packed, keys, operands, one_launch: bool):
    os.environ["QUEASARS_GROUPED_ONE_LAUNCH"] = "1" if one_launch else "0"

    def run(a):
        return grouped_shot_energies_pallas(
            packed.gate_types, packed.controls, a, packed.layer_mask,
            np.asarray(keys), *operands, n_qubits=N, shots=SHOTS, use_mxu=True,
        )

    t0 = time.perf_counter()
    first = np.asarray(run(packed.angles))
    compile_s = time.perf_counter() - t0
    np.asarray(run(packed.angles + np.float32(0.01)))  # warm second shape-hit
    repeats = 5
    t0 = time.perf_counter()
    for i in range(repeats):
        np.asarray(run(packed.angles + np.float32(0.001 * (i + 1))))
    rate = POP * repeats / (time.perf_counter() - t0)
    return first, rate, compile_s


def main() -> None:
    population = EVQEPopulation.random_population(N, 2, POP, True, random_seed=3)
    packed = PackedPopulation.pack(list(population.individuals))
    operator = transverse_field_ising(N, coupling=1.0, field=0.7)
    operands = grouped_operands(operator)
    n_groups = int(operands[2].shape[0])
    keys = jax.random.split(jax.random.PRNGKey(5), POP)

    one, one_rate, one_compile = route_energies(packed, keys, operands, True)
    per, per_rate, per_compile = route_energies(packed, keys, operands, False)

    # same uniforms + same op sequence: energies agree to shot-noise-free
    # float tolerance (boundary draws may flip bins; with 512 shots a
    # single flip moves the mean by ~|E|/512)
    diff = np.abs(one - per).max()
    print(f"n={N} G={n_groups} pop={POP} shots={SHOTS}")
    print(f"one-launch: {one_rate:.1f} evals/s (compile {one_compile:.0f}s)")
    print(f"per-group:  {per_rate:.1f} evals/s (compile {per_compile:.0f}s)")
    print(f"max |energy diff| one-launch vs per-group: {diff:.3e}")
    scale = float(np.abs(one).mean())
    assert diff <= max(0.05 * scale, 0.05), (one, per)
    print("GATE OK: one-launch n=21 grouped kernel agrees with the per-group route")


if __name__ == "__main__":
    main()
