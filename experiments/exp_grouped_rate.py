"""Grouped-measurement sampler throughput on the TPU.

The QWC grouped path (general operators on the sampler path,
sim/grouped_sampling.py) simulates the population ONCE per evaluation and
then, per measurement group, applies one basis-rotation layer and samples
counts — so its cost model is

    t_grouped ≈ t_simulate + G * (t_rotate_layer + t_sample)

against the diagonal sampler's t_simulate + t_sample.  This experiment
measures both on the real chip at a production-ish shape (n=16, pop=32,
TFIM: G=2 groups) plus a wider random Hamiltonian (G~6), sustained over a
lax.scan of K evaluations inside one jit (the platform's ~35 ms dispatch
would otherwise dominate; see docs/performance.md "Measuring on this
platform").

Run on the TPU: python experiments/exp_grouped_rate.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.paulis import PauliSum, pauli_z_string
from queasars_tpu.sim.grouped_sampling import grouped_operands
from queasars_tpu.sim.sampling import sample_counts
from queasars_tpu.sim.expectation import expectation_from_probs
from queasars_tpu.sim.statevector import simulate_circuits
from queasars_tpu.problems.spin_chains import transverse_field_ising

N, POP, SHOTS, K = 16, 32, 512, 50


def packed_population(seed=0):
    population = EVQEPopulation.random_population(N, 3, POP, True, random_seed=seed)
    return PackedPopulation.pack(list(population.individuals))


def sustained_rate(fn, gt, c, a, lm):
    """Warm-compile then time K scan iterations inside one jit, with
    FRESH angles per step.  (The round-3 version reused identical
    operands every iteration, letting XLA hoist the pure evaluation out
    of the scan — absolute rates were inflated ~K-fold; ratios held.)"""

    @jax.jit
    def scan_k(gt, c, a, lm):
        def body(carry, k):
            e = fn(gt, c, a + 0.001 * k.astype(jnp.float32), lm)
            return carry + e.sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
        return total

    np.asarray(scan_k(gt, c, a, lm))  # warm compile + full host sync
    t0 = time.perf_counter()
    np.asarray(scan_k(gt, c, a, lm))
    dt = time.perf_counter() - t0
    return K * POP / dt


def grouped_fn(operator):
    rot_types, rot_angles, tables, const = grouped_operands(operator)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, POP)

    from queasars_tpu.sim.grouped_sampling import grouped_energies_from_states

    def fn(gate_types, controls, angles, layer_mask):
        states = simulate_circuits(gate_types, controls, angles, layer_mask, N)
        return grouped_energies_from_states(
            states, keys, rot_types, rot_angles, tables, const, shots=SHOTS
        )

    return fn


def diagonal_fn(operator):
    from queasars_tpu.paulis.diagonal import diagonal_energy_table
    from queasars_tpu.sim.statevector import probabilities

    table = jnp.asarray(diagonal_energy_table(operator, dtype=np.float32))
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, POP)

    def fn(gate_types, controls, angles, layer_mask):
        probs = probabilities(gate_types, controls, angles, layer_mask, N)
        counts = jax.vmap(lambda k, p: sample_counts(k, p, SHOTS))(keys, probs)
        return expectation_from_probs(counts.astype(jnp.float32) / SHOTS, table)

    return fn


def main():
    packed = packed_population()
    args = (packed.gate_types, packed.controls, packed.angles, packed.layer_mask)

    diag_op = PauliSum.sum([pauli_z_string(q, N) * float(q + 1) for q in range(N)])
    tfim = transverse_field_ising(N, coupling=1.0, field=0.9)

    rng = np.random.default_rng(3)
    wide = None
    for _ in range(24):
        label = "".join(rng.choice(list("IIXYZ")) for _ in range(N))
        if set(label) == {"I"}:
            continue
        term = PauliSum.from_label(label, float(rng.normal()))
        wide = term if wide is None else wide + term

    for name, op in [("TFIM", tfim), ("random-24-term", wide)]:
        _, groups = __import__(
            "queasars_tpu.paulis.grouping", fromlist=["qwc_groups"]
        ).qwc_groups(op)
        rate = sustained_rate(grouped_fn(op), *args)
        print(f"grouped sampler  {name:16s} G={len(groups)}  {rate:8.1f} evals/s")

    rate = sustained_rate(diagonal_fn(diag_op), *args)
    print(f"diagonal sampler {'(jnp engine)':16s} G=1  {rate:8.1f} evals/s")


if __name__ == "__main__":
    main()
