"""Fused-kernel grouped sampling at the bench shape (n=20, pop=32).

Compares, sustained over a K-eval lax.scan in one jit (docs/performance.md
"Measuring on this platform"):

- jnp grouped path (simulate once + per-group rotate/sample)
- fused kernel route (one in-VMEM simulate+sample launch per group on the
  rotated circuit; folded MXU and slot variants)
- the diagonal sampler kernel (the G=1 ceiling)

Run on the TPU: python experiments/exp_grouped_pallas.py
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
from queasars_tpu.problems.spin_chains import transverse_field_ising
from queasars_tpu.sim.grouped_sampling import (
    grouped_energies_from_states,
    grouped_operands,
    grouped_shot_energies_pallas,
)
from queasars_tpu.sim.statevector import simulate_circuits

N, POP, SHOTS, K = 20, 32, 512, 20


def sustained_rate(fn, gt, c, a, lm):
    """K evaluations inside one jitted scan with FRESH angles per step —
    the bench.py shape.  (The round-3 version reused identical operands
    every iteration, letting XLA hoist the pure evaluation out of the
    scan: absolute rates were inflated ~K-fold.  Ratios between routes
    were still per-launch cost ratios, but the absolute numbers in the
    round-3 table were wrong — superseded by this measurement.)"""

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


def molecular_like(n_qubits: int, n_terms: int, seed: int) -> PauliSum:
    """Synthetic molecular-style operator: random 3-local mixed-basis
    strings (the locality structure of qubit-mapped electronic
    Hamiltonians), giving O(10) QWC groups at 40 terms."""
    rng = np.random.default_rng(seed)
    terms = []
    for _ in range(n_terms):
        qubits = rng.choice(n_qubits, size=3, replace=False)
        label = ["I"] * n_qubits
        for q in qubits:
            label[n_qubits - 1 - int(q)] = "XYZ"[rng.integers(3)]
        terms.append(PauliSum.from_label("".join(label), float(rng.normal())))
    return PauliSum.sum(terms)


def main():
    from queasars_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    population = EVQEPopulation.random_population(N, 3, POP, True, random_seed=0)
    packed = PackedPopulation.pack(list(population.individuals))
    args = (packed.gate_types, packed.controls, packed.angles, packed.layer_mask)
    tfim = transverse_field_ising(N, coupling=1.0, field=0.9)
    operands = grouped_operands(tfim)
    keys = jnp.asarray(jax.random.split(jax.random.PRNGKey(0), POP))
    n_groups = int(operands[2].shape[0])
    print(f"n={N} pop={POP} shots={SHOTS} TFIM groups={n_groups}")

    def jnp_fn(gt, c, a, lm):
        states = simulate_circuits(gt, c, a, lm, N)
        return grouped_energies_from_states(states, keys, *operands, shots=SHOTS)

    def kernel_fn(use_mxu):
        def fn(gt, c, a, lm):
            return grouped_shot_energies_pallas(
                gt, c, a, lm, keys, *operands, n_qubits=N, shots=SHOTS, use_mxu=use_mxu
            )

        return fn

    rate = sustained_rate(jnp_fn, *args)
    print(f"grouped jnp                      {rate:8.1f} evals/s")
    rate = sustained_rate(kernel_fn(True), *args)
    print(f"grouped fused kernels (folded)   {rate:8.1f} evals/s")
    rate = sustained_rate(kernel_fn(False), *args)
    print(f"grouped fused kernels (slot)     {rate:8.1f} evals/s")

    # the diagonal sampler kernel: the G=1 ceiling for this shape
    from queasars_tpu.optim.objective import population_energies
    from queasars_tpu.paulis.diagonal import diagonal_energy_table

    diag_op = PauliSum.sum([pauli_z_string(q, N) * float(q + 1) for q in range(N)])
    table = jnp.asarray(diagonal_energy_table(diag_op, dtype=np.float32))
    dummy = jnp.zeros(1, jnp.float32)
    dummy_order = jnp.zeros(1, jnp.int32)

    def diag_fn(gt, c, a, lm):
        return population_energies(
            gt, c, a, lm, table, dummy, dummy_order, jnp.float32(1.0), keys,
            n_qubits=N, shots=SHOTS, use_cvar=False, use_shots=True, use_pallas=True,
        )

    rate = sustained_rate(diag_fn, *args)
    print(f"diagonal sampler kernel (G=1)    {rate:8.1f} evals/s")

    # molecular-style operator: ~10 QWC groups of 3-local mixed-basis
    # strings — the G-scaling regime the shared fold build targets
    mol = molecular_like(N, 40, seed=7)
    mol_operands = grouped_operands(mol)
    mol_groups = int(mol_operands[2].shape[0])
    print(f"molecular-like operator: {len(mol.coeffs)} terms, {mol_groups} groups")

    def mol_jnp_fn(gt, c, a, lm):
        states = simulate_circuits(gt, c, a, lm, N)
        return grouped_energies_from_states(states, keys, *mol_operands, shots=SHOTS)

    def mol_kernel_fn(gt, c, a, lm):
        return grouped_shot_energies_pallas(
            gt, c, a, lm, keys, *mol_operands, n_qubits=N, shots=SHOTS, use_mxu=True
        )

    rate = sustained_rate(mol_jnp_fn, *args)
    print(f"molecular grouped jnp            {rate:8.1f} evals/s")
    rate = sustained_rate(mol_kernel_fn, *args)
    print(f"molecular grouped folded kernels {rate:8.1f} evals/s")


if __name__ == "__main__":
    main()
