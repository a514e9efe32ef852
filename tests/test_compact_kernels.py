"""Compacted-gate kernel tests (interpreter mode).

The compact formulation is not the production kernel (it measured 0.53x
the slot kernel on v5e — see the module docstring), but it is kept as a
correct alternative; these tests pin its semantics against the jnp
engine.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.sim.compact_kernels import (
    compact_energies_exact,
    compact_gates,
    compact_probs,
)
from queasars_tpu.sim.statevector import probabilities


@pytest.mark.parametrize("n_qubits,layers", [(7, 3), (10, 4)])
def test_compact_probs_match_jnp_engine(n_qubits, layers):
    pop = EVQEPopulation.random_population(n_qubits, layers, 5, True, random_seed=n_qubits)
    packed = PackedPopulation.pack(list(pop.individuals))
    compact = compact_gates(packed.gate_types, packed.controls, packed.layer_mask, n_qubits)
    # bucketed gate dimension, ordered segment boundaries
    assert compact.max_gates % 16 == 0
    assert (np.diff(compact.boundaries, axis=1) >= 0).all()
    ref = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n_qubits
        )
    )
    got = np.asarray(compact_probs(compact, packed.angles, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_compact_energies_match_jnp_engine():
    n = 10
    rng = np.random.default_rng(1)
    pop = EVQEPopulation.random_population(n, 4, 6, True, random_seed=3)
    packed = PackedPopulation.pack(list(pop.individuals))
    compact = compact_gates(packed.gate_types, packed.controls, packed.layer_mask, n)
    table = rng.normal(size=1 << n).astype(np.float32)
    ref = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    ) @ table
    got = np.asarray(
        compact_energies_exact(compact, packed.angles, jnp.asarray(table), interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_compact_skips_padded_layers():
    n = 7
    pop = EVQEPopulation.random_population(n, 2, 4, True, random_seed=5)
    packed = PackedPopulation.pack(list(pop.individuals), min_layers=4)
    compact = compact_gates(packed.gate_types, packed.controls, packed.layer_mask, n)
    # padded layers contribute zero-width segments
    real = packed.layer_mask.sum(axis=1)
    for p in range(packed.n_individuals):
        for l in range(packed.max_layers):
            if l >= real[p]:
                assert compact.boundaries[p, 2 * l] == compact.boundaries[p, 2 * l + 2]
    ref = np.asarray(
        probabilities(packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n)
    )
    got = np.asarray(compact_probs(compact, packed.angles, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)
