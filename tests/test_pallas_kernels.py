"""Fused Pallas kernel tests (interpreter mode on the CPU mesh).

The compiled path is exercised on real TPU hardware by bench.py; here the
kernel's semantics are pinned against the jnp engine via the Pallas
interpreter.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.sim.evaluators import _energies_exact
from queasars_tpu.sim.pallas_kernels import (
    pallas_energies_exact,
    pallas_population_probs,
    pallas_supported,
)
from queasars_tpu.sim.statevector import probabilities


@pytest.mark.parametrize("n_qubits", [7, 8, 9])
def test_pallas_probs_match_jnp_engine(n_qubits):
    pop = EVQEPopulation.random_population(n_qubits, 3, 6, True, random_seed=n_qubits)
    packed = PackedPopulation.pack(list(pop.individuals))
    ref = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n_qubits
        )
    )
    got = np.asarray(
        pallas_population_probs(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            n_qubits, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-6)
    np.testing.assert_allclose(got.sum(axis=-1), 1.0, atol=1e-5)


def test_pallas_energies_match_jnp_engine():
    n = 8
    rng = np.random.default_rng(0)
    pop = EVQEPopulation.random_population(n, 4, 8, True, random_seed=1)
    packed = PackedPopulation.pack(list(pop.individuals))
    table = rng.normal(size=1 << n).astype(np.float32)
    ref = np.asarray(
        _energies_exact(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            jnp.asarray(table), n,
        )
    )
    got = np.asarray(
        pallas_energies_exact(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            jnp.asarray(table), n, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pallas_layer_mask_respected():
    n = 7
    pop = EVQEPopulation.random_population(n, 2, 4, True, random_seed=2)
    packed = PackedPopulation.pack(list(pop.individuals), min_layers=4)
    assert packed.max_layers == 4  # two padded layers
    ref = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    got = np.asarray(
        pallas_population_probs(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            n, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_pallas_guardrails():
    with pytest.raises(ValueError):
        pallas_energies_exact(
            np.zeros((1, 1, 3), np.int32), np.zeros((1, 1, 3), np.int32),
            np.zeros((1, 1, 3, 3), np.float32), np.ones((1, 1), bool),
            jnp.zeros(8, jnp.float32), 3, interpret=True,
        )
    assert pallas_supported(20, "tpu")
    assert not pallas_supported(21, "tpu")
    assert not pallas_supported(20, "cpu")
    assert not pallas_supported(5, "tpu")


def test_pallas_states_match_jnp_engine():
    from queasars_tpu.sim.pallas_kernels import pallas_population_states
    from queasars_tpu.sim.statevector import simulate_circuits

    n = 8
    pop = EVQEPopulation.random_population(n, 3, 5, True, random_seed=4)
    packed = PackedPopulation.pack(list(pop.individuals))
    ref = np.asarray(
        simulate_circuits(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    got = np.asarray(
        pallas_population_states(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            n, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_pallas_prefix_split_matches_full_circuit():
    """Prefix states + single-suffix-layer evaluation == full circuit
    (the layer-prefix cache contract of the batched optimizers)."""
    from queasars_tpu.sim.pallas_kernels import pallas_population_states

    n = 7
    rng = np.random.default_rng(3)
    pop = EVQEPopulation.random_population(n, 3, 4, True, random_seed=5)
    packed = PackedPopulation.pack(list(pop.individuals))
    gt, c, a, lm = packed.gate_types, packed.controls, packed.angles, packed.layer_mask
    last = lm.sum(axis=1).astype(np.int32) - 1

    prefix_mask = np.logical_and(lm, np.arange(packed.max_layers)[None, :] < last[:, None])
    prefix = pallas_population_states(gt, c, a, prefix_mask, n, interpret=True)

    gt1 = np.take_along_axis(gt, last[:, None, None], axis=1)
    c1 = np.take_along_axis(c, last[:, None, None], axis=1)
    a1 = np.take_along_axis(a, last[:, None, None, None], axis=1)
    mask1 = np.ones((packed.n_individuals, 1), bool)

    probs_split = np.asarray(
        pallas_population_probs(gt1, c1, a1, mask1, n, interpret=True, initial=prefix)
    )
    probs_full = np.asarray(probabilities(gt, c, a, lm, n))
    np.testing.assert_allclose(probs_split, probs_full, atol=1e-6)

    table = jnp.asarray(rng.normal(size=1 << n).astype(np.float32))
    e_split = np.asarray(
        pallas_energies_exact(gt1, c1, a1, mask1, table, n, interpret=True, initial=prefix)
    )
    e_full = probs_full @ np.asarray(table)
    np.testing.assert_allclose(e_split, e_full, atol=1e-5)
