"""Amplitude-sharding tests: the state split across the 8-device CPU mesh
must reproduce the single-chip engine exactly."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.sim.sharded_statevector import (
    AMP_AXIS,
    make_sharded_circuit_fn,
    sharded_expectation,
)
from queasars_tpu.sim.statevector import apply_circuit_real


@pytest.fixture(scope="module")
def amp_mesh():
    return Mesh(np.array(jax.devices()[:8]), (AMP_AXIS,))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sharded_circuit_matches_single_chip(amp_mesh, seed):
    n = 6  # 64 amplitudes over 8 devices -> 8 local amplitudes
    individual = EVQEPopulation.random_population(n, 3, 1, True, random_seed=seed).individuals[0]
    packed = PackedPopulation.pack([individual])

    fn = make_sharded_circuit_fn(amp_mesh, n)
    sharded = np.asarray(
        fn(packed.gate_types[0], packed.controls[0], packed.angles[0], packed.layer_mask[0])
    )
    single = np.asarray(
        apply_circuit_real(
            packed.gate_types[0], packed.controls[0], packed.angles[0], packed.layer_mask[0], n
        )
    )
    np.testing.assert_allclose(sharded, single, atol=1e-6)
    np.testing.assert_allclose((sharded**2).sum(), 1.0, atol=1e-5)


def test_sharded_expectation_matches_dense(amp_mesh):
    n = 7
    rng = np.random.default_rng(3)
    individual = EVQEPopulation.random_population(n, 2, 1, True, random_seed=3).individuals[0]
    packed = PackedPopulation.pack([individual])
    table = rng.normal(size=1 << n).astype(np.float32)

    fn = make_sharded_circuit_fn(amp_mesh, n)
    state = fn(packed.gate_types[0], packed.controls[0], packed.angles[0], packed.layer_mask[0])
    energy = float(sharded_expectation(amp_mesh, state, table))

    single = np.asarray(
        apply_circuit_real(
            packed.gate_types[0], packed.controls[0], packed.angles[0], packed.layer_mask[0], n
        )
    )
    expected = float((single[0] ** 2 + single[1] ** 2) @ table)
    assert energy == pytest.approx(expected, abs=1e-4)


def test_output_is_actually_sharded(amp_mesh):
    n = 6
    individual = EVQEPopulation.random_population(n, 2, 1, True, random_seed=4).individuals[0]
    packed = PackedPopulation.pack([individual])
    fn = make_sharded_circuit_fn(amp_mesh, n)
    state = fn(packed.gate_types[0], packed.controls[0], packed.angles[0], packed.layer_mask[0])
    assert len(state.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in state.addressable_shards}
    assert shard_shapes == {(2, (1 << n) // 8)}
