"""Mesh distribution tests on the virtual 8-device CPU mesh.

The TPU analog of the reference's dask LocalCluster integration tests
(test_evqe_operators.py:25-29): real multi-device execution, no mocks.
Key assertion: sharded results are bit-identical to single-device results
(SURVEY.md §7 stage 6 gate).
"""

import numpy as np

import jax

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.paulis import diagonal_energy_table, pauli_z_string, PauliSum
from queasars_tpu.parallel import (
    population_mesh,
    sharded_population_energies,
    sharded_training_step,
)
from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator


def setup_problem(n_qubits=4, pop=12, seed=0):
    hamiltonian = PauliSum.sum([pauli_z_string(q, n_qubits) for q in range(n_qubits)])
    table = diagonal_energy_table(hamiltonian, dtype=np.float32)
    population = EVQEPopulation.random_population(n_qubits, 2, pop, True, random_seed=seed)
    packed = PackedPopulation.pack(list(population.individuals))
    return hamiltonian, table, packed


def test_mesh_has_eight_devices():
    mesh = population_mesh()
    assert mesh.devices.size == 8


def test_sharded_energies_match_single_device():
    hamiltonian, table, packed = setup_problem(pop=12)  # not a multiple of 8
    mesh8 = population_mesh(8)
    mesh1 = population_mesh(1)
    single = sharded_population_energies(mesh1, packed, table)
    multi = sharded_population_energies(mesh8, packed, table)
    np.testing.assert_array_equal(single, multi)  # bit-identical
    # agrees with the evaluator path
    evaluator = StatevectorExpectationEvaluator(hamiltonian)
    np.testing.assert_allclose(multi, evaluator.evaluate_packed(packed), atol=1e-6)


def test_sharded_training_step_matches_single_device():
    _, table, packed = setup_problem(pop=16, seed=1)
    coords = np.stack(
        [
            np.pad(packed.param_coordinates(i), ((0, 64 - packed.n_params[i]), (0, 0)))
            for i in range(packed.n_individuals)
        ]
    )
    n_free = packed.n_params
    active = np.ones(packed.n_individuals, bool)

    mesh8 = population_mesh(8)
    mesh1 = population_mesh(1)
    angles8, energies8 = sharded_training_step(mesh8, packed, table, coords, n_free, active)
    angles1, energies1 = sharded_training_step(mesh1, packed, table, coords, n_free, active)
    np.testing.assert_array_equal(angles8, angles1)
    np.testing.assert_array_equal(energies8, energies1)
    # the step actually optimized
    before = StatevectorExpectationEvaluator(
        PauliSum.sum([pauli_z_string(q, 4) for q in range(4)])
    ).evaluate_packed(packed)
    assert energies8.sum() < before.sum()


def test_sharding_layout():
    """The population axis is actually distributed across devices."""
    from queasars_tpu.parallel.mesh import shard_packed

    _, _, packed = setup_problem(pop=16)
    mesh = population_mesh(8)
    placed, original = shard_packed(packed, mesh)
    assert original == 16
    arr = placed["angles"]
    assert len(arr.sharding.device_set) == 8
    # each device holds 1/8 of the population axis
    shard_shapes = {s.data.shape for s in arr.addressable_shards}
    assert shard_shapes == {(2,) + packed.angles.shape[1:]}
