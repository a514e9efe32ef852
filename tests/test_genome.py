"""Genome invariants over seeded random individuals.

Port of the reference's property-style tests
(test/minimum_eigensolvers/evqe/test_evqe_individual.py): layer validity,
previous-layer constraint, seed determinism, parameter-count agreement,
edit-operation locality, genetic distance.  The reference's gate-by-gate
Qiskit circuit audit becomes a packed-tensor audit plus a dense-oracle
simulation cross-check.
"""

import json

import numpy as np
import pytest

from queasars_tpu.genome import (
    ControlGate,
    ControlledRotationGate,
    EVQECircuitLayer,
    EVQEGateType,
    EVQEIndividual,
    EVQEIndividualException,
    EVQEPopulation,
    IdentityGate,
    PackedPopulation,
    RotationGate,
)
from queasars_tpu.genome.packing import unpack_individual
from queasars_tpu.genome.serialization import (
    EVQEPopulationJSONDecoder,
    EVQEPopulationJSONEncoder,
)

N_SAMPLES = 100


def random_individuals(n=N_SAMPLES, n_qubits=5, n_layers=3, randomize=True):
    return [
        EVQEIndividual.random_individual(n_qubits, n_layers, randomize, random_seed=seed)
        for seed in range(n)
    ]


def test_random_layers_are_valid():
    for seed in range(N_SAMPLES):
        layer = EVQECircuitLayer.random_layer(n_qubits=5, random_seed=seed)
        assert layer.is_valid()


def test_previous_layer_constraint():
    """A qubit holding R/I in the previous layer may only hold CROT/CTRL/ID
    in the next layer (reference: test_evqe_individual.py:74-91)."""
    for seed in range(N_SAMPLES):
        previous = EVQECircuitLayer.random_layer(n_qubits=5, random_seed=seed)
        layer = EVQECircuitLayer.random_layer(n_qubits=5, previous_layer=previous, random_seed=seed + 1)
        assert layer.is_valid()
        for q in range(5):
            if previous.gates[q].gate_type() in (EVQEGateType.ROTATION, EVQEGateType.IDENTITY):
                assert layer.gates[q].gate_type() != EVQEGateType.ROTATION
            # duplicate CR pairs vs previous layer are rejected
            gate = layer.gates[q]
            if isinstance(gate, ControlledRotationGate):
                assert gate not in previous.gates


def test_seed_determinism():
    for seed in (0, 7, 123):
        a = EVQEIndividual.random_individual(4, 3, True, random_seed=seed)
        b = EVQEIndividual.random_individual(4, 3, True, random_seed=seed)
        assert a == b and hash(a) == hash(b)
    assert EVQEIndividual.random_individual(4, 3, True, 0) != EVQEIndividual.random_individual(
        4, 3, True, 1
    )


def test_parameter_count_agreement():
    for individual in random_individuals(30):
        expected = sum(layer.n_parameters for layer in individual.layers)
        assert len(individual.parameter_values) == expected
        packed = PackedPopulation.pack([individual])
        assert packed.n_params[0] == expected
        assert packed.param_mask[0].sum() * 3 == expected


def test_packed_tensor_audit():
    """Packed tensors reproduce the genome gate-by-gate (the tensor analog
    of the reference's circuit.get_instructions audit)."""
    for individual in random_individuals(20):
        packed = PackedPopulation.pack([individual])
        for l, layer in enumerate(individual.layers):
            assert packed.layer_mask[0, l]
            for q, gate in enumerate(layer.gates):
                assert packed.gate_types[0, l, q] == gate.gate_type().value
                if isinstance(gate, ControlledRotationGate):
                    assert packed.controls[0, l, q] == gate.control_qubit_index
                else:
                    assert packed.controls[0, l, q] == -1
        # padding layers are masked off
        for l in range(len(individual.layers), packed.max_layers):
            assert not packed.layer_mask[0, l]
        # round-trip: unpack restores structure exactly and parameters to
        # float32 precision (packing casts f64 host params to f32)
        restored = unpack_individual(packed, 0, individual)
        assert restored.layers == individual.layers
        np.testing.assert_allclose(
            restored.parameter_values, individual.parameter_values, atol=1e-6
        )


def test_change_parameter_values():
    individual = random_individuals(1)[0]
    n = len(individual.parameter_values)
    new_values = tuple(float(i) for i in range(n))
    changed = EVQEIndividual.change_parameter_values(individual, new_values)
    assert changed.layers == individual.layers
    assert changed.parameter_values == new_values
    with pytest.raises(EVQEIndividualException):
        EVQEIndividual.change_parameter_values(individual, new_values + (1.0,))


def test_change_layer_parameter_values_locality():
    for individual in random_individuals(10):
        for layer_id in (-1, 0):
            resolved = layer_id % len(individual.layers)
            k = individual.layers[resolved].n_parameters
            new_layer_values = tuple(42.0 + i for i in range(k))
            changed = EVQEIndividual.change_layer_parameter_values(individual, layer_id, new_layer_values)
            assert changed.layers == individual.layers
            for i, layer in enumerate(individual.layers):
                got = changed.get_layer_parameter_values(i)
                want = new_layer_values if i == resolved else individual.get_layer_parameter_values(i)
                assert got == want


def test_add_random_layers():
    individual = random_individuals(1, n_layers=2)[0]
    grown = EVQEIndividual.add_random_layers(individual, n_layers=2, randomize_parameter_values=False, random_seed=5)
    assert len(grown.layers) == 4
    assert grown.layers[:2] == individual.layers
    assert grown.parameter_values[: len(individual.parameter_values)] == individual.parameter_values
    added = grown.parameter_values[len(individual.parameter_values) :]
    assert all(value == 0 for value in added)
    with pytest.raises(EVQEIndividualException):
        EVQEIndividual.add_random_layers(individual, 0, False, 1)


def test_remove_layers():
    individual = random_individuals(1, n_layers=4)[0]
    shrunk = EVQEIndividual.remove_layers(individual, n_layers=2)
    assert shrunk.layers == individual.layers[:2]
    kept_params = sum(layer.n_parameters for layer in individual.layers[:2])
    assert shrunk.parameter_values == individual.parameter_values[:kept_params]
    with pytest.raises(EVQEIndividualException):
        EVQEIndividual.remove_layers(individual, 4)
    with pytest.raises(EVQEIndividualException):
        EVQEIndividual.remove_layers(individual, 0)


def test_genetic_distance():
    a = random_individuals(1, n_layers=3)[0]
    assert EVQEIndividual.get_genetic_distance(a, a) == 0
    grown = EVQEIndividual.add_random_layers(a, 1, False, 99)
    # shares all 3 prefix layers; ceil((3+4)/2) - 3 = 1
    assert EVQEIndividual.get_genetic_distance(a, grown) == 1
    b = EVQEIndividual.random_individual(5, 3, True, random_seed=12345)
    distance = EVQEIndividual.get_genetic_distance(a, b)
    assert 0 <= distance <= 3


def test_invalid_individual_rejected():
    layer = EVQECircuitLayer.random_layer(n_qubits=3, random_seed=0)
    with pytest.raises(EVQEIndividualException):
        EVQEIndividual(n_qubits=3, layers=(layer,), parameter_values=(0.0,))
    with pytest.raises(EVQEIndividualException):
        EVQEIndividual(n_qubits=3, layers=(), parameter_values=())


def test_invalid_layer_rejected():
    from queasars_tpu.genome import EVQECircuitLayerException

    with pytest.raises(EVQECircuitLayerException):
        # control gate pointing at a rotation (not a CROT) is inconsistent
        EVQECircuitLayer(
            n_qubits=2,
            gates=(
                ControlGate(qubit_index=0, controlled_qubit_index=1),
                RotationGate(qubit_index=1),
            ),
        )
    with pytest.raises(EVQECircuitLayerException):
        # misplaced qubit index
        EVQECircuitLayer(n_qubits=2, gates=(IdentityGate(1), IdentityGate(0)))


def test_population_determinism_and_serialization():
    pop_a = EVQEPopulation.random_population(4, 2, 6, True, random_seed=3)
    pop_b = EVQEPopulation.random_population(4, 2, 6, True, random_seed=3)
    assert pop_a.individuals == pop_b.individuals

    text = json.dumps(pop_a, cls=EVQEPopulationJSONEncoder)
    restored = json.loads(text, cls=EVQEPopulationJSONDecoder)
    assert restored.individuals == pop_a.individuals
    assert restored.species_representatives is None

    # with speciation state
    pop_c = EVQEPopulation(
        individuals=pop_a.individuals,
        species_representatives=[pop_a.individuals[0]],
        species_members={pop_a.individuals[0]: list(range(6))},
        species_membership={i: pop_a.individuals[0] for i in range(6)},
    )
    restored_c = json.loads(json.dumps(pop_c, cls=EVQEPopulationJSONEncoder), cls=EVQEPopulationJSONDecoder)
    assert restored_c.species_representatives == pop_c.species_representatives
    assert restored_c.species_members == pop_c.species_members
    assert restored_c.species_membership == pop_c.species_membership


def test_packed_simulation_matches_dense_oracle():
    """End-to-end genome -> tensors -> engine vs a dense kron oracle."""
    from queasars_tpu.sim import probabilities
    from tests.test_statevector import dense_layer

    individuals = random_individuals(5, n_qubits=4, n_layers=3)
    packed = PackedPopulation.pack(individuals)
    probs = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n_qubits=4
        )
    )
    for i, individual in enumerate(individuals):
        psi = np.zeros(16, dtype=np.complex128)
        psi[0] = 1.0
        for l in range(len(individual.layers)):
            psi = dense_layer(
                packed.gate_types[i, l], packed.controls[i, l], packed.angles[i, l].astype(np.float64), 4
            ) @ psi
        np.testing.assert_allclose(probs[i], np.abs(psi) ** 2, atol=1e-5)


def test_param_coordinates():
    individual = random_individuals(1)[0]
    packed = PackedPopulation.pack([individual])
    coords = packed.param_coordinates(0)
    assert coords.shape == (packed.n_params[0], 3)
    # flat order agreement: writing arange through coords then extracting
    # flat must give arange
    angles = packed.angles[0].copy()
    for flat_idx, (l, q, k) in enumerate(coords):
        angles[l, q, k] = float(flat_idx)
    flat = packed.angles_to_flat(0, angles)
    assert flat == tuple(float(i) for i in range(len(flat)))

    last_layer = packed.layer_param_coordinates(0, -1)
    n_real = len(individual.layers)
    assert all(l == n_real - 1 for l, _, _ in last_layer)
    assert len(last_layer) == individual.layers[-1].n_parameters
