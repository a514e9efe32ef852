"""Seeded-genome parity against reference-derived fixtures.

Two layers of pinning (VERDICT round-1 item 2):

1. A live oracle (tests/reference_oracle.py) — an independent transcription
   of the reference's Random call order — checked against the genome
   module across hundreds of seeds, layer chains and population draws.
2. A static fixture file (tests/fixtures/reference_genomes.json) generated
   from that oracle and committed, so a coupled regression of module AND
   oracle cannot silently pass.

Both pin structures (gate codes, CR pairings) AND the exact parameter
values (draw order), i.e. the full seeded genome state the evolutionary
trajectory starts from.
"""

import json
import os

import pytest

from queasars_tpu.genome import EVQECircuitLayer, EVQEIndividual, EVQEPopulation
from queasars_tpu.genome.gates import ControlGate, ControlledRotationGate

from tests.reference_oracle import (
    CROT,
    CTRL,
    oracle_random_individual,
    oracle_random_layer,
    oracle_random_population,
)

FIXTURE_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "reference_genomes.json")


def layer_to_tuples(layer: EVQECircuitLayer) -> tuple[tuple[int, ...], tuple[int, ...]]:
    codes = tuple(gate.gate_type().value for gate in layer.gates)
    partners = []
    for gate in layer.gates:
        if isinstance(gate, ControlledRotationGate):
            partners.append(gate.control_qubit_index)
        elif isinstance(gate, ControlGate):
            partners.append(gate.controlled_qubit_index)
        else:
            partners.append(-1)
    return codes, tuple(partners)


def individual_to_tuples(individual: EVQEIndividual):
    return [layer_to_tuples(layer) for layer in individual.layers], individual.parameter_values


@pytest.mark.parametrize("n_qubits", [2, 3, 5, 8])
def test_random_layer_matches_reference_call_order(n_qubits):
    for seed in range(150):
        layer = EVQECircuitLayer.random_layer(n_qubits=n_qubits, random_seed=seed)
        assert layer_to_tuples(layer) == oracle_random_layer(n_qubits, None, seed)


@pytest.mark.parametrize("n_qubits", [3, 5, 8])
def test_chained_random_layers_match_reference(n_qubits):
    """The previous-layer constraint path (forced CR slots, duplicate-pair
    rejection) consumes randomness exactly like the reference."""
    for seed in range(100):
        previous_layer = EVQECircuitLayer.random_layer(n_qubits=n_qubits, random_seed=seed)
        previous_oracle = oracle_random_layer(n_qubits, None, seed)
        chained = EVQECircuitLayer.random_layer(
            n_qubits=n_qubits, previous_layer=previous_layer, random_seed=seed + 5000
        )
        assert layer_to_tuples(chained) == oracle_random_layer(
            n_qubits, previous_oracle, seed + 5000
        )


@pytest.mark.parametrize("n_qubits,n_layers", [(3, 1), (5, 3), (7, 4)])
def test_random_individual_matches_reference(n_qubits, n_layers):
    for seed in range(60):
        individual = EVQEIndividual.random_individual(
            n_qubits=n_qubits, n_layers=n_layers, randomize_parameter_values=True, random_seed=seed
        )
        layers, values = individual_to_tuples(individual)
        oracle_layers, oracle_values = oracle_random_individual(n_qubits, n_layers, True, seed)
        assert layers == oracle_layers
        assert values == oracle_values


def test_random_population_matches_reference():
    population = EVQEPopulation.random_population(5, 2, 12, True, random_seed=17)
    oracle = oracle_random_population(5, 2, 12, True, 17)
    assert [individual_to_tuples(ind) for ind in population.individuals] == [
        (layers, values) for layers, values in oracle
    ]


def test_pinned_static_fixtures():
    """Committed fixture file: seeds -> exact genome structures + values."""
    with open(FIXTURE_PATH) as fh:
        fixtures = json.load(fh)
    for entry in fixtures:
        individual = EVQEIndividual.random_individual(
            n_qubits=entry["n_qubits"],
            n_layers=entry["n_layers"],
            randomize_parameter_values=entry["randomize"],
            random_seed=entry["seed"],
        )
        layers, values = individual_to_tuples(individual)
        expected_layers = [
            (tuple(codes), tuple(partners)) for codes, partners in entry["layers"]
        ]
        assert layers == expected_layers
        assert list(values) == entry["parameter_values"]
