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


# ---------------------------------------------------------------------------
# operator-level oracle (round 3): the Random consumption of pipeline
# construction, mutation Bernoulli/seed draws, speciation representative
# refresh and the selection draws, pinned call-for-call against the
# transcriptions in tests/reference_oracle.py.
# ---------------------------------------------------------------------------

from random import Random

import numpy as np

from queasars_tpu.evolve import (
    EVQELayerRemoval,
    EVQESelection,
    EVQESpeciation,
    EVQETopologicalSearch,
    EVQEParameterSearch,
)
from queasars_tpu.evolve.base import OperatorContext
from queasars_tpu.evolve.mutation import remove_random_layers_from_individual

from tests.reference_oracle import (
    oracle_layer_order,
    oracle_mutation_round,
    oracle_pipeline_seeds,
    oracle_removal_count,
    oracle_roulette_selection,
    oracle_speciation_representatives,
    oracle_tournament_selection,
)

TRAJECTORY_FIXTURE_PATH = os.path.join(
    os.path.dirname(__file__), "fixtures", "structural_trajectory.json"
)


def _context(evaluator=None, result_callback=None):
    return OperatorContext(
        circuit_evaluator=evaluator,
        result_callback=result_callback or (lambda result: None),
        circuit_evaluation_count_callback=lambda count: None,
        pack_min_layers=None,
        energy_cache=None,
    )


class _FixedEvaluator:
    """Stub evaluator returning preset energies (selection draws only
    depend on the energy VALUES, never on how they were computed)."""

    def __init__(self, energies):
        self._energies = np.asarray(energies, np.float64)
        self.n_qubits = 4

    def evaluate_packed(self, packed, angles=None):
        return self._energies[: packed.n_individuals]


class _RecordingOptimizer:
    """Stub optimizer capturing each slot's coordinates (the parameter
    search's layer choices) without touching any angles."""

    def __init__(self):
        self.calls = []

    def minimize(self, evaluator, packed, coords, n_free, active, angles=None, seed=0, **kwargs):
        self.calls.append(
            dict(coords=np.array(coords), n_free=np.array(n_free), active=np.array(active), seed=seed)
        )
        a = packed.angles if angles is None else angles
        return np.asarray(a), np.zeros(packed.n_individuals, np.float32), 2


class TestPipelineSeedOracle:
    def test_operator_and_population_seed_order(self):
        from queasars_tpu.optim import BatchedNFT, NFTConfig
        from queasars_tpu.solver import (
            ConfiguredEstimator,
            EVQEMinimumEigensolver,
            EVQEMinimumEigensolverConfiguration,
        )

        master_seed = 1234
        config = EVQEMinimumEigensolverConfiguration(
            configured_estimator=ConfiguredEstimator(),
            configured_sampler=None,
            optimizer=BatchedNFT(NFTConfig(maxiter=2)),
            optimizer_n_circuit_evaluations=None,
            max_generations=1,
            max_circuit_evaluations=None,
            termination_criterion=None,
            random_seed=master_seed,
            population_size=5,
            speciation_genetic_distance_threshold=2,
            selection_alpha_penalty=0.1,
            selection_beta_penalty=0.1,
            parameter_search_probability=0.4,
            topological_search_probability=0.4,
            layer_removal_probability=0.1,
            n_initial_layers=2,
        )
        solver = EVQEMinimumEigensolver(config)
        expected = oracle_pipeline_seeds(master_seed)
        operators = solver.configuration.evolutionary_operators
        rngs = [
            operators[0].random_generator,       # last-layer search
            operators[1].random_generator,       # speciation
            operators[2]._random_generator,      # selection
            operators[3].random_generator,       # parameter search
            operators[4].random_generator,       # topological search
            operators[5].random_generator,       # layer removal
        ]
        for rng, seed in zip(rngs, expected["operators"].values()):
            assert rng.getstate() == Random(seed).getstate()
        # the population seed is drawn lazily at solve time, AFTER the six
        # operator constructions (reference: evqe.py:190-196)
        population = solver.configuration.population_initializer(4)
        oracle = oracle_random_population(4, 2, 5, True, expected["population"])
        assert [individual_to_tuples(ind) for ind in population.individuals] == [
            (layers, values) for layers, values in oracle
        ]


class TestMutationOracle:
    def _population(self, n_qubits=4, layers=3, pop=8, seed=21):
        return EVQEPopulation.random_population(n_qubits, layers, pop, True, random_seed=seed)

    def test_topological_search_bernoulli_and_seeds(self):
        for op_seed in (0, 7, 99):
            population = self._population()
            operator = EVQETopologicalSearch(mutation_probability=0.5, random_seed=op_seed)
            result = operator.apply_operator(population, _context())
            flags, seeds = oracle_mutation_round(Random(op_seed), len(population.individuals), 0.5)
            for i, individual in enumerate(population.individuals):
                if flags[i]:
                    expected = EVQEIndividual.add_random_layers(
                        individual=individual, n_layers=1,
                        randomize_parameter_values=False, random_seed=seeds[i],
                    )
                    assert result.individuals[i] == expected
                else:
                    assert result.individuals[i] == individual

    def test_layer_removal_bernoulli_and_counts(self):
        for op_seed in (3, 11):
            population = self._population(layers=4)
            operator = EVQELayerRemoval(mutation_probability=0.6, random_seed=op_seed)
            result = operator.apply_operator(population, _context())
            flags, seeds = oracle_mutation_round(Random(op_seed), len(population.individuals), 0.6)
            for i, individual in enumerate(population.individuals):
                if flags[i]:
                    n_remove = oracle_removal_count(seeds[i], len(individual.layers))
                    expected = (
                        individual if n_remove == 0
                        else EVQEIndividual.remove_layers(individual=individual, n_layers=n_remove)
                    )
                    assert result.individuals[i] == expected
                    assert result.individuals[i] == remove_random_layers_from_individual(
                        individual, seeds[i]
                    )
                else:
                    assert result.individuals[i] == individual

    def test_parameter_search_layer_orders(self):
        """The full parameter search visits each selected individual's
        layers in the per-individual random order the reference draws
        (choice + remove + child seed per layer, mutation.py:115-129)."""
        population = self._population(layers=3, pop=6, seed=5)
        op_seed = 17
        optimizer = _RecordingOptimizer()
        operator = EVQEParameterSearch(
            mutation_probability=1.0, optimizer=optimizer,
            optimizer_n_circuit_evaluations=None, random_seed=op_seed,
        )
        operator.apply_operator(population, _context())
        flags, seeds = oracle_mutation_round(Random(op_seed), len(population.individuals), 1.0)
        assert all(flags)
        expected_orders = [
            oracle_layer_order(seeds[i], len(ind.layers))[0]
            for i, ind in enumerate(population.individuals)
        ]
        n_slots = max(len(o) for o in expected_orders)
        assert len(optimizer.calls) == n_slots
        for s, call in enumerate(optimizer.calls):
            for i, order in enumerate(expected_orders):
                if s < len(order) and call["n_free"][i] > 0:
                    # every recorded coordinate of individual i in slot s
                    # lies in the layer the oracle predicts
                    layers_seen = set(call["coords"][i, : call["n_free"][i], 0].tolist())
                    assert layers_seen == {order[s]}


class TestSpeciationOracle:
    def test_representative_refresh_draws(self):
        population = EVQEPopulation.random_population(4, 2, 10, True, random_seed=31)
        op_seed = 13
        operator = EVQESpeciation(genetic_distance_threshold=2, random_seed=op_seed)
        result = operator.apply_operator(population, _context())
        # recompute the deterministic first-fit assignment independently
        members: dict = {}
        for index, individual in enumerate(population.individuals):
            home = None
            for rep in members:
                if (
                    EVQEIndividual.get_genetic_distance(individual_1=individual, individual_2=rep)
                    < 2 or individual == rep
                ):
                    home = rep
                    break
            if home is None:
                members[individual] = [index]
            else:
                members[home].append(index)
        chosen = oracle_speciation_representatives(Random(op_seed), list(members.values()))
        # merge collisions in draw order, exactly like the reference
        expected_reps: list = []
        for idx in chosen:
            rep = population.individuals[idx]
            if rep not in expected_reps:
                expected_reps.append(rep)
        assert list(result.species_representatives) == expected_reps


class TestSelectionOracle:
    def _speciated(self, pop=8, seed=41):
        population = EVQEPopulation.random_population(4, 2, pop, True, random_seed=seed)
        return EVQESpeciation(genetic_distance_threshold=2, random_seed=1).apply_operator(
            population, _context()
        )

    def _species_sizes(self, population):
        return [
            len(population.species_members[population.species_membership[i]])
            for i in range(len(population.individuals))
        ]

    def test_roulette_draws(self):
        population = self._speciated()
        energies = [3.0, 1.5, 2.2, 0.9, 4.4, 2.8, 1.1, 3.7]
        op_seed = 23
        operator = EVQESelection(
            alpha_penalty=0.1, beta_penalty=0.2, random_seed=op_seed
        )
        result = operator.apply_operator(population, _context(_FixedEvaluator(energies)))
        expected_indices = oracle_roulette_selection(
            Random(op_seed), energies,
            [len(ind.layers) for ind in population.individuals],
            [ind.get_n_controlled_gates() for ind in population.individuals],
            self._species_sizes(population), 0.1, 0.2, len(population.individuals),
        )
        assert list(result.individuals) == [
            population.individuals[i] for i in expected_indices
        ]

    def test_tournament_draws(self):
        population = self._speciated(seed=43)
        energies = [3.0, -1.5, 2.2, 0.9, 4.4, 2.8, 1.1, 3.7]
        op_seed = 29
        operator = EVQESelection(
            alpha_penalty=0.05, beta_penalty=0.05,
            use_tournament_selection=True, tournament_size=3, random_seed=op_seed,
        )
        result = operator.apply_operator(population, _context(_FixedEvaluator(energies)))
        expected_indices = oracle_tournament_selection(
            Random(op_seed), energies,
            [len(ind.layers) for ind in population.individuals],
            [ind.get_n_controlled_gates() for ind in population.individuals],
            self._species_sizes(population), 0.05, 0.05, 3, len(population.individuals),
        )
        assert list(result.individuals) == [
            population.individuals[i] for i in expected_indices
        ]


class TestStructuralTrajectoryFixture:
    """A 3-generation structural trajectory (every generation's genome
    structures) pinned as a committed fixture under
    parameter_order='qiskit' — the whole-pipeline composition of the
    per-operator oracles above."""

    @staticmethod
    def _solve_structures():
        from queasars_tpu.optim import BatchedNFT, NFTConfig
        from queasars_tpu.paulis import PauliSum, pauli_z_string
        from queasars_tpu.solver import (
            ConfiguredEstimator,
            EVQEMinimumEigensolver,
            EVQEMinimumEigensolverConfiguration,
        )

        n_qubits = 4
        hamiltonian = PauliSum.sum(
            [pauli_z_string(q, n_qubits) * float(q + 1) for q in range(n_qubits)]
        )
        config = EVQEMinimumEigensolverConfiguration(
            configured_estimator=ConfiguredEstimator(),
            configured_sampler=None,
            optimizer=BatchedNFT(NFTConfig(maxiter=4)),
            optimizer_n_circuit_evaluations=None,
            max_generations=3,
            max_circuit_evaluations=None,
            termination_criterion=None,
            random_seed=77,
            population_size=6,
            speciation_genetic_distance_threshold=2,
            selection_alpha_penalty=0.1,
            selection_beta_penalty=0.1,
            parameter_search_probability=0.5,
            topological_search_probability=0.5,
            layer_removal_probability=0.2,
            use_tournament_selection=True,
            tournament_size=2,
            parameter_order="qiskit",
        )
        result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)
        return [
            [
                [list(map(list, layer_to_tuples(layer))) for layer in individual.layers]
                for individual in evaluation.population.individuals
            ]
            for evaluation in result.population_evaluation_results
        ]

    def test_pinned_structural_trajectory(self):
        structures = self._solve_structures()
        with open(TRAJECTORY_FIXTURE_PATH) as fh:
            expected = json.load(fh)
        assert structures == expected
