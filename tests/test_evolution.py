"""Evolution operator tests (directional assertions, seeded) and the
end-to-end EVQE solve.

Mirrors the reference's integration tier
(test/minimum_eigensolvers/evqe/test_evqe_operators.py and
test_evqe_algorithm.py): parameter searches lower summed population
energy, topological search grows layer counts, removal shrinks them,
speciation members stay within the distance threshold, repeated
select+speciate improves, and the full solver finds the exact optimum of
a small problem.
"""

import json

import numpy as np
import pytest

from queasars_tpu.evolve import (
    EVQELastLayerParameterSearch,
    EVQELayerRemoval,
    EVQEParameterSearch,
    EVQESelection,
    EVQESelectionException,
    EVQESpeciation,
)
from queasars_tpu.evolve.base import OperatorContext
from queasars_tpu.genome import EVQEIndividual, EVQEPopulation
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.paulis import diagonal_energy_table
from queasars_tpu.problems.jssp import JSSPDomainWallHamiltonianEncoder
from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator
from queasars_tpu.solver import (
    BestIndividualRelativeChangeTolerance,
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)
from queasars_tpu.solver.serialization import (
    EvolvingAnsatzMinimumEigensolverResultJSONDecoder,
    EvolvingAnsatzMinimumEigensolverResultJSONEncoder,
)
from queasars_tpu.utils import BitstringEvaluator

from tests.jssp_fixtures import problem_instance


@pytest.fixture(scope="module")
def jssp_hamiltonian():
    encoder = JSSPDomainWallHamiltonianEncoder(jssp_instance=problem_instance(), makespan_limit=3)
    return encoder, encoder.get_problem_hamiltonian()


@pytest.fixture()
def context(jssp_hamiltonian):
    _, hamiltonian = jssp_hamiltonian
    evaluator = StatevectorExpectationEvaluator(hamiltonian)
    counts = []
    results = []
    ctx = OperatorContext(
        circuit_evaluator=evaluator,
        result_callback=results.append,
        circuit_evaluation_count_callback=counts.append,
    )
    ctx.counts = counts  # type: ignore[attr-defined]
    ctx.results = results  # type: ignore[attr-defined]
    return ctx


def population_energy_sum(evaluator, population):
    return float(np.sum(evaluator.evaluate_individuals(list(population.individuals))))


def make_population(n_qubits, seed=0, size=8, layers=2):
    return EVQEPopulation.random_population(n_qubits, layers, size, True, random_seed=seed)


def test_last_layer_parameter_search_improves(context, jssp_hamiltonian):
    _, hamiltonian = jssp_hamiltonian
    population = make_population(hamiltonian.n_qubits)
    before = population_energy_sum(context.circuit_evaluator, population)
    operator = EVQELastLayerParameterSearch(
        mutation_probability=1,
        optimizer=BatchedNFT(NFTConfig(maxiter=20)),
        optimizer_n_circuit_evaluations=41,
        random_seed=0,
    )
    mutated = operator.apply_operator(population, context)
    after = population_energy_sum(context.circuit_evaluator, mutated)
    assert after < before
    assert mutated.species_members is None and mutated.species_membership is None
    assert context.counts[-1] > 0
    assert operator.get_n_expected_circuit_evaluations(population, context) == 8 * 41


def test_parameter_search_improves(context, jssp_hamiltonian):
    _, hamiltonian = jssp_hamiltonian
    population = make_population(hamiltonian.n_qubits, seed=1)
    before = population_energy_sum(context.circuit_evaluator, population)
    operator = EVQEParameterSearch(
        mutation_probability=1,
        optimizer=BatchedNFT(NFTConfig(maxiter=20)),
        optimizer_n_circuit_evaluations=41,
        random_seed=1,
    )
    mutated = operator.apply_operator(population, context)
    after = population_energy_sum(context.circuit_evaluator, mutated)
    assert after < before
    # structure untouched, only parameters changed
    for old, new in zip(population.individuals, mutated.individuals):
        assert old.layers == new.layers


def test_topological_search_grows_layers(context, jssp_hamiltonian):
    _, hamiltonian = jssp_hamiltonian
    population = make_population(hamiltonian.n_qubits, seed=2)
    operator = EVQETopologicalSearch(mutation_probability=1, random_seed=2)
    grown = operator.apply_operator(population, context)
    for old, new in zip(population.individuals, grown.individuals):
        assert len(new.layers) == len(old.layers) + 1
        assert new.layers[: len(old.layers)] == old.layers
    assert operator.get_n_expected_circuit_evaluations(population, context) == 0


from queasars_tpu.evolve import EVQETopologicalSearch  # noqa: E402


def test_layer_removal_shrinks(context, jssp_hamiltonian):
    _, hamiltonian = jssp_hamiltonian
    population = make_population(hamiltonian.n_qubits, seed=3, layers=3)
    operator = EVQELayerRemoval(mutation_probability=1, random_seed=3)
    shrunk = operator.apply_operator(population, context)
    total_before = sum(len(ind.layers) for ind in population.individuals)
    total_after = sum(len(ind.layers) for ind in shrunk.individuals)
    assert total_after < total_before
    for ind in shrunk.individuals:
        assert len(ind.layers) >= 1


def test_speciation_assignment(context, jssp_hamiltonian):
    _, hamiltonian = jssp_hamiltonian
    population = make_population(hamiltonian.n_qubits, seed=4, size=10, layers=2)
    threshold = 2
    operator = EVQESpeciation(genetic_distance_threshold=threshold, random_seed=4)
    speciated = operator.apply_operator(population, context)
    assert speciated.species_representatives is not None
    assert speciated.species_members is not None
    # every member is within the threshold of its representative (or equal)
    for i, representative in speciated.species_membership.items():
        individual = speciated.individuals[i]
        assert (
            EVQEIndividual.get_genetic_distance(individual, representative) < threshold
            or individual == representative
        )
    # membership covers everyone exactly once
    covered = sorted(idx for members in speciated.species_members.values() for idx in members)
    assert covered == list(range(10))


def test_selection_requires_speciation(context, jssp_hamiltonian):
    _, hamiltonian = jssp_hamiltonian
    population = make_population(hamiltonian.n_qubits, seed=5)
    with pytest.raises(EVQESelectionException):
        EVQESelection(alpha_penalty=0.1, beta_penalty=0.1, random_seed=5).apply_operator(
            population, context
        )


def test_select_speciate_cycle_improves(context, jssp_hamiltonian):
    """Repeated speciate+select monotonically improves the summed energy
    (reference: test_evqe_operators.py:185-209)."""
    _, hamiltonian = jssp_hamiltonian
    population = make_population(hamiltonian.n_qubits, seed=6, size=12)
    evaluator = context.circuit_evaluator
    speciation = EVQESpeciation(genetic_distance_threshold=2, random_seed=6)
    selection = EVQESelection(alpha_penalty=0.05, beta_penalty=0.05, random_seed=6)
    first = population_energy_sum(evaluator, population)
    for _ in range(3):
        population = speciation.apply_operator(population, context)
        population = selection.apply_operator(population, context)
    last = population_energy_sum(evaluator, population)
    assert last <= first
    # selection reported one evaluation per individual each round
    assert context.counts.count(12) >= 3
    # generation results were reported
    assert len(context.results) == 3


def test_tournament_selection(context, jssp_hamiltonian):
    _, hamiltonian = jssp_hamiltonian
    population = make_population(hamiltonian.n_qubits, seed=7, size=6)
    population = EVQESpeciation(2, random_seed=7).apply_operator(population, context)
    selection = EVQESelection(
        alpha_penalty=0.0,
        beta_penalty=0.0,
        use_tournament_selection=True,
        tournament_size=3,
        random_seed=7,
    )
    selected = selection.apply_operator(population, context)
    assert len(selected.individuals) == 6
    # tournament winners come from the original population
    for ind in selected.individuals:
        assert ind in population.individuals


# ---------------------------------------------------------------------------
# end-to-end solve (reference: test_evqe_algorithm.py:23-38)
# ---------------------------------------------------------------------------


def evqe_config(**overrides):
    defaults = dict(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=2048, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=40)),
        optimizer_n_circuit_evaluations=None,
        max_generations=8,
        max_circuit_evaluations=None,
        termination_criterion=BestIndividualRelativeChangeTolerance(0.005),
        random_seed=0,
        population_size=10,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.25,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
    )
    defaults.update(overrides)
    return EVQEMinimumEigensolverConfiguration(**defaults)


def test_evqe_finds_exact_jssp_optimum(jssp_hamiltonian):
    encoder, hamiltonian = jssp_hamiltonian
    solver = EVQEMinimumEigensolver(evqe_config())
    result = solver.compute_minimum_eigenvalue(hamiltonian)

    assert result.eigenstate is not None
    likeliest = max(result.eigenstate, key=result.eigenstate.get)
    schedule = encoder.translate_result_state(likeliest)
    assert schedule.is_valid
    assert schedule.makespan == 2  # the exact optimum of the fixture

    table = diagonal_energy_table(hamiltonian)
    assert result.eigenvalue == pytest.approx(float(table.min()), abs=0.5)
    assert result.generations >= 1
    assert sum(result.circuit_evaluations) > 0
    assert result.best_individual is not None
    assert result.optimal_parameters == result.best_individual.parameter_values


def test_result_serialization_round_trip(jssp_hamiltonian):
    _, hamiltonian = jssp_hamiltonian
    solver = EVQEMinimumEigensolver(evqe_config(max_generations=2, termination_criterion=None))
    result = solver.compute_minimum_eigenvalue(hamiltonian)
    text = json.dumps(result, cls=EvolvingAnsatzMinimumEigensolverResultJSONEncoder)
    restored = json.loads(text, cls=EvolvingAnsatzMinimumEigensolverResultJSONDecoder)
    assert restored.eigenvalue == pytest.approx(result.eigenvalue)
    assert restored.best_individual == result.best_individual
    assert restored.generations == result.generations
    assert restored.circuit_evaluations == result.circuit_evaluations
    assert restored.eigenstate == result.eigenstate
    assert len(restored.population_evaluation_results) == len(result.population_evaluation_results)


def test_resume_from_population(jssp_hamiltonian):
    """The initial_population hook (capability the reference lacks)."""
    _, hamiltonian = jssp_hamiltonian
    first = EVQEMinimumEigensolver(evqe_config(max_generations=2, termination_criterion=None))
    result = first.compute_minimum_eigenvalue(hamiltonian)
    final_population = result.final_population_evaluation_result.population
    second = EVQEMinimumEigensolver(
        evqe_config(max_generations=1, termination_criterion=None, initial_population=final_population)
    )
    resumed = second.compute_minimum_eigenvalue(hamiltonian)
    assert resumed.eigenvalue <= result.eigenvalue + 1e-6


def test_aux_operators(jssp_hamiltonian):
    _, hamiltonian = jssp_hamiltonian
    from queasars_tpu.paulis import pauli_z_string

    aux = {"z0": pauli_z_string(0, hamiltonian.n_qubits)}
    solver = EVQEMinimumEigensolver(evqe_config(max_generations=2, termination_criterion=None))
    result = solver.compute_minimum_eigenvalue(hamiltonian, aux_operators=aux)
    assert set(result.aux_operators_evaluated.keys()) == {"z0"}
    assert -1.0 <= result.aux_operators_evaluated["z0"] <= 1.0
    assert EVQEMinimumEigensolver.supports_aux_operators()


def test_black_box_function_minimization():
    """compute_minimum_function_value path (reference: :278-329)."""
    objective = BitstringEvaluator(
        input_length=3, evaluation_function=lambda s: float(s.count("1"))
    )
    solver = EVQEMinimumEigensolver(
        evqe_config(max_generations=3, termination_criterion=None, population_size=6)
    )
    result = solver.compute_minimum_function_value(objective)
    # minimum of the objective is 0 (all zeros); EVQE should get close
    assert result.eigenvalue <= 1.0


def test_sampler_path_solve(jssp_hamiltonian):
    encoder, hamiltonian = jssp_hamiltonian
    solver = EVQEMinimumEigensolver(
        evqe_config(
            configured_estimator=None,
            configured_sampler=ConfiguredSampler(shots=4096, seed=1),
            max_generations=6,
            termination_criterion=None,
        )
    )
    result = solver.compute_minimum_eigenvalue(hamiltonian)
    likeliest = max(result.eigenstate, key=result.eigenstate.get)
    schedule = encoder.translate_result_state(likeliest)
    assert schedule.is_valid
