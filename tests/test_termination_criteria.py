"""Unit tests for the five termination criteria and solver budget
enforcement (reference: base/termination_criteria.py semantics and the
driver's pre-operator budget checks)."""

import numpy as np
import pytest

from queasars_tpu.evolve.base import BasePopulationEvaluationResult
from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.solver import (
    BestIndividualChangeTolerance,
    BestIndividualExpectationValueThreshold,
    BestIndividualRelativeChangeTolerance,
    PopulationChangeRelativeTolerance,
    PopulationChangeTolerance,
)


def make_result(values):
    population = EVQEPopulation.random_population(3, 1, len(values), False, random_seed=0)
    best = int(np.argmin(values))
    return BasePopulationEvaluationResult(
        population=population,
        expectation_values=tuple(values),
        best_individual=population.individuals[best],
        best_expectation_value=float(values[best]),
    )


def check(criterion, value_lists):
    outcomes = []
    for values in value_lists:
        result = make_result(values)
        outcomes.append(
            criterion.check_termination(result, result.best_individual, result.best_expectation_value)
        )
    return outcomes


def test_best_individual_change_tolerance():
    criterion = BestIndividualChangeTolerance(minimum_change=0.1)
    outcomes = check(criterion, [[10.0], [9.0], [8.99]])
    assert outcomes == [False, False, True]
    # reset allows reuse
    criterion.reset_state()
    assert check(criterion, [[5.0], [1.0]]) == [False, False]
    with pytest.raises(ValueError):
        BestIndividualChangeTolerance(minimum_change=0.0)
    with pytest.raises(ValueError):
        BestIndividualChangeTolerance(minimum_change=0.1, allowed_consecutive_violations=-1)


def test_best_individual_change_violation_window():
    criterion = BestIndividualChangeTolerance(minimum_change=0.1, allowed_consecutive_violations=1)
    # needs two consecutive below-threshold changes
    outcomes = check(criterion, [[10.0], [9.99], [9.985], [9.98]])
    assert outcomes == [False, False, True, True]


def test_best_individual_relative_change_tolerance():
    criterion = BestIndividualRelativeChangeTolerance(minimum_relative_change=0.01)
    outcomes = check(criterion, [[100.0], [90.0], [89.5]])
    assert outcomes == [False, False, True]
    with pytest.raises(ValueError):
        BestIndividualRelativeChangeTolerance(minimum_relative_change=1.5)


def test_expectation_threshold():
    criterion = BestIndividualExpectationValueThreshold(expectation_threshold=5.0)
    assert check(criterion, [[7.0]]) == [False]
    assert check(criterion, [[4.0]]) == [True]
    criterion.reset_state()  # no-op, must not raise


def test_population_change_tolerance():
    criterion = PopulationChangeTolerance(minimum_change=0.5, allowed_consecutive_violations=0)
    # identical consecutive populations -> Hausdorff 0 and best-change 0
    outcomes = check(criterion, [[3.0, 4.0, 5.0], [3.0, 4.0, 5.0]])
    assert outcomes == [False, True]
    criterion.reset_state()
    # populations that keep moving don't terminate
    outcomes = check(criterion, [[3.0, 4.0], [1.0, 2.0], [-1.0, 0.0]])
    assert outcomes == [False, False, False]
    with pytest.raises(ValueError):
        PopulationChangeTolerance(minimum_change=0.5, allowed_consecutive_violations=-1)


def test_population_change_relative_tolerance():
    criterion = PopulationChangeRelativeTolerance(
        minimum_relative_change=0.01, allowed_consecutive_violations=0
    )
    outcomes = check(criterion, [[100.0, 110.0], [100.0, 110.0]])
    assert outcomes == [False, True]


def test_driver_budget_enforcement():
    """max_circuit_evaluations stops the solve early, counting the
    operators' pre-estimates (reference driver :405-428)."""
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.paulis import pauli_z_string
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        ConfiguredSampler,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=256, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=10)),
        optimizer_n_circuit_evaluations=21,
        max_generations=None,
        max_circuit_evaluations=500,
        termination_criterion=None,
        random_seed=0,
        population_size=6,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.2,
        topological_search_probability=0.3,
        layer_removal_probability=0.05,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(pauli_z_string(0, 3))
    total = sum(result.circuit_evaluations)
    # the budget may be slightly overshot within an operator application
    # but the loop must stop promptly after crossing it
    assert total < 500 + 6 * 21 + 6
    assert result.generations >= 1


def test_driver_max_generations_exact():
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.paulis import pauli_z_string
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        ConfiguredSampler,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=256, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=5)),
        optimizer_n_circuit_evaluations=None,
        max_generations=3,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=1,
        population_size=4,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.2,
        topological_search_probability=0.3,
        layer_removal_probability=0.05,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(pauli_z_string(0, 3))
    assert result.generations == 3
    assert len(result.population_evaluation_results) == 3
