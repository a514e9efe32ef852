"""Selection reuse of the parameter search's exact final energies.

On the exact diagonal estimator path the NFT sweep's final recycled
value is the exact energy at each individual's final angles, so the
selection step that follows (only genome-preserving speciation runs in
between) can skip its evaluation dispatch
(`PopulationEnergyCache` / `reuse_selection_energies`).
"""

from __future__ import annotations

import numpy as np
import pytest

from queasars_tpu.evolve.base import OperatorContext, PopulationEnergyCache
from queasars_tpu.evolve.mutation import EVQELastLayerParameterSearch
from queasars_tpu.evolve.selection import EVQESelection
from queasars_tpu.evolve.speciation import EVQESpeciation
from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.optim.nft import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum
from queasars_tpu.sim.evaluators import (
    SamplerExpectationEvaluator,
    StatevectorExpectationEvaluator,
)


def _operator(n_qubits: int = 5, seed: int = 7) -> PauliSum:
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(6):
        z = int(rng.integers(1, 1 << n_qubits))
        label = "".join("Z" if (z >> q) & 1 else "I" for q in range(n_qubits))[::-1]
        parts.append(PauliSum.from_label(label, float(rng.normal())))
    return PauliSum.sum(parts)


def test_cache_key_semantics():
    population = EVQEPopulation.random_population(4, 2, 3, True, random_seed=1)
    individuals = list(population.individuals)
    cache = PopulationEnergyCache()
    assert cache.consume(individuals) is None  # empty

    cache.publish(individuals, [1.0, 2.0, 3.0])
    assert cache.consume(individuals) == [1.0, 2.0, 3.0]
    assert cache.consume(individuals) is None  # consumed = cleared

    cache.publish(individuals, [1.0, 2.0, 3.0])
    other = EVQEPopulation.random_population(4, 2, 3, True, random_seed=2)
    assert cache.consume(list(other.individuals)) is None  # key mismatch
    assert cache.consume(individuals) is None  # miss also cleared


def test_publishes_exact_energies_resolution():
    op = _operator()
    assert BatchedNFT(NFTConfig()).publishes_exact_energies(
        StatevectorExpectationEvaluator(op)
    )
    # CVaR tail, shots, precision noise and the five-point fit are not
    # exact final values
    assert not BatchedNFT(NFTConfig()).publishes_exact_energies(
        StatevectorExpectationEvaluator(op, alpha=0.5)
    )
    assert not BatchedNFT(NFTConfig()).publishes_exact_energies(
        SamplerExpectationEvaluator(op, shots=128, seed=0)
    )
    assert not BatchedNFT(NFTConfig()).publishes_exact_energies(
        StatevectorExpectationEvaluator(op, precision=0.01, seed=0)
    )
    assert not BatchedNFT(NFTConfig(five_point=True)).publishes_exact_energies(
        StatevectorExpectationEvaluator(op)
    )


def _count_dispatches(evaluator):
    """Count evaluate_packed dispatches on the instance (the evaluator
    must keep its class: the optimizer operand extraction dispatches on
    isinstance)."""
    calls = {"n": 0}
    original = evaluator.evaluate_packed

    def counted(*args, **kwargs):
        calls["n"] += 1
        return original(*args, **kwargs)

    evaluator.evaluate_packed = counted
    return calls


def _pipeline_context(evaluator, cache):
    results = []
    return (
        OperatorContext(
            circuit_evaluator=evaluator,
            result_callback=results.append,
            circuit_evaluation_count_callback=lambda n: None,
            energy_cache=cache,
        ),
        results,
    )


def test_selection_skips_dispatch_and_matches_fresh_evaluation():
    op = _operator()
    evaluator = StatevectorExpectationEvaluator(op)
    calls = _count_dispatches(evaluator)
    cache = PopulationEnergyCache()
    context, results = _pipeline_context(evaluator, cache)

    population = EVQEPopulation.random_population(5, 2, 4, True, random_seed=11)
    search = EVQELastLayerParameterSearch(
        mutation_probability=1.0,
        optimizer=BatchedNFT(NFTConfig(maxiter=8)),
        optimizer_n_circuit_evaluations=None,
        random_seed=3,
    )
    population = search.apply_operator(population, context)
    assert cache.energies is not None  # published

    population = EVQESpeciation(genetic_distance_threshold=2, random_seed=5).apply_operator(
        population, context
    )
    assert cache.energies is not None  # speciation preserves genomes

    calls_before = calls["n"]
    selection = EVQESelection(
        alpha_penalty=0.1, beta_penalty=0.1,
        use_tournament_selection=True, tournament_size=2, random_seed=7,
    )
    selection.apply_operator(population, context)
    assert calls["n"] == calls_before  # no dispatch: cache consumed
    assert cache.energies is None

    # the reported energies equal a fresh evaluation to float rounding
    reported = np.asarray(results[-1].expectation_values, dtype=np.float64)
    fresh = np.asarray(
        StatevectorExpectationEvaluator(op).evaluate_individuals(
            list(results[-1].population.individuals)
        ),
        dtype=np.float64,
    )
    np.testing.assert_allclose(reported, fresh, rtol=1e-4, atol=1e-5)


def test_selection_falls_back_without_cache_match():
    """A genome change between publish and selection misses the cache."""
    from queasars_tpu.evolve.mutation import EVQETopologicalSearch

    op = _operator()
    evaluator = StatevectorExpectationEvaluator(op)
    calls = _count_dispatches(evaluator)
    cache = PopulationEnergyCache()
    context, _ = _pipeline_context(evaluator, cache)

    population = EVQEPopulation.random_population(5, 2, 4, True, random_seed=11)
    search = EVQELastLayerParameterSearch(
        mutation_probability=1.0,
        optimizer=BatchedNFT(NFTConfig(maxiter=6)),
        optimizer_n_circuit_evaluations=None,
        random_seed=3,
    )
    population = search.apply_operator(population, context)
    # a structural mutation invalidates the published energies
    population = EVQETopologicalSearch(
        mutation_probability=1.0, random_seed=9
    ).apply_operator(population, context)
    population = EVQESpeciation(genetic_distance_threshold=2, random_seed=5).apply_operator(
        population, context
    )
    calls_before = calls["n"]
    EVQESelection(
        alpha_penalty=0.1, beta_penalty=0.1,
        use_tournament_selection=True, tournament_size=2, random_seed=7,
    ).apply_operator(population, context)
    assert calls["n"] == calls_before + 1  # evaluated for real


def test_solver_e2e_reuse_matches_fresh():
    """Full solves with and without reuse agree (tournament selection —
    comparisons only flip on exact ties, which genome duplicates keep
    stable) and keep identical evaluation ledgers."""
    from queasars_tpu.paulis import diagonal_energy_table
    from queasars_tpu.problems.qubo import qubo_hamiltonian
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        ConfiguredSampler,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    operator, _ = qubo_hamiltonian(np.array([[-2.0, 1.5], [0.0, -3.0]]))

    def solve(reuse):
        config = EVQEMinimumEigensolverConfiguration(
            configured_estimator=ConfiguredEstimator(),
            configured_sampler=ConfiguredSampler(shots=1024, seed=0),
            optimizer=BatchedNFT(NFTConfig(maxiter=10)),
            optimizer_n_circuit_evaluations=None,
            max_generations=4,
            max_circuit_evaluations=None,
            termination_criterion=None,
            random_seed=2,
            population_size=6,
            speciation_genetic_distance_threshold=2,
            selection_alpha_penalty=0.05,
            selection_beta_penalty=0.05,
            parameter_search_probability=0.25,
            topological_search_probability=0.4,
            layer_removal_probability=0.05,
            use_tournament_selection=True,
            tournament_size=2,
            reuse_selection_energies=reuse,
        )
        return EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(operator)

    fresh = solve(False)
    reused = solve(True)
    assert fresh.generations == reused.generations
    assert list(fresh.circuit_evaluations) == list(reused.circuit_evaluations)
    assert float(reused.eigenvalue) == pytest.approx(float(fresh.eigenvalue), abs=1e-3)
    table = diagonal_energy_table(operator)
    assert float(reused.eigenvalue) == pytest.approx(float(table.min()), abs=0.3)
