"""Fused multi-slot parameter search (BatchedNFT.minimize_slots).

EVQEParameterSearch optimizes each selected individual's layers one slot
at a time; the fused path runs ALL slots as one compiled device scan,
with every slot's probes re-entering from that slot's cached
layer-prefix state (probe work proportional to the suffix).  These tests
pin the fused program against the sequential per-slot loop it replaces.
"""

from __future__ import annotations

import numpy as np
import pytest

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim.nft import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum
from queasars_tpu.sim.evaluators import (
    SamplerExpectationEvaluator,
    StatevectorExpectationEvaluator,
)


def _diagonal_operator(n_qubits: int, seed: int = 7) -> PauliSum:
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(6):
        z = int(rng.integers(1, 1 << n_qubits))
        label = "".join("Z" if (z >> q) & 1 else "I" for q in range(n_qubits))[::-1]
        parts.append(PauliSum.from_label(label, float(rng.normal())))
    return PauliSum.sum(parts)


def _slot_problem(n_qubits: int = 5, pop: int = 6, layers: int = 3, seed: int = 11):
    """A multi-slot workload: every individual optimizes its layers in a
    seeded random order (the EVQEParameterSearch shape)."""
    population = EVQEPopulation.random_population(n_qubits, layers, pop, True, random_seed=seed)
    packed = PackedPopulation.pack(list(population.individuals))
    real_layers = packed.layer_mask.sum(axis=1).astype(np.int32)
    rng = np.random.default_rng(3)
    orders = [list(rng.permutation(real_layers[i])) for i in range(pop)]
    max_slots = max(len(o) for o in orders)
    k_max = max(
        packed.layer_param_coordinates(i, l).shape[0]
        for i in range(pop)
        for l in orders[i]
    )
    coords = np.zeros((pop, max_slots, k_max, 3), np.int32)
    n_free = np.zeros((pop, max_slots), np.int32)
    active = np.zeros((pop, max_slots), bool)
    slot_layers = np.full((pop, max_slots), packed.max_layers, np.int32)
    for i in range(pop):
        for s, layer in enumerate(orders[i]):
            c = packed.layer_param_coordinates(i, int(layer))
            coords[i, s, : c.shape[0]] = c
            n_free[i, s] = c.shape[0]
            active[i, s] = c.shape[0] > 0
            slot_layers[i, s] = layer
    seeds = np.arange(max_slots) * 17 + 5
    return packed, coords, n_free, active, slot_layers, seeds


def _sequential_reference(evaluator_factory, packed, coords, n_free, active, slot_layers, seeds, config):
    """The per-slot loop the fused scan replaces: one minimize per slot."""
    angles = packed.angles
    n_slots = n_free.shape[1]
    for s in range(n_slots):
        angles, energies, _ = BatchedNFT(config).minimize(
            evaluator_factory(), packed, coords[:, s], n_free[:, s], active[:, s],
            angles=angles, seed=int(seeds[s]),
        )
    return np.asarray(angles), np.asarray(energies)


def test_fused_matches_sequential_exact():
    packed, coords, n_free, active, slot_layers, seeds = _slot_problem()
    op = _diagonal_operator(packed.n_qubits)
    config = NFTConfig(maxiter=9, cache_prefix=True)
    a_seq, e_seq = _sequential_reference(
        lambda: StatevectorExpectationEvaluator(op),
        packed, coords, n_free, active, slot_layers, seeds,
        NFTConfig(maxiter=9, cache_prefix=False),
    )
    result = BatchedNFT(config).minimize_slots(
        StatevectorExpectationEvaluator(op), packed, coords, n_free, active,
        slot_layers, seeds=seeds,
    )
    assert result is not None
    a_fused, e_fused, nfev = result
    assert nfev == config.n_circuit_evaluations()
    evaluator = StatevectorExpectationEvaluator(op)
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(packed, angles=a_fused)),
        np.asarray(evaluator.evaluate_packed(packed, angles=a_seq)),
        rtol=1e-4, atol=1e-5,
    )
    # z0 estimates for mid-circuit slots carry the 3-point fit's CU3
    # half-harmonic approximation (see the sharded test below)
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(packed, angles=a_fused)), e_fused,
        atol=0.1,
    )


def test_fused_cvar_matches_sequential():
    packed, coords, n_free, active, slot_layers, seeds = _slot_problem()
    op = _diagonal_operator(packed.n_qubits)
    a_seq, _ = _sequential_reference(
        lambda: StatevectorExpectationEvaluator(op, alpha=0.5),
        packed, coords, n_free, active, slot_layers, seeds,
        NFTConfig(maxiter=7, cache_prefix=False),
    )
    result = BatchedNFT(NFTConfig(maxiter=7, cache_prefix=True)).minimize_slots(
        StatevectorExpectationEvaluator(op, alpha=0.5), packed, coords, n_free,
        active, slot_layers, seeds=seeds,
    )
    assert result is not None
    evaluator = StatevectorExpectationEvaluator(op, alpha=0.5)
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(packed, angles=result[0])),
        np.asarray(evaluator.evaluate_packed(packed, angles=a_seq)),
        rtol=1e-4, atol=1e-4,
    )


def test_fused_untouched_individuals_and_sitouts_preserved():
    """Unselected individuals and sat-out slots leave angles untouched."""
    packed, coords, n_free, active, slot_layers, seeds = _slot_problem()
    # deactivate individual 0 entirely
    active[0, :] = False
    n_free[0, :] = 0
    slot_layers[0, :] = packed.max_layers
    op = _diagonal_operator(packed.n_qubits)
    before = packed.angles.copy()
    result = BatchedNFT(NFTConfig(maxiter=6, cache_prefix=True)).minimize_slots(
        StatevectorExpectationEvaluator(op), packed, coords, n_free, active,
        slot_layers, seeds=seeds,
    )
    assert result is not None
    np.testing.assert_array_equal(result[0][0], before[0])


def test_fused_sampler_path_deterministic():
    packed, coords, n_free, active, slot_layers, seeds = _slot_problem()
    op = _diagonal_operator(packed.n_qubits)

    def run():
        return BatchedNFT(NFTConfig(maxiter=6, cache_prefix=True)).minimize_slots(
            SamplerExpectationEvaluator(op, shots=256, seed=5), packed, coords,
            n_free, active, slot_layers, seeds=seeds,
        )

    r1, r2 = run(), run()
    assert r1 is not None and r2 is not None
    np.testing.assert_array_equal(r1[0], r2[0])
    np.testing.assert_array_equal(r1[1], r2[1])
    assert np.isfinite(r1[1]).all()


def test_fused_disabled_resolutions():
    """cache_prefix=False (or None off the Pallas path) must decline."""
    packed, coords, n_free, active, slot_layers, seeds = _slot_problem()
    op = _diagonal_operator(packed.n_qubits)
    for cfg in (NFTConfig(cache_prefix=False), NFTConfig(cache_prefix=None)):
        assert (
            BatchedNFT(cfg).minimize_slots(
                StatevectorExpectationEvaluator(op), packed, coords, n_free,
                active, slot_layers, seeds=seeds,
            )
            is None
        )


def test_fused_mesh_matches_single_device():
    from queasars_tpu.parallel.mesh import population_mesh

    packed, coords, n_free, active, slot_layers, seeds = _slot_problem(pop=8)
    op = _diagonal_operator(packed.n_qubits)

    def run(mesh):
        evaluator = StatevectorExpectationEvaluator(op)
        if mesh is not None:
            evaluator.set_mesh(mesh)
        return BatchedNFT(NFTConfig(maxiter=6, cache_prefix=True)).minimize_slots(
            evaluator, packed, coords, n_free, active, slot_layers, seeds=seeds,
        )

    single = run(None)
    sharded = run(population_mesh(8))
    assert single is not None and sharded is not None
    np.testing.assert_array_equal(single[0], sharded[0])
    np.testing.assert_array_equal(single[1], sharded[1])


def test_parameter_search_operator_uses_fusion():
    """EVQEParameterSearch end-to-end: fused and loop paths agree on
    population energies, layer structures and the evaluation ledger."""
    from queasars_tpu.evolve.base import OperatorContext
    from queasars_tpu.evolve.mutation import EVQEParameterSearch

    op = _diagonal_operator(5)
    outs = []
    for cache in (False, True):
        population = EVQEPopulation.random_population(5, 3, 5, True, random_seed=23)
        operator = EVQEParameterSearch(
            mutation_probability=1.0,
            optimizer=BatchedNFT(NFTConfig(maxiter=6, cache_prefix=cache)),
            optimizer_n_circuit_evaluations=None,
            random_seed=17,
        )
        counts: list[int] = []
        context = OperatorContext(
            circuit_evaluator=StatevectorExpectationEvaluator(op),
            result_callback=lambda r: None,
            circuit_evaluation_count_callback=counts.append,
        )
        result = operator.apply_operator(population, context)
        outs.append((result, counts))
    (pop_loop, counts_loop), (pop_fused, counts_fused) = outs
    assert counts_loop == counts_fused
    evaluator = StatevectorExpectationEvaluator(op)
    for ind_l, ind_f in zip(pop_loop.individuals, pop_fused.individuals):
        assert ind_l.layers == ind_f.layers
    np.testing.assert_allclose(
        evaluator.evaluate_individuals(list(pop_fused.individuals)),
        evaluator.evaluate_individuals(list(pop_loop.individuals)),
        rtol=1e-4, atol=1e-4,
    )


def test_amplitude_sharded_fused_slots_match_single_chip():
    """The amplitude-sharded fused multi-slot sweep must agree with the
    sequential single-chip reference (same NFT math, prefix-split
    rounding tolerance)."""
    from queasars_tpu.sim.sharded_evaluator import (
        AmplitudeShardedExpectationEvaluator,
        amplitude_mesh,
    )

    packed, coords, n_free, active, slot_layers, seeds = _slot_problem(
        n_qubits=8, pop=4, layers=3, seed=31
    )
    op = _diagonal_operator(8)
    a_seq, _ = _sequential_reference(
        lambda: StatevectorExpectationEvaluator(op),
        packed, coords, n_free, active, slot_layers, seeds,
        NFTConfig(maxiter=8, cache_prefix=False),
    )
    sharded = AmplitudeShardedExpectationEvaluator(op, mesh=amplitude_mesh(8))
    result = BatchedNFT(NFTConfig(maxiter=8)).minimize_slots(
        sharded, packed, coords, n_free, active, slot_layers, seeds=seeds,
    )
    assert result is not None
    a_fused, e_fused, nfev = result
    assert nfev == NFTConfig(maxiter=8).n_circuit_evaluations()
    evaluator = StatevectorExpectationEvaluator(op)
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(packed, angles=a_fused)),
        np.asarray(evaluator.evaluate_packed(packed, angles=a_seq)),
        rtol=1e-4, atol=2e-4,
    )
    # the returned energies are the sweep's recycled z0 values: for
    # MID-circuit slots the suffix conjugates H into a non-diagonal
    # effective operator, so CU3-theta coordinates carry the 3-point
    # fit's half-harmonic approximation (shared with qiskit NFT and
    # hence the reference) — close, but not a fresh evaluation
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(packed, angles=a_fused)), e_fused,
        atol=0.1,
    )
    # CVaR configurations need the host-stepped path: decline
    cvar = AmplitudeShardedExpectationEvaluator(op, mesh=amplitude_mesh(8), alpha=0.5)
    assert (
        BatchedNFT(NFTConfig(maxiter=4)).minimize_slots(
            cvar, packed, coords, n_free, active, slot_layers, seeds=seeds,
        )
        is None
    )


def test_spsa_fused_matches_sequential():
    from queasars_tpu.optim.spsa import BatchedSPSA, SPSAConfig

    packed, coords, n_free, active, slot_layers, seeds = _slot_problem()
    op = _diagonal_operator(packed.n_qubits)

    def sequential():
        angles = packed.angles
        for s in range(n_free.shape[1]):
            angles, energies, _ = BatchedSPSA(
                SPSAConfig(maxiter=10, calibration_steps=4, cache_prefix=False)
            ).minimize(
                StatevectorExpectationEvaluator(op), packed, coords[:, s],
                n_free[:, s], active[:, s], angles=angles, seed=int(seeds[s]),
            )
        return np.asarray(angles)

    a_seq = sequential()
    cfg = SPSAConfig(maxiter=10, calibration_steps=4, cache_prefix=True)
    result = BatchedSPSA(cfg).minimize_slots(
        StatevectorExpectationEvaluator(op), packed, coords, n_free, active,
        slot_layers, seeds=seeds,
    )
    assert result is not None
    a_fused, e_fused, nfev = result
    assert nfev == cfg.n_circuit_evaluations()
    evaluator = StatevectorExpectationEvaluator(op)
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(packed, angles=a_fused)),
        np.asarray(evaluator.evaluate_packed(packed, angles=a_seq)),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(packed, angles=a_fused)), e_fused,
        rtol=1e-4, atol=1e-4,
    )


def test_spsa_fused_deterministic_and_declines_when_off():
    from queasars_tpu.optim.spsa import BatchedSPSA, SPSAConfig

    packed, coords, n_free, active, slot_layers, seeds = _slot_problem()
    op = _diagonal_operator(packed.n_qubits)

    def run():
        return BatchedSPSA(
            SPSAConfig(maxiter=6, calibration_steps=3, cache_prefix=True)
        ).minimize_slots(
            StatevectorExpectationEvaluator(op), packed, coords, n_free, active,
            slot_layers, seeds=seeds,
        )

    r1, r2 = run(), run()
    assert r1 is not None
    np.testing.assert_array_equal(r1[0], r2[0])
    assert (
        BatchedSPSA(SPSAConfig(cache_prefix=False)).minimize_slots(
            StatevectorExpectationEvaluator(op), packed, coords, n_free, active,
            slot_layers, seeds=seeds,
        )
        is None
    )


def test_spsa_parameter_search_operator_uses_fusion():
    """EVQEParameterSearch with BatchedSPSA: fused and loop paths agree."""
    from queasars_tpu.evolve.base import OperatorContext
    from queasars_tpu.evolve.mutation import EVQEParameterSearch
    from queasars_tpu.optim.spsa import BatchedSPSA, SPSAConfig

    op = _diagonal_operator(5)
    outs = []
    for cache in (False, True):
        population = EVQEPopulation.random_population(5, 3, 5, True, random_seed=23)
        operator = EVQEParameterSearch(
            mutation_probability=1.0,
            optimizer=BatchedSPSA(
                SPSAConfig(maxiter=8, calibration_steps=3, cache_prefix=cache)
            ),
            optimizer_n_circuit_evaluations=None,
            random_seed=17,
        )
        counts: list[int] = []
        context = OperatorContext(
            circuit_evaluator=StatevectorExpectationEvaluator(op),
            result_callback=lambda r: None,
            circuit_evaluation_count_callback=counts.append,
        )
        result = operator.apply_operator(population, context)
        outs.append((result, counts))
    (pop_loop, counts_loop), (pop_fused, counts_fused) = outs
    assert counts_loop == counts_fused
    evaluator = StatevectorExpectationEvaluator(op)
    np.testing.assert_allclose(
        evaluator.evaluate_individuals(list(pop_fused.individuals)),
        evaluator.evaluate_individuals(list(pop_loop.individuals)),
        rtol=1e-3, atol=1e-3,
    )


def test_solver_e2e_with_fused_slots():
    """Full EVQE solve with the fused optimizer still finds the optimum."""
    from queasars_tpu.paulis import diagonal_energy_table
    from queasars_tpu.problems.qubo import qubo_hamiltonian
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        ConfiguredSampler,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    operator, _ = qubo_hamiltonian(np.array([[-2.0, 1.5], [0.0, -3.0]]))
    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=1024, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=10, cache_prefix=True)),
        optimizer_n_circuit_evaluations=None,
        max_generations=4,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=2,
        population_size=6,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.05,
        selection_beta_penalty=0.05,
        parameter_search_probability=0.6,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
    )
    solver = EVQEMinimumEigensolver(config)
    result = solver.compute_minimum_eigenvalue(operator)
    table = diagonal_energy_table(operator)
    assert float(result.eigenvalue) == pytest.approx(float(table.min()), abs=0.3)
