"""Layer-prefix-cached NFT: correctness of the cached fast path.

When a sweep only optimizes each individual's last layer
(EVQELastLayerParameterSearch — the reference pipeline's first, always-on
stage, evqe.py:199-204), the state after the frozen prefix layers is
probe-independent; NFTConfig(cache_prefix=True) simulates it once and
re-enters every probe from the cached per-individual state.  These tests
pin the cached path against the full-circuit path.
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


def _problem(n_qubits: int = 5, pop: int = 6, layers: int = 3):
    population = EVQEPopulation.random_population(n_qubits, layers, pop, True, random_seed=11)
    packed = PackedPopulation.pack(list(population.individuals))
    real_layers = packed.layer_mask.sum(axis=1).astype(np.int32)
    last_layer = real_layers - 1
    coords_list = [
        packed.layer_param_coordinates(i, -1) for i in range(packed.n_individuals)
    ]
    k_max = max(c.shape[0] for c in coords_list)
    coords = np.zeros((packed.n_individuals, k_max, 3), np.int32)
    n_free = np.zeros(packed.n_individuals, np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
        n_free[i] = c.shape[0]
    active = n_free > 0
    return packed, coords, n_free, active, last_layer


def _run(evaluator, cache: bool, **problem):
    optimizer = BatchedNFT(NFTConfig(maxiter=12, cache_prefix=cache))
    return optimizer.minimize(
        evaluator,
        problem["packed"],
        problem["coords"],
        problem["n_free"],
        problem["active"],
        last_layer=problem["last_layer"],
        seed=3,
    )


def test_cached_matches_full_circuit_exact():
    packed, coords, n_free, active, last_layer = _problem()
    op = _diagonal_operator(packed.n_qubits)
    kwargs = dict(
        packed=packed, coords=coords, n_free=n_free, active=active, last_layer=last_layer
    )
    evaluator = StatevectorExpectationEvaluator(op)
    a_full, e_full, n_full = _run(evaluator, False, **kwargs)
    a_cached, e_cached, n_cached = _run(evaluator, True, **kwargs)
    assert n_full == n_cached
    np.testing.assert_allclose(e_cached, e_full, rtol=1e-4, atol=1e-5)
    # angles on degenerate (flat) coordinates may take different atan2
    # branches from ulp-level z differences — the pinned invariant is that
    # both angle sets give the same energies through the evaluator
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(kwargs["packed"], angles=a_cached)),
        np.asarray(evaluator.evaluate_packed(kwargs["packed"], angles=a_full)),
        rtol=1e-4, atol=1e-5,
    )


def test_cached_matches_full_circuit_cvar():
    packed, coords, n_free, active, last_layer = _problem()
    op = _diagonal_operator(packed.n_qubits)
    kwargs = dict(
        packed=packed, coords=coords, n_free=n_free, active=active, last_layer=last_layer
    )
    _, e_full, _ = _run(StatevectorExpectationEvaluator(op, alpha=0.5), False, **kwargs)
    _, e_cached, _ = _run(StatevectorExpectationEvaluator(op, alpha=0.5), True, **kwargs)
    np.testing.assert_allclose(e_cached, e_full, rtol=1e-4, atol=1e-5)


def test_cached_prefix_untouched_layers_preserved():
    """Angles outside the optimized last layer must come back unchanged."""
    packed, coords, n_free, active, last_layer = _problem()
    op = _diagonal_operator(packed.n_qubits)
    before = packed.angles.copy()
    a_cached, _, _ = _run(
        StatevectorExpectationEvaluator(op), True,
        packed=packed, coords=coords, n_free=n_free, active=active, last_layer=last_layer,
    )
    for i in range(packed.n_individuals):
        for l in range(packed.max_layers):
            if l != last_layer[i]:
                np.testing.assert_array_equal(a_cached[i, l], before[i, l])


def test_cached_sampler_path_runs_deterministically():
    packed, coords, n_free, active, last_layer = _problem()
    op = _diagonal_operator(packed.n_qubits)
    kwargs = dict(
        packed=packed, coords=coords, n_free=n_free, active=active, last_layer=last_layer
    )
    runs = [
        _run(SamplerExpectationEvaluator(op, shots=256, seed=5), True, **kwargs)
        for _ in range(2)
    ]
    np.testing.assert_array_equal(runs[0][0], runs[1][0])
    np.testing.assert_array_equal(runs[0][1], runs[1][1])
    assert np.isfinite(runs[0][1]).all()


def test_cached_with_shared_initial_state():
    """A shared initial-state vector folds into the cached prefix."""
    packed, coords, n_free, active, last_layer = _problem()
    op = _diagonal_operator(packed.n_qubits)
    rng = np.random.default_rng(0)
    vec = rng.normal(size=1 << packed.n_qubits) + 1j * rng.normal(size=1 << packed.n_qubits)
    vec /= np.linalg.norm(vec)
    kwargs = dict(
        packed=packed, coords=coords, n_free=n_free, active=active, last_layer=last_layer
    )
    _, e_full, _ = _run(StatevectorExpectationEvaluator(op, initial_state=vec), False, **kwargs)
    _, e_cached, _ = _run(StatevectorExpectationEvaluator(op, initial_state=vec), True, **kwargs)
    np.testing.assert_allclose(e_cached, e_full, rtol=1e-4, atol=1e-5)


def test_last_layer_search_operator_uses_cache():
    """EVQELastLayerParameterSearch end-to-end: cached and full-circuit
    optimizers land on (numerically) the same population."""
    from queasars_tpu.evolve.base import OperatorContext
    from queasars_tpu.evolve.mutation import EVQELastLayerParameterSearch

    op = _diagonal_operator(5)
    outs = []
    for cache in (False, True):
        population = EVQEPopulation.random_population(5, 2, 4, True, random_seed=23)
        operator = EVQELastLayerParameterSearch(
            mutation_probability=1.0,
            optimizer=BatchedNFT(NFTConfig(maxiter=8, cache_prefix=cache)),
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
    (pop_full, counts_full), (pop_cached, counts_cached) = outs
    assert counts_full == counts_cached
    evaluator = StatevectorExpectationEvaluator(op)
    e_full = evaluator.evaluate_individuals(list(pop_full.individuals))
    e_cached = evaluator.evaluate_individuals(list(pop_cached.individuals))
    for ind_f, ind_c in zip(pop_full.individuals, pop_cached.individuals):
        assert ind_f.layers == ind_c.layers
    np.testing.assert_allclose(e_cached, e_full, rtol=1e-4, atol=1e-4)


def test_solver_e2e_with_prefix_cache():
    """Full EVQE solve with the cached optimizer still finds the optimum."""
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
        parameter_search_probability=0.25,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
    )
    solver = EVQEMinimumEigensolver(config)
    result = solver.compute_minimum_eigenvalue(operator)
    table = diagonal_energy_table(operator)
    assert float(result.eigenvalue) == pytest.approx(float(table.min()), abs=0.3)


def test_spsa_prefix_cache():
    """Cached SPSA: deterministic, untouched layers preserved, improves."""
    from queasars_tpu.optim.spsa import BatchedSPSA, SPSAConfig

    packed, coords, n_free, active, last_layer = _problem()
    op = _diagonal_operator(packed.n_qubits)
    evaluator = StatevectorExpectationEvaluator(op)
    before = np.asarray(evaluator.evaluate_packed(packed))
    cfg = SPSAConfig(maxiter=25, calibration_steps=5, cache_prefix=True)

    def run():
        return BatchedSPSA(cfg).minimize(
            evaluator, packed, coords, n_free, active, last_layer=last_layer, seed=9
        )

    a1, e1, n1 = run()
    a2, e2, n2 = run()
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(e1, e2)
    assert n1 == n2 == 2 * 25 + 2 * 5
    assert e1.sum() < before.sum()
    for i in range(packed.n_individuals):
        for l in range(packed.max_layers):
            if l != last_layer[i]:
                np.testing.assert_array_equal(a1[i, l], packed.angles[i, l])


def test_amplitude_sharded_prefix_cache_matches_full_sweep():
    """The prefix-cached sharded device NFT sweep must match the
    full-circuit sharded sweep (same outcomes, tolerance for atan2
    branch flips on flat coordinates)."""
    from queasars_tpu.paulis import pauli_z_string
    from queasars_tpu.sim.sharded_evaluator import (
        AmplitudeShardedExpectationEvaluator,
        amplitude_mesh,
    )

    n_qubits = 8
    population = EVQEPopulation.random_population(n_qubits, 3, 4, True, random_seed=31)
    packed = PackedPopulation.pack(list(population.individuals))
    real_layers = packed.layer_mask.sum(axis=1).astype(np.int32)
    last_layer = real_layers - 1
    coords_list = [packed.layer_param_coordinates(i, -1) for i in range(packed.n_individuals)]
    k_max = max(c.shape[0] for c in coords_list)
    coords = np.zeros((packed.n_individuals, k_max, 3), np.int32)
    n_free = np.zeros(packed.n_individuals, np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
        n_free[i] = c.shape[0]
    active = n_free > 0
    operator = PauliSum.sum([pauli_z_string(q, n_qubits) for q in range(n_qubits)])

    def run(cache):
        evaluator = AmplitudeShardedExpectationEvaluator(operator, mesh=amplitude_mesh(8))
        optimizer = BatchedNFT(NFTConfig(maxiter=10, cache_prefix=cache))
        return optimizer.minimize(
            evaluator, packed, coords, n_free, active, seed=2, last_layer=last_layer
        )

    a_full, e_full, n_full = run(False)
    a_cached, e_cached, n_cached = run(True)
    assert n_full == n_cached
    np.testing.assert_allclose(e_cached, e_full, atol=2e-4)
    # untouched layers preserved
    for i in range(packed.n_individuals):
        for l in range(packed.max_layers):
            if l != last_layer[i]:
                np.testing.assert_array_equal(a_cached[i, l], packed.angles[i, l])
    # outcomes agree through an independent evaluator
    single = StatevectorExpectationEvaluator(operator)
    np.testing.assert_allclose(
        np.asarray(single.evaluate_packed(packed, angles=a_cached)),
        np.asarray(single.evaluate_packed(packed, angles=a_full)),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(single.evaluate_packed(packed, angles=a_cached)), e_cached, atol=2e-4
    )


def test_choose_prefix_engine_routing(monkeypatch):
    """The prefix engine chooser: slot kernel within its n=20 TPU cap,
    the folded MXU states kernel at n=21-22 (SPSA/gradient prefix caches
    previously launched an unsupported slot kernel there), jnp past the
    fold's ceiling or with the fold opted out."""
    from queasars_tpu.optim.prefix import choose_prefix_engine

    monkeypatch.delenv("QUEASARS_MXU", raising=False)
    assert choose_prefix_engine(False, 20, backend="tpu") == "jnp"
    assert choose_prefix_engine(True, 20, backend="tpu") == "pallas"
    assert choose_prefix_engine(True, 12, backend="cpu") == "pallas"
    assert choose_prefix_engine(True, 21, backend="tpu") == "fold"
    assert choose_prefix_engine(True, 22, backend="tpu") == "fold"
    assert choose_prefix_engine(True, 23, backend="tpu") == "jnp"
    monkeypatch.setenv("QUEASARS_MXU", "0")
    assert choose_prefix_engine(True, 21, backend="tpu") == "jnp"


def test_fold_prefix_states_match_engine():
    """simulate_prefix_states(mode="fold") — the folded MXU states kernel
    (interpreted on CPU) — must reproduce the jnp engine's prefix states."""
    from queasars_tpu.optim.prefix import simulate_prefix_states

    n_qubits = 8
    population = EVQEPopulation.random_population(n_qubits, 3, 3, True, random_seed=5)
    packed = PackedPopulation.pack(list(population.individuals))
    prefix_mask = np.logical_and(
        packed.layer_mask, np.arange(packed.max_layers)[None, :] < 2
    )
    got = np.asarray(
        simulate_prefix_states(
            packed.gate_types, packed.controls, packed.angles, prefix_mask,
            n_qubits, mode="fold",
        )
    )
    want = np.asarray(
        simulate_prefix_states(
            packed.gate_types, packed.controls, packed.angles, prefix_mask,
            n_qubits, mode="jnp",
        )
    )
    assert got.shape == want.shape == (packed.n_individuals, 2, 1 << n_qubits)
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_fold_prefix_mode_sweep_matches_jnp_prefix(monkeypatch):
    """A cached last-layer sweep whose prefix runs through the folded MXU
    states kernel (the n=21-22 TPU route, interpreted here) must reach the
    same outcome as the jnp-prefix sweep."""
    import queasars_tpu.optim.nft as nft_mod

    operator = _diagonal_operator(8, seed=3)
    problem = dict(zip(
        ("packed", "coords", "n_free", "active", "last_layer"),
        _problem(n_qubits=8, pop=3, layers=2),
    ))
    evaluator = StatevectorExpectationEvaluator(operator)
    optimizer = BatchedNFT(NFTConfig(maxiter=6, cache_prefix=True))

    def run():
        return optimizer.minimize(
            evaluator, problem["packed"], problem["coords"], problem["n_free"],
            problem["active"], seed=0, last_layer=problem["last_layer"],
        )

    a_jnp, e_jnp, _ = run()
    monkeypatch.setattr(nft_mod, "choose_prefix_engine", lambda *a, **k: "fold")
    a_fold, e_fold, _ = run()
    np.testing.assert_allclose(e_fold, e_jnp, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(problem["packed"], angles=a_fold)),
        np.asarray(evaluator.evaluate_packed(problem["packed"], angles=a_jnp)),
        atol=1e-4,
    )


def test_fold_prefix_mode_fused_slots_matches_jnp_prefix(monkeypatch):
    """The fused multi-slot sweep with folded-kernel prefixes (the
    n=21-22 TPU route, interpreted here) must match the jnp-prefix run."""
    import queasars_tpu.optim.nft as nft_mod

    operator = _diagonal_operator(8, seed=9)
    packed, coords, n_free, active, last_layer = _problem(n_qubits=8, pop=3, layers=2)
    evaluator = StatevectorExpectationEvaluator(operator)
    optimizer = BatchedNFT(NFTConfig(maxiter=4, cache_prefix=True))

    slot_args = (
        coords[:, None, :, :],
        n_free[:, None],
        active[:, None],
        last_layer[:, None].astype(np.int32),
    )

    jnp_result = optimizer.minimize_slots(evaluator, packed, *slot_args)
    assert jnp_result is not None
    monkeypatch.setattr(nft_mod, "choose_prefix_engine", lambda *a, **k: "fold")
    # the engine choice happens inside _nft_slots_scan's traced body (in
    # production it is constant per static signature); drop the cached
    # trace so the monkeypatched chooser is actually consulted
    nft_mod._nft_slots_scan.clear_cache()
    try:
        fold_result = optimizer.minimize_slots(evaluator, packed, *slot_args)
    finally:
        # drop the fold-prefix trace too, or later tests with the same
        # static signature would silently reuse it
        monkeypatch.undo()
        nft_mod._nft_slots_scan.clear_cache()
    assert fold_result is not None
    np.testing.assert_allclose(fold_result[1], jnp_result[1], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(packed, angles=fold_result[0])),
        np.asarray(evaluator.evaluate_packed(packed, angles=jnp_result[0])),
        atol=1e-4,
    )
