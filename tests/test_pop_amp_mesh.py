"""Round-3 amplitude-sharding capabilities.

- 2-D (pop, amp) mesh composition: population parallelism survives above
  one chip's qubit budget, and exact solve results are BIT-IDENTICAL
  across every (pop, amp) factorization of the same device set.
- Shard-local energy tables: no 2^n array is ever built on the host (or
  any single device) for the exact estimator paths.
- General (non-diagonal) Pauli sums under amplitude sharding.
- Initial states (arrays and EVQEIndividual circuits) under sharding.
- The sampler (finite-shot) path under sharding via the driver.
"""

import numpy as np
import pytest

import jax

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.individual import EVQEIndividual
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.paulis import PauliSum, pauli_z_string
from queasars_tpu.sim.evaluators import (
    SamplerExpectationEvaluator,
    StatevectorExpectationEvaluator,
)
from queasars_tpu.sim.sharded_evaluator import (
    AmplitudeShardedExpectationEvaluator,
    CircuitEvaluatorException,
    pop_amp_mesh,
)

FACTORIZATIONS = [(8, 1), (4, 2), (2, 4), (1, 8)]


def _population(n_qubits=10, pop=5, layers=2, seed=3):
    population = EVQEPopulation.random_population(n_qubits, layers, pop, True, random_seed=seed)
    return PackedPopulation.pack(list(population.individuals))


def _chain(n_qubits):
    return PauliSum.sum([pauli_z_string(q, n_qubits) * float(q + 1) for q in range(n_qubits)])


def _tfim(n_qubits, h=0.7):
    """Transverse-field Ising model: non-diagonal (X terms)."""
    from queasars_tpu.problems.spin_chains import transverse_field_ising

    return transverse_field_ising(n_qubits, coupling=1.0, field=h)


# ---------------------------------------------------------------------------
# (pop, amp) composition + factorization bit-identity
# ---------------------------------------------------------------------------


def test_exact_energies_bit_identical_across_factorizations():
    packed = _population(n_qubits=9, pop=10)
    operator = _chain(packed.n_qubits)
    results = []
    for n_pop, n_amp in FACTORIZATIONS:
        evaluator = AmplitudeShardedExpectationEvaluator(
            operator, mesh=pop_amp_mesh(n_pop, n_amp)
        )
        results.append(np.asarray(evaluator.evaluate_packed(packed)))
    for other in results[1:]:
        np.testing.assert_array_equal(results[0], other)
    # and they are the right values
    single = StatevectorExpectationEvaluator(operator)
    np.testing.assert_allclose(results[0], single.evaluate_packed(packed), atol=1e-5)


def test_device_nft_sweep_bit_identical_across_factorizations():
    from queasars_tpu.optim.nft import BatchedNFT, NFTConfig

    packed = _population(n_qubits=8, pop=6, layers=2, seed=6)
    operator = _chain(packed.n_qubits)
    coords = np.stack(
        [
            np.pad(
                packed.param_coordinates(i),
                ((0, int(packed.n_params.max()) - packed.n_params[i]), (0, 0)),
            )
            for i in range(packed.n_individuals)
        ]
    )
    active = np.ones(packed.n_individuals, bool)
    optimizer = BatchedNFT(NFTConfig(maxiter=8))
    outcomes = []
    for n_pop, n_amp in FACTORIZATIONS:
        evaluator = AmplitudeShardedExpectationEvaluator(
            operator, mesh=pop_amp_mesh(n_pop, n_amp)
        )
        angles, energies, _ = optimizer.minimize(
            evaluator, packed, coords, packed.n_params, active, seed=0
        )
        outcomes.append((np.asarray(angles), np.asarray(energies)))
    for angles, energies in outcomes[1:]:
        np.testing.assert_array_equal(outcomes[0][0], angles)
        np.testing.assert_array_equal(outcomes[0][1], energies)


def test_prefix_sweep_bit_identical_across_factorizations():
    """The rest-base prefix sweep: blanked-slot base simulation, the
    XOR-partner exchange (LOCAL bit-reverse and GLOBAL ppermute branches
    both exercised — at (1, 8) qubits 5-7 are device bits), and the
    fixed-block pair contractions must reproduce bit-identical
    trajectories for every (pop, amp) factorization."""
    from queasars_tpu.optim.nft import BatchedNFT, NFTConfig
    from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator

    packed = _population(n_qubits=8, pop=6, layers=3, seed=9)
    operator = _chain(packed.n_qubits)
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
    optimizer = BatchedNFT(NFTConfig(maxiter=8, cache_prefix=True))
    outcomes = []
    for n_pop, n_amp in FACTORIZATIONS:
        evaluator = AmplitudeShardedExpectationEvaluator(
            operator, mesh=pop_amp_mesh(n_pop, n_amp)
        )
        angles, energies, _ = optimizer.minimize(
            evaluator, packed, coords, n_free, active, seed=0, last_layer=last_layer
        )
        outcomes.append((np.asarray(angles), np.asarray(energies)))
    for angles, energies in outcomes[1:]:
        np.testing.assert_array_equal(outcomes[0][0], angles)
        np.testing.assert_array_equal(outcomes[0][1], energies)
    # and the outcome agrees with the single-chip engine through the
    # evaluator (probe energies are the same sums reordered, ~1e-6)
    single = StatevectorExpectationEvaluator(operator)
    np.testing.assert_allclose(
        np.asarray(single.evaluate_packed(packed, angles=outcomes[0][0])),
        outcomes[0][1],
        atol=2e-4,
    )


def test_full_solve_bit_identical_across_factorizations():
    """Whole EVQE solve trajectories (every generation's expectation
    values) are bit-identical for every (pop, amp) factorization — the
    amp analog of the pop-mesh device-count invariant
    (tests/test_mesh_solver.py)."""
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.parallel import population_mesh
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    def solve(amp_devices):
        config = EVQEMinimumEigensolverConfiguration(
            configured_estimator=ConfiguredEstimator(),
            configured_sampler=None,
            optimizer=BatchedNFT(NFTConfig(maxiter=4)),
            optimizer_n_circuit_evaluations=None,
            max_generations=2,
            max_circuit_evaluations=None,
            termination_criterion=None,
            random_seed=7,
            population_size=6,
            speciation_genetic_distance_threshold=2,
            selection_alpha_penalty=0.05,
            selection_beta_penalty=0.05,
            parameter_search_probability=0.4,
            topological_search_probability=0.4,
            layer_removal_probability=0.1,
            use_tournament_selection=True,
            tournament_size=2,
            mesh=population_mesh(8),
            shard_amplitudes=True,
            amp_devices=amp_devices,
        )
        result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(_chain(8))
        return [
            np.asarray(ev.expectation_values)
            for ev in result.population_evaluation_results
        ], result.eigenvalue

    trajectories = {amp: solve(amp) for amp in (1, 2, 4)}
    base_traj, base_eig = trajectories[1]
    for amp in (2, 4):
        traj, eig = trajectories[amp]
        assert eig == base_eig
        assert len(traj) == len(base_traj)
        for a, b in zip(traj, base_traj):
            np.testing.assert_array_equal(a, b)


def test_population_axis_actually_sharded():
    """Under a (4, 2) mesh the per-device population loop covers only the
    local block: the compiled energies program places population rows on
    distinct pop-axis device groups."""
    packed = _population(n_qubits=8, pop=8)
    operator = _chain(packed.n_qubits)
    mesh = pop_amp_mesh(4, 2)
    evaluator = AmplitudeShardedExpectationEvaluator(operator, mesh=mesh)
    assert evaluator.n_pop_devices == 4 and evaluator.n_amp_devices == 2
    out = evaluator.evaluate_packed(packed)
    assert out.shape == (8,)
    single = StatevectorExpectationEvaluator(operator)
    np.testing.assert_allclose(out, single.evaluate_packed(packed), atol=1e-5)


# ---------------------------------------------------------------------------
# shard-local tables (no host 2^n materialization)
# ---------------------------------------------------------------------------


def test_no_host_table_for_exact_estimator_path(monkeypatch):
    """The exact estimator path must never build the dense 2^n table on
    the host (round-2 weak spot: a dead full-table transfer)."""
    import queasars_tpu.sim.sharded_evaluator as se

    def boom(*args, **kwargs):
        raise AssertionError("host energy table must not be built on the exact path")

    monkeypatch.setattr(se, "diagonal_energy_table", boom)
    packed = _population(n_qubits=9, pop=3)
    operator = _chain(packed.n_qubits)
    evaluator = AmplitudeShardedExpectationEvaluator(operator, mesh=pop_amp_mesh(2, 4))
    assert not hasattr(evaluator, "_table_host")
    single = StatevectorExpectationEvaluator(operator)
    np.testing.assert_allclose(
        evaluator.evaluate_packed(packed), single.evaluate_packed(packed), atol=1e-5
    )


def test_26_qubit_construction_without_host_table(monkeypatch):
    """Construction + one exact evaluation at 26 qubits: the table lives
    only as shards inside the mesh (the host never holds 2^26 floats)."""
    import queasars_tpu.sim.sharded_evaluator as se

    def boom(*args, **kwargs):
        raise AssertionError("host energy table must not be built")

    monkeypatch.setattr(se, "diagonal_energy_table", boom)
    n_qubits = 26
    operator = PauliSum.sum(
        [pauli_z_string(q, n_qubits) for q in (0, n_qubits // 2, n_qubits - 1)]
    )
    evaluator = AmplitudeShardedExpectationEvaluator(operator, mesh=pop_amp_mesh(1, 8))
    # |0...0> circuit: all Z expectations are +1 -> energy = 3
    individual = EVQEIndividual.random_individual(n_qubits, 1, False, 0)
    packed = PackedPopulation.pack([individual])
    energies = evaluator.evaluate_packed(packed, angles=np.zeros_like(packed.angles))
    np.testing.assert_allclose(energies, [3.0], atol=1e-5)


def test_device_table_matches_host_table():
    from queasars_tpu.paulis.diagonal import diagonal_energy_table
    from queasars_tpu.sim.sharded_statevector import build_device_table
    from queasars_tpu.paulis.diagonal import diagonal_terms

    rng = np.random.default_rng(0)
    n = 10
    terms = [pauli_z_string(q, n) * float(rng.normal()) for q in range(n)]
    terms += [
        (pauli_z_string(1, n) @ pauli_z_string(5, n)) * 0.7,
        PauliSum.identity(n) * 2.5,
    ]
    op = PauliSum.sum(terms)
    host = diagonal_energy_table(op, dtype=np.float32)
    coeffs, z_masks = diagonal_terms(op)
    for n_pop, n_amp in [(1, 8), (4, 2)]:
        device = np.asarray(build_device_table(pop_amp_mesh(n_pop, n_amp), coeffs, z_masks, n))
        np.testing.assert_allclose(device, host, atol=1e-4)


def test_exact_cvar_no_host_table_and_no_ceiling(monkeypatch):
    """The exact shot-free CVaR path is fully distributed (round-3): no
    host energy table, no argsort of the 2^n spectrum, and construction
    past the old 26-qubit ceiling succeeds."""
    import queasars_tpu.sim.sharded_evaluator as se

    def boom(*args, **kwargs):
        raise AssertionError("host energy table must not be built for exact CVaR")

    monkeypatch.setattr(se, "diagonal_energy_table", boom)
    # past the old ceiling: construction must not raise or touch the host table
    big = PauliSum.sum([pauli_z_string(0, 28)])
    AmplitudeShardedExpectationEvaluator(big, mesh=pop_amp_mesh(1, 8), alpha=0.5)
    # value parity with the single-chip sorted-accumulation path
    packed = _population(n_qubits=9, pop=3)
    operator = _chain(packed.n_qubits)
    evaluator = AmplitudeShardedExpectationEvaluator(
        operator, mesh=pop_amp_mesh(2, 4), alpha=0.4
    )
    single = StatevectorExpectationEvaluator(operator, alpha=0.4)
    np.testing.assert_allclose(
        evaluator.evaluate_packed(packed), single.evaluate_packed(packed), atol=1e-5
    )


def test_exact_cvar_bit_identical_across_factorizations():
    """The distributed CVaR bisection reduces with the same fixed trees
    as the exact energies, so results are bitwise identical across every
    (pop, amp) factorization of the same devices."""
    packed = _population(n_qubits=8, pop=4, layers=2, seed=3)
    operator = _chain(packed.n_qubits)
    results = []
    for n_pop, n_amp in [(8, 1), (4, 2), (2, 4), (1, 8)]:
        evaluator = AmplitudeShardedExpectationEvaluator(
            operator, mesh=pop_amp_mesh(n_pop, n_amp), alpha=0.25
        )
        results.append(evaluator.evaluate_packed(packed))
    for other in results[1:]:
        np.testing.assert_array_equal(results[0], other)


# ---------------------------------------------------------------------------
# general (non-diagonal) Pauli sums
# ---------------------------------------------------------------------------


def test_general_hamiltonian_matches_single_chip():
    packed = _population(n_qubits=8, pop=5, layers=2, seed=2)
    operator = _tfim(packed.n_qubits)
    assert not operator.is_diagonal
    single = StatevectorExpectationEvaluator(operator)
    expected = single.evaluate_packed(packed)
    for n_pop, n_amp in [(1, 8), (4, 2), (2, 4)]:
        sharded = AmplitudeShardedExpectationEvaluator(
            operator, mesh=pop_amp_mesh(n_pop, n_amp)
        )
        np.testing.assert_allclose(
            sharded.evaluate_packed(packed), expected, atol=1e-5
        )


def test_general_bit_identical_across_factorizations():
    packed = _population(n_qubits=8, pop=4, layers=2, seed=9)
    operator = _tfim(packed.n_qubits, h=1.3)
    results = [
        np.asarray(
            AmplitudeShardedExpectationEvaluator(
                operator, mesh=pop_amp_mesh(n_pop, n_amp)
            ).evaluate_packed(packed)
        )
        for n_pop, n_amp in FACTORIZATIONS
    ]
    for other in results[1:]:
        np.testing.assert_array_equal(results[0], other)


def test_general_rejects_cvar():
    """Only the CVaR tail still needs a diagonal operator; finite shots
    run via the sharded QWC grouped sampler (below)."""
    operator = _tfim(8)
    with pytest.raises(CircuitEvaluatorException):
        AmplitudeShardedExpectationEvaluator(operator, mesh=pop_amp_mesh(1, 8), alpha=0.5)


def test_general_grouped_shots_match_exact():
    """Finite-shot general operators sample via sharded QWC measurement
    grouping: statistical agreement with the exact estimator, determinism
    per factorization (the diagonal shot path's contract,
    test_shots_deterministic_per_factorization)."""
    packed = _population(n_qubits=8, pop=4, layers=2, seed=6)
    operator = _tfim(packed.n_qubits)
    exact = np.asarray(StatevectorExpectationEvaluator(operator).evaluate_packed(packed))
    for n_pop, n_amp in [(4, 2), (1, 8)]:
        a = AmplitudeShardedExpectationEvaluator(
            operator, mesh=pop_amp_mesh(n_pop, n_amp), shots=8192, seed=5
        )
        b = AmplitudeShardedExpectationEvaluator(
            operator, mesh=pop_amp_mesh(n_pop, n_amp), shots=8192, seed=5
        )
        got = np.asarray(a.evaluate_packed(packed))
        np.testing.assert_array_equal(got, np.asarray(b.evaluate_packed(packed)))
        scale = float(np.abs(operator.coeffs).sum())
        np.testing.assert_allclose(got, exact, atol=0.05 * scale)


def test_general_grouped_shots_with_initial_state():
    """The grouped sharded sampler composes with an initial state: the
    base simulation re-enters the shard-local prepared state before the
    per-group basis rotations."""
    rng = np.random.default_rng(12)
    n = 6
    raw = rng.normal(size=2 * (1 << n)).astype(np.float32)
    raw /= np.sqrt((raw**2).sum())
    initial = raw.reshape(2, -1)
    packed = _population(n_qubits=n, pop=3, layers=1, seed=4)
    operator = _tfim(n)
    exact = np.asarray(
        StatevectorExpectationEvaluator(operator, initial_state=initial).evaluate_packed(packed)
    )
    sharded = AmplitudeShardedExpectationEvaluator(
        operator, mesh=pop_amp_mesh(2, 4), shots=8192, seed=2, initial_state=initial
    )
    scale = float(np.abs(operator.coeffs).sum())
    np.testing.assert_allclose(
        np.asarray(sharded.evaluate_packed(packed)), exact, atol=0.05 * scale
    )


def test_general_sampler_solve_through_driver():
    """A sampler-only solve on a non-diagonal operator runs the SHARDED
    engine when shard_amplitudes is requested (the reference rejects X/Y
    on the sampler path outright)."""
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.parallel import population_mesh
    from queasars_tpu.solver import (
        ConfiguredSampler,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    operator = _tfim(6)
    ground = float(np.linalg.eigvalsh(operator.to_dense_matrix())[0])
    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=None,
        configured_sampler=ConfiguredSampler(shots=2048, seed=3),
        optimizer=BatchedNFT(NFTConfig(maxiter=6, reset_interval=4)),
        optimizer_n_circuit_evaluations=None,
        max_generations=1,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=4,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.05,
        selection_beta_penalty=0.05,
        parameter_search_probability=0.4,
        topological_search_probability=0.5,
        layer_removal_probability=0.05,
        use_tournament_selection=True,
        tournament_size=2,
        mesh=population_mesh(8),
        shard_amplitudes=True,
        amp_devices=2,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(operator)
    scale = float(np.abs(operator.coeffs).sum())
    assert result.eigenvalue >= ground - 0.1 * scale
    assert np.isfinite(result.eigenvalue)


def test_general_solve_through_driver():
    """shard_amplitudes no longer raises for non-diagonal estimator
    solves (VERDICT r2 missing #2)."""
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.parallel import population_mesh
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=3)),
        optimizer_n_circuit_evaluations=None,
        max_generations=1,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=4,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.05,
        selection_beta_penalty=0.05,
        parameter_search_probability=0.3,
        topological_search_probability=0.3,
        layer_removal_probability=0.1,
        use_tournament_selection=True,
        tournament_size=2,
        mesh=population_mesh(8),
        shard_amplitudes=True,
        amp_devices=2,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(_tfim(6))
    assert np.isfinite(result.eigenvalue)
    assert result.generations == 1


# ---------------------------------------------------------------------------
# initial states under amplitude sharding
# ---------------------------------------------------------------------------


def test_initial_state_array_matches_single_chip():
    n_qubits = 7
    packed = _population(n_qubits=n_qubits, pop=4, layers=1, seed=5)
    operator = _chain(n_qubits)
    rng = np.random.default_rng(8)
    vec = rng.normal(size=1 << n_qubits) + 1j * rng.normal(size=1 << n_qubits)
    vec /= np.linalg.norm(vec)
    single = StatevectorExpectationEvaluator(operator, initial_state=vec)
    expected = single.evaluate_packed(packed)
    for n_pop, n_amp in [(1, 8), (4, 2)]:
        sharded = AmplitudeShardedExpectationEvaluator(
            operator, mesh=pop_amp_mesh(n_pop, n_amp), initial_state=vec
        )
        np.testing.assert_allclose(sharded.evaluate_packed(packed), expected, atol=1e-5)


def test_initial_state_individual_matches_single_chip():
    n_qubits = 7
    packed = _population(n_qubits=n_qubits, pop=3, layers=1, seed=4)
    operator = _chain(n_qubits)
    prep = EVQEIndividual.random_individual(n_qubits, 2, True, 11)
    single = StatevectorExpectationEvaluator(operator, initial_state=prep)
    expected = single.evaluate_packed(packed)
    sharded = AmplitudeShardedExpectationEvaluator(
        operator, mesh=pop_amp_mesh(2, 4), initial_state=prep
    )
    np.testing.assert_allclose(sharded.evaluate_packed(packed), expected, atol=1e-5)


def test_initial_state_device_nft_matches_single_chip():
    """The device NFT sweep honors the shared initial state (it folds
    into the layer-prefix simulation)."""
    from queasars_tpu.optim.nft import BatchedNFT, NFTConfig

    n_qubits = 6
    packed = _population(n_qubits=n_qubits, pop=4, layers=2, seed=12)
    operator = _chain(n_qubits)
    rng = np.random.default_rng(3)
    vec = rng.normal(size=1 << n_qubits) + 1j * rng.normal(size=1 << n_qubits)
    vec /= np.linalg.norm(vec)
    coords = np.stack(
        [
            np.pad(
                packed.param_coordinates(i),
                ((0, int(packed.n_params.max()) - packed.n_params[i]), (0, 0)),
            )
            for i in range(packed.n_individuals)
        ]
    )
    active = np.ones(packed.n_individuals, bool)
    optimizer = BatchedNFT(NFTConfig(maxiter=6))
    sharded = AmplitudeShardedExpectationEvaluator(
        operator, mesh=pop_amp_mesh(2, 4), initial_state=vec
    )
    angles_s, energies_s, _ = optimizer.minimize(
        sharded, packed, coords, packed.n_params, active, seed=0
    )
    single = StatevectorExpectationEvaluator(operator, initial_state=vec)
    # outcome check (angle branches may flip on flat coordinates): the
    # returned energies must be the true energies of the returned angles
    np.testing.assert_allclose(
        single.evaluate_packed(packed, angles=angles_s), energies_s, atol=2e-4
    )
    before = single.evaluate_packed(packed)
    assert energies_s.sum() < before.sum() + 1e-6


def test_driver_solve_with_initial_state_and_sharding():
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.parallel import population_mesh
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    n_qubits = 6
    prep = EVQEIndividual.random_individual(n_qubits, 1, True, 3)
    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=3)),
        optimizer_n_circuit_evaluations=None,
        max_generations=1,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=1,
        population_size=4,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.05,
        selection_beta_penalty=0.05,
        parameter_search_probability=0.3,
        topological_search_probability=0.3,
        layer_removal_probability=0.1,
        use_tournament_selection=True,
        tournament_size=2,
        mesh=population_mesh(8),
        shard_amplitudes=True,
        amp_devices=2,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue_with_initial_state(
        _chain(n_qubits), initial_state=prep
    )
    assert np.isfinite(result.eigenvalue)


# ---------------------------------------------------------------------------
# sampler path under amplitude sharding
# ---------------------------------------------------------------------------


def test_sampler_path_through_driver():
    """A sampler-only configuration may shard amplitudes (VERDICT r2
    missing #5): finite-shot distributed sampling drives the solve."""
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.parallel import population_mesh
    from queasars_tpu.solver import (
        ConfiguredSampler,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=None,
        configured_sampler=ConfiguredSampler(shots=128),
        optimizer=BatchedNFT(NFTConfig(maxiter=2)),
        optimizer_n_circuit_evaluations=None,
        max_generations=1,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=2,
        population_size=4,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.05,
        selection_beta_penalty=0.05,
        parameter_search_probability=0.3,
        topological_search_probability=0.3,
        layer_removal_probability=0.1,
        use_tournament_selection=True,
        tournament_size=2,
        mesh=population_mesh(8),
        shard_amplitudes=True,
        amp_devices=2,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(_chain(6))
    assert np.isfinite(result.eigenvalue)
    assert result.generations == 1


def test_shots_bit_identical_across_factorizations():
    """Round 4 (VERDICT r3 item 5): the blocked fixed-tree inverse-CDF
    (``sharded_statevector.blocked_shot_positions``) makes finite-shot
    sharded evaluation bit-identical across every (pop, amp)
    factorization — the shot draws and resolved states no longer depend
    on the shard width, matching the exact paths' invariant."""
    packed = _population(n_qubits=8, pop=3)
    operator = _chain(packed.n_qubits)
    plain, cvar = [], []
    for n_pop, n_amp in FACTORIZATIONS:
        evaluator = AmplitudeShardedExpectationEvaluator(
            operator, mesh=pop_amp_mesh(n_pop, n_amp), shots=256, seed=4
        )
        plain.append(np.asarray(evaluator.evaluate_packed(packed)))
        tail = AmplitudeShardedExpectationEvaluator(
            operator, mesh=pop_amp_mesh(n_pop, n_amp), shots=256, seed=4, alpha=0.5
        )
        cvar.append(np.asarray(tail.evaluate_packed(packed)))
    for other in plain[1:]:
        np.testing.assert_array_equal(plain[0], other)
    for other in cvar[1:]:
        np.testing.assert_array_equal(cvar[0], other)
    single = SamplerExpectationEvaluator(operator, shots=256, seed=4)
    np.testing.assert_allclose(plain[0], single.evaluate_packed(packed), atol=0.6)
    assert np.all(cvar[0] <= plain[0] + 1e-5)  # lower-tail mean never exceeds the mean


def test_grouped_shots_bit_identical_across_factorizations():
    """The QWC grouped (non-diagonal) sampler path shares the blocked
    inverse-CDF, so it carries the same cross-factorization invariant."""
    packed = _population(n_qubits=6, pop=3)
    operator = _tfim(packed.n_qubits)
    results = []
    for n_pop, n_amp in FACTORIZATIONS:
        evaluator = AmplitudeShardedExpectationEvaluator(
            operator, mesh=pop_amp_mesh(n_pop, n_amp), shots=512, seed=7
        )
        results.append(np.asarray(evaluator.evaluate_packed(packed)))
    for other in results[1:]:
        np.testing.assert_array_equal(results[0], other)
