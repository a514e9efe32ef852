"""QWC measurement grouping: sampler-path support for general Pauli sums.

The reference's sampler evaluator rejects X/Y operators
(evolving_ansatz_minimum_eigensolver.py:240-244); here they are measured
the way hardware would — partitioned into qubit-wise-commuting groups,
each rotated into its product basis and shot-sampled
(queasars_tpu/paulis/grouping.py + queasars_tpu/sim/grouped_sampling.py).

Tiers: partition structure -> rotated-basis exactness against the general
estimator -> shot convergence/determinism -> mesh bit-identity -> NFT and
full EVQE solve through the grouped objective.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from queasars_tpu.genome import (
    EVQECircuitLayer,
    EVQEIndividual,
    EVQEPopulation,
    RotationGate,
)
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.paulis import PauliSum
from queasars_tpu.paulis.grouping import (
    measurement_rotation_layer,
    pauli_label_coefficients,
    qwc_groups,
)
from queasars_tpu.sim.evaluators import (
    CircuitEvaluatorException,
    SamplerExpectationEvaluator,
    StatevectorExpectationEvaluator,
)
from queasars_tpu.sim.grouped_sampling import (
    grouped_exact_energies_from_states,
    grouped_operands,
)
from queasars_tpu.sim.statevector import simulate_circuits


def random_hermitian_pauli_sum(n: int, n_terms: int, seed: int) -> PauliSum:
    """Random real-coefficient Pauli sum (every Pauli string is Hermitian,
    so real label coefficients make the sum Hermitian) with X/Y/Z mixed."""
    rng = np.random.default_rng(seed)
    op = None
    for _ in range(n_terms):
        label = "".join(rng.choice(list("IXYZ")) for _ in range(n))
        term = PauliSum.from_label(label, float(rng.normal()))
        op = term if op is None else op + term
    return op


def rotation_individual(theta: float, n_qubits: int = 1) -> EVQEIndividual:
    layer = EVQECircuitLayer(
        n_qubits=n_qubits,
        gates=tuple(RotationGate(qubit_index=q) for q in range(n_qubits)),
    )
    params = []
    for _ in range(n_qubits):
        params.extend([theta, 0.0, 0.0])
    return EVQEIndividual(n_qubits=n_qubits, layers=(layer,), parameter_values=tuple(params))


def random_packed_population(n: int, size: int, seed: int) -> PackedPopulation:
    population = EVQEPopulation.random_population(n, 2, size, True, random_seed=seed)
    return PackedPopulation.pack(list(population.individuals))


def tfim(n: int) -> PauliSum:
    from queasars_tpu.problems.spin_chains import transverse_field_ising

    return transverse_field_ising(n, coupling=1.0, field=1.0)


# ---------------------------------------------------------------------------
# partition structure
# ---------------------------------------------------------------------------


def test_qwc_partition_covers_all_terms():
    op = random_hermitian_pauli_sum(5, 14, seed=0)
    const, groups = qwc_groups(op)
    support = op.z | op.x
    n_identity = int((~support.any(axis=1)).sum())
    grouped_terms = sum(g.diagonal.n_terms for g in groups)
    assert grouped_terms + n_identity == op.n_terms
    label = pauli_label_coefficients(op)
    assert const == pytest.approx(float(label[~support.any(axis=1)].sum()))
    for g in groups:
        # per-qubit bases never conflict within a group
        assert not (g.x_basis & g.y_basis).any()
        # the group's diagonal form is Z-strings over the original supports
        assert g.diagonal.is_diagonal
        assert not g.diagonal.x.any()


def test_qwc_groups_deterministic():
    op = random_hermitian_pauli_sum(4, 10, seed=3)
    _, groups_a = qwc_groups(op)
    _, groups_b = qwc_groups(op)
    assert len(groups_a) == len(groups_b)
    for a, b in zip(groups_a, groups_b):
        np.testing.assert_array_equal(a.x_basis, b.x_basis)
        np.testing.assert_array_equal(a.y_basis, b.y_basis)
        np.testing.assert_array_equal(a.diagonal.z, b.diagonal.z)


def test_non_hermitian_operator_rejected():
    op = PauliSum.from_label("X", 1.0j)
    with pytest.raises(ValueError, match="Hermitian"):
        pauli_label_coefficients(op)


def test_rotation_layer_maps_bases():
    op = PauliSum.from_label("YXZ")
    _, groups = qwc_groups(op)
    assert len(groups) == 1
    from queasars_tpu.sim.statevector import GATE_ID, GATE_ROT

    gate_types, angles = measurement_rotation_layer(groups[0], 3)
    # label "YXZ": qubit 0 = Z (no rotation), qubit 1 = X (H), qubit 2 = Y
    assert gate_types[0] == GATE_ID
    assert gate_types[1] == GATE_ROT and tuple(angles[1]) == pytest.approx((np.pi / 2, 0.0, np.pi))
    assert gate_types[2] == GATE_ROT and tuple(angles[2]) == pytest.approx(
        (np.pi / 2, 0.0, np.pi / 2)
    )


# ---------------------------------------------------------------------------
# rotated-basis exactness (infinite-shot contraction == general estimator)
# ---------------------------------------------------------------------------


def test_grouped_exact_single_qubit_analytic():
    # <psi|X|psi> for U3(theta,0,0)|0> = sin(theta); <psi|Y|psi> = 0
    for label, expected in (("X", np.sin), ("Y", lambda t: 0.0 * np.asarray(t))):
        op = PauliSum.from_label(label)
        rot_types, rot_angles, tables, const = grouped_operands(op)
        thetas = [0.0, 0.7, np.pi / 2, 2.2]
        packed = PackedPopulation.pack([rotation_individual(t) for t in thetas])
        states = simulate_circuits(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, 1
        )
        energies = grouped_exact_energies_from_states(
            states, rot_types, rot_angles, tables, const
        )
        np.testing.assert_allclose(np.asarray(energies), expected(thetas), atol=1e-6)


def test_grouped_exact_matches_general_estimator():
    op = random_hermitian_pauli_sum(4, 12, seed=1) + PauliSum.identity(4, 0.37)
    packed = random_packed_population(4, 6, seed=2)
    reference = StatevectorExpectationEvaluator(op).evaluate_packed(packed)

    rot_types, rot_angles, tables, const = grouped_operands(op)
    states = simulate_circuits(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, 4
    )
    energies = grouped_exact_energies_from_states(states, rot_types, rot_angles, tables, const)
    np.testing.assert_allclose(np.asarray(energies), reference, atol=1e-5)


# ---------------------------------------------------------------------------
# shot sampling through the evaluator
# ---------------------------------------------------------------------------


def test_sampler_evaluator_general_operator_converges():
    op = tfim(3)
    packed = random_packed_population(3, 4, seed=5)
    exact = StatevectorExpectationEvaluator(op).evaluate_packed(packed)
    sampler = SamplerExpectationEvaluator(op, shots=4096, seed=7)
    sampled = sampler.evaluate_packed(packed)
    scale = float(np.abs(op.coeffs).sum())
    np.testing.assert_allclose(sampled, exact, atol=0.12 * scale)

    # deterministic per seed, fresh shots per call
    sampler_b = SamplerExpectationEvaluator(op, shots=4096, seed=7)
    np.testing.assert_array_equal(sampler_b.evaluate_packed(packed), sampled)
    again = sampler_b.evaluate_packed(packed)
    assert not np.array_equal(again, sampled)


def test_sampler_cvar_nondiagonal_raises():
    with pytest.raises(CircuitEvaluatorException, match="CVaR"):
        SamplerExpectationEvaluator(tfim(3), shots=64, alpha=0.5)


def test_grouped_sampler_mesh_bit_identity():
    """Grouped shot energies are bit-identical whether the population is
    evaluated on one device or sharded over a mesh — per-individual keys
    plus per-group fold-ins make the stream sharding-independent."""
    from queasars_tpu.parallel import population_mesh

    op = random_hermitian_pauli_sum(3, 8, seed=9)
    packed = random_packed_population(3, 8, seed=11)

    outs = []
    for mesh in (None, population_mesh(8), population_mesh(2)):
        sampler = SamplerExpectationEvaluator(op, shots=256, seed=13)
        if mesh is not None:
            sampler.set_mesh(mesh)
        outs.append(np.asarray(sampler.evaluate_packed(packed)))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


# ---------------------------------------------------------------------------
# optimizer + solver integration
# ---------------------------------------------------------------------------


def test_nft_optimizes_through_grouped_sampler():
    from queasars_tpu.optim import BatchedNFT, NFTConfig

    op = tfim(3)
    evaluator = SamplerExpectationEvaluator(op, shots=2048, seed=1)
    packed = random_packed_population(3, 4, seed=17)
    coords = np.stack(
        [
            np.pad(
                packed.param_coordinates(i),
                ((0, int(packed.n_params.max()) - packed.n_params[i]), (0, 0)),
            )
            for i in range(4)
        ]
    )
    exact = StatevectorExpectationEvaluator(op)
    before = exact.evaluate_packed(packed)
    angles, _, _ = BatchedNFT(NFTConfig(maxiter=24, reset_interval=4)).minimize(
        evaluator, packed, coords, packed.n_params, np.ones(4, bool)
    )
    after = exact.evaluate_packed(packed, angles=angles)
    assert after.sum() < before.sum()


def test_full_evqe_solve_grouped_sampler():
    """End-to-end: sampler-only configuration against a non-diagonal
    Hamiltonian — the configuration the reference rejects outright."""
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.solver import (
        ConfiguredSampler,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    op = tfim(3)
    ground = float(np.linalg.eigvalsh(op.to_dense_matrix())[0])
    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=None,
        configured_sampler=ConfiguredSampler(shots=2048, seed=3),
        optimizer=BatchedNFT(NFTConfig(maxiter=10, reset_interval=4)),
        optimizer_n_circuit_evaluations=None,
        max_generations=2,
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
        use_tournament_selection=True,  # TFIM energies are negative
        tournament_size=2,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(op)
    # sampled energies carry shot noise; the variational bound holds to it
    scale = float(np.abs(op.coeffs).sum())
    assert result.eigenvalue >= ground - 0.1 * scale
    assert result.eigenvalue < 0.0


# ---------------------------------------------------------------------------
# proportional shot allocation
# ---------------------------------------------------------------------------


def test_allocate_shots_math():
    from queasars_tpu.sim.grouped_sampling import allocate_shots

    # proportional split with a guaranteed minimum of one per group
    assert allocate_shots([3.0, 1.0], 8) == (6, 2)
    assert sum(allocate_shots([5.0, 3.0, 2.0], 100)) == 100
    # the minimum: a tiny-weight group still gets one shot
    alloc = allocate_shots([1000.0, 1e-6], 10)
    assert alloc[1] >= 1 and sum(alloc) == 10
    # deterministic largest-remainder tie-break by group index
    assert allocate_shots([1.0, 1.0, 1.0], 4) == (2, 1, 1)
    with pytest.raises(ValueError):
        allocate_shots([1.0, 1.0, 1.0], 2)  # fewer shots than groups
    with pytest.raises(ValueError):
        allocate_shots([1.0, 0.0], 8)


def test_proportional_allocation_matches_exact():
    """Proportional allocation is a different (still unbiased) estimator:
    statistical agreement with the exact expectation, deterministic for a
    given seed, and the per-group budgets follow the L1 weights."""
    from queasars_tpu.sim.grouped_sampling import (
        allocate_shots,
        grouped_weights,
    )

    op = tfim(4)
    packed = random_packed_population(4, 3, seed=8)
    exact = np.asarray(StatevectorExpectationEvaluator(op).evaluate_packed(packed))

    total = 8192
    a = SamplerExpectationEvaluator(
        op, shots=total, seed=9, shot_allocation="proportional"
    )
    b = SamplerExpectationEvaluator(
        op, shots=total, seed=9, shot_allocation="proportional"
    )
    got = np.asarray(a.evaluate_packed(packed))
    np.testing.assert_array_equal(got, np.asarray(b.evaluate_packed(packed)))
    scale = float(np.abs(op.coeffs).sum())
    np.testing.assert_allclose(got, exact, atol=0.06 * scale)

    weights = grouped_weights(op)
    alloc = allocate_shots(weights, total)
    assert a._group_shots == alloc and sum(alloc) == total
    # heavier groups get more shots
    order = np.argsort(weights)
    assert alloc[order[-1]] >= alloc[order[0]]


def test_proportional_allocation_through_solver():
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.solver import (
        ConfiguredSampler,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    op = tfim(3)
    ground = float(np.linalg.eigvalsh(op.to_dense_matrix())[0])
    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=None,
        configured_sampler=ConfiguredSampler(
            shots=4096, seed=3, shot_allocation="proportional"
        ),
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
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(op)
    scale = float(np.abs(op.coeffs).sum())
    assert result.eigenvalue >= ground - 0.1 * scale


def test_proportional_allocation_sharded():
    """The sharded grouped sampler honors the same allocation (unrolled
    per-group loop with static shot counts)."""
    from queasars_tpu.sim.sharded_evaluator import (
        AmplitudeShardedExpectationEvaluator,
        pop_amp_mesh,
    )

    op = tfim(4)
    packed = random_packed_population(4, 3, seed=8)
    exact = np.asarray(StatevectorExpectationEvaluator(op).evaluate_packed(packed))
    ev = AmplitudeShardedExpectationEvaluator(
        op, mesh=pop_amp_mesh(2, 4), shots=8192, seed=9,
        shot_allocation="proportional",
    )
    got = np.asarray(ev.evaluate_packed(packed))
    scale = float(np.abs(op.coeffs).sum())
    np.testing.assert_allclose(got, exact, atol=0.06 * scale)
    assert ev._group_shots is not None and sum(ev._group_shots) == 8192


# ---------------------------------------------------------------------------
# fused-kernel (Pallas) grouped sampling
# ---------------------------------------------------------------------------


def test_grouped_pallas_matches_jnp_stream():
    """The fused per-group kernel launches draw the same per-group
    uniforms as the jnp grouped path (same fold-in scheme), so energies
    agree up to CDF-rounding boundary flips (a single shot's table gap /
    shots each).  Pallas interpreter; n=14 is the in-kernel sampler's
    minimum."""
    import jax

    from queasars_tpu.sim.grouped_sampling import (
        grouped_energies_from_states,
        grouped_operands,
        grouped_shot_energies_pallas,
    )

    n, shots = 14, 512
    op = tfim(n)
    packed = random_packed_population(n, 2, seed=5)
    operands = grouped_operands(op)
    keys = jnp.asarray(jax.random.split(jax.random.PRNGKey(3), packed.n_individuals))

    kernel = np.asarray(
        grouped_shot_energies_pallas(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            keys, *operands, n_qubits=n, shots=shots, use_mxu=False, interpret=True,
        )
    )
    states = simulate_circuits(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
    )
    ref = np.asarray(
        grouped_energies_from_states(states, keys, *operands, shots=shots)
    )
    scale = float(np.abs(op.coeffs).sum())
    np.testing.assert_allclose(kernel, ref, atol=0.02 * scale)

    # exactness against the statevector expectation within shot noise
    exact = np.asarray(StatevectorExpectationEvaluator(op).evaluate_packed(packed))
    np.testing.assert_allclose(kernel, exact, atol=0.15 * scale)


def test_grouped_pallas_per_group_allocation():
    """Tuple (proportional) shot budgets unroll per group in the kernel
    route too."""
    import jax

    from queasars_tpu.sim.grouped_sampling import (
        allocate_shots,
        grouped_operands,
        grouped_shot_energies_pallas,
        grouped_weights,
    )

    n = 14
    op = tfim(n)
    packed = random_packed_population(n, 2, seed=6)
    operands = grouped_operands(op)
    alloc = allocate_shots(grouped_weights(op), 1024)
    keys = jnp.asarray(jax.random.split(jax.random.PRNGKey(4), packed.n_individuals))
    got = np.asarray(
        grouped_shot_energies_pallas(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            keys, *operands, n_qubits=n, shots=alloc, use_mxu=False, interpret=True,
        )
    )
    exact = np.asarray(StatevectorExpectationEvaluator(op).evaluate_packed(packed))
    scale = float(np.abs(op.coeffs).sum())
    np.testing.assert_allclose(got, exact, atol=0.2 * scale)


def test_one_launch_grouped_fold_matches_per_group_route():
    """The one-launch multi-group kernel (simulate once, rotate + sample
    every group in VMEM) is bit-identical to the per-group extended-fold
    launches: the op sequence per group is the same (base kron layers +
    diag passes, rotation kron layer, sampler) and the uniforms share
    the fold-in scheme.  Pallas interpreter at the sampler's n=14
    minimum (round 4, VERDICT r3 item 6)."""
    import jax

    from queasars_tpu.sim.fold_pipeline import (
        build_fold_pipeline,
        extend_fold_pipeline_with_rotation,
        rotation_layer_factors,
    )
    from queasars_tpu.sim.grouped_sampling import grouped_operands
    from queasars_tpu.sim.pallas_fold_kernels import (
        grouped_fold_supported,
        pallas_grouped_shot_energies_folded,
        pallas_sampled_shot_energies_folded,
    )

    n, shots = 14, 128
    op = tfim(n)
    packed = random_packed_population(n, 2, seed=9)
    rot_types, rot_angles, tables, const = grouped_operands(op)
    n_groups = int(tables.shape[0])
    assert grouped_fold_supported(n, "tpu", n_groups)
    keys = jnp.asarray(jax.random.split(jax.random.PRNGKey(4), packed.n_individuals))

    base = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
        n, absorb_diag=True,
    )
    rot_factors, rot_active = rotation_layer_factors(rot_types, rot_angles, n)
    g_all_keys = jax.vmap(
        lambda k: jnp.stack([jax.random.fold_in(k, g) for g in range(n_groups)])
    )(keys)
    frac = jax.vmap(
        jax.vmap(lambda k: jax.random.uniform(k, (shots,), jnp.float32))
    )(g_all_keys)

    fused = pallas_grouped_shot_energies_folded(
        base, rot_factors, rot_active, tables, frac, n, shots,
        precision="default", interpret=True,
    )  # tuple of [P, shots]

    for g in range(n_groups):
        extended = extend_fold_pipeline_with_rotation(
            base, rot_types[g], rot_angles[g], n
        )
        per_group = np.asarray(
            pallas_sampled_shot_energies_folded(
                extended, tables[g], frac[:, g], n, shots,
                precision="default", interpret=True,
            )
        )
        np.testing.assert_array_equal(np.asarray(fused[g]), per_group)

    # the round-5 batched-epilogue kernel (staged probability planes,
    # detached epilogues) must be bit-identical to the sequential
    # in-place kernel — both routes forced explicitly
    sequential = pallas_grouped_shot_energies_folded(
        base, rot_factors, rot_active, tables, frac, n, shots,
        precision="default", interpret=True, batched=False,
    )
    batched = pallas_grouped_shot_energies_folded(
        base, rot_factors, rot_active, tables, frac, n, shots,
        precision="default", interpret=True, batched=True,
    )
    for g in range(n_groups):
        np.testing.assert_array_equal(np.asarray(batched[g]), np.asarray(sequential[g]))

    # with an initial state (the optimizer prefix-cache shape) the init
    # planes ride ANY (HBM) and DMA into the kernels' scratch; the
    # one-launch and per-group routes must still agree bit-for-bit
    rng = np.random.default_rng(41)
    raw = rng.normal(size=(packed.n_individuals, 2, 1 << n)).astype(np.float32)
    initial = jnp.asarray(raw / np.sqrt((raw**2).sum(axis=(1, 2), keepdims=True)))
    fused_init = pallas_grouped_shot_energies_folded(
        base, rot_factors, rot_active, tables, frac, n, shots,
        precision="default", interpret=True, initial=initial,
    )
    for g in range(n_groups):
        extended = extend_fold_pipeline_with_rotation(
            base, rot_types[g], rot_angles[g], n
        )
        per_group = np.asarray(
            pallas_sampled_shot_energies_folded(
                extended, tables[g], frac[:, g], n, shots,
                precision="default", interpret=True, initial=initial,
            )
        )
        np.testing.assert_array_equal(np.asarray(fused_init[g]), per_group)


def test_one_launch_route_engaged_through_public_entry():
    """grouped_shot_energies_pallas auto-selects the one-launch kernel
    for uniform shot budgets and matches the jnp stream within shot
    noise (it draws the same uniforms)."""
    import jax

    from queasars_tpu.sim.grouped_sampling import (
        grouped_energies_from_states,
        grouped_operands,
        grouped_shot_energies_pallas,
    )

    n, shots = 14, 256
    op = tfim(n)
    packed = random_packed_population(n, 2, seed=6)
    operands = grouped_operands(op)
    keys = jnp.asarray(jax.random.split(jax.random.PRNGKey(8), packed.n_individuals))

    fused = np.asarray(
        grouped_shot_energies_pallas(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            keys, *operands, n_qubits=n, shots=shots, use_mxu=True, interpret=True,
        )
    )
    states = simulate_circuits(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
    )
    ref = np.asarray(grouped_energies_from_states(states, keys, *operands, shots=shots))
    scale = float(np.abs(op.coeffs).sum())
    np.testing.assert_allclose(fused, ref, atol=0.05 * scale)
