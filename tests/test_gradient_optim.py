"""Batched gradient-descent (Adam/SGD) optimizer tests.

Beyond-reference optimizer family (the reference's surface is the
gradient-free qiskit-algorithms trio, mutation.py:77-81): exact adjoint
gradients through the differentiable jnp engine.  Assertions follow the
reference's directional style (test_evqe_operators.py:91-93) plus
convergence on analytically known minima and the mesh bit-identity
invariant every batched optimizer must hold.
"""

import numpy as np
import pytest

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim import BatchedGradientDescent, GradientDescentConfig
from queasars_tpu.parallel import population_mesh
from queasars_tpu.paulis import PauliSum, pauli_z_string
from queasars_tpu.sim.evaluators import (
    SamplerExpectationEvaluator,
    StatevectorExpectationEvaluator,
)

from tests.test_evaluators import rotation_individual


def all_z(n):
    return PauliSum.sum([pauli_z_string(q, n) for q in range(n)])


def mixed_population(n=3, pop=6, seed=9):
    population = EVQEPopulation.random_population(n, 2, pop, True, random_seed=seed)
    packed = PackedPopulation.pack(list(population.individuals))
    coords_list = [packed.param_coordinates(i) for i in range(pop)]
    k_max = max(c.shape[0] for c in coords_list)
    coords = np.zeros((pop, k_max, 3), np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
    return packed, coords, packed.n_params.copy()


def test_adam_converges_single_angle():
    """One U3 theta against Z has the exact minimum -1; Adam must reach it."""
    evaluator = StatevectorExpectationEvaluator(pauli_z_string(0, 1))
    packed = PackedPopulation.pack([rotation_individual(0.3)])
    coords = packed.param_coordinates(0)[None, :1]
    angles, energies, nfev = BatchedGradientDescent(
        GradientDescentConfig(maxiter=150, learning_rate=0.1)
    ).minimize(evaluator, packed, coords, np.array([1]), np.array([True]))
    assert energies[0] == pytest.approx(-1.0, abs=1e-3)
    fresh = evaluator.evaluate_packed(packed, angles=angles)
    assert fresh[0] == pytest.approx(-1.0, abs=1e-3)
    assert nfev == 300  # 2 reference-equivalent evaluations per step


def test_sgd_method_converges():
    evaluator = StatevectorExpectationEvaluator(pauli_z_string(0, 1))
    packed = PackedPopulation.pack([rotation_individual(0.3)])
    coords = packed.param_coordinates(0)[None, :1]
    angles, energies, _ = BatchedGradientDescent(
        GradientDescentConfig(maxiter=120, learning_rate=0.3, method="sgd")
    ).minimize(evaluator, packed, coords, np.array([1]), np.array([True]))
    assert energies[0] == pytest.approx(-1.0, abs=1e-3)


def test_adam_population_mixed_structures():
    """Lock-step descent over ragged genomes; inactive individuals frozen;
    reported energies are a fresh forward at the final angles."""
    evaluator = StatevectorExpectationEvaluator(all_z(3))
    packed, coords, n_free = mixed_population()
    active = np.array([True, True, True, True, False, False])

    before = np.asarray(evaluator.evaluate_packed(packed))
    angles, energies, _ = BatchedGradientDescent(
        GradientDescentConfig(maxiter=40, learning_rate=0.1)
    ).minimize(evaluator, packed, coords, n_free, active)
    after = np.asarray(evaluator.evaluate_packed(packed, angles=angles))

    assert after[active].sum() < before[active].sum()
    np.testing.assert_array_equal(angles[~active], packed.angles[~active])
    np.testing.assert_allclose(energies[active], after[active], atol=1e-5)


def test_cvar_exact_objective_improves():
    evaluator = StatevectorExpectationEvaluator(all_z(3), alpha=0.5)
    packed, coords, n_free = mixed_population(seed=3)
    active = np.ones(6, bool)
    before = np.asarray(evaluator.evaluate_packed(packed))
    angles, _, _ = BatchedGradientDescent(
        GradientDescentConfig(maxiter=30, learning_rate=0.1)
    ).minimize(evaluator, packed, coords, n_free, active)
    after = np.asarray(evaluator.evaluate_packed(packed, angles=angles))
    assert after.sum() < before.sum()


def test_general_hamiltonian_gradient():
    """Adjoint gradients flow through the non-diagonal (TFIM) term scan."""
    n = 3
    terms = [("ZZ", [q, q + 1], -1.0) for q in range(n - 1)]
    terms += [("X", [q], -1.0) for q in range(n)]
    tfim = PauliSum.from_sparse_list(terms, n)
    evaluator = StatevectorExpectationEvaluator(tfim)
    packed, coords, n_free = mixed_population(seed=5)
    active = np.ones(6, bool)
    before = np.asarray(evaluator.evaluate_packed(packed))
    angles, _, _ = BatchedGradientDescent(
        GradientDescentConfig(maxiter=40, learning_rate=0.1)
    ).minimize(evaluator, packed, coords, n_free, active)
    after = np.asarray(evaluator.evaluate_packed(packed, angles=angles))
    assert after.sum() < before.sum()


def test_shot_objective_raises():
    evaluator = SamplerExpectationEvaluator(all_z(2), shots=512, seed=3)
    packed = PackedPopulation.pack([rotation_individual(0.4, n_qubits=2)])
    coords = packed.param_coordinates(0)[None]
    with pytest.raises(ValueError, match="not differentiable"):
        BatchedGradientDescent().minimize(
            evaluator, packed, coords, np.array([coords.shape[1]]), np.array([True])
        )


def test_mesh_bit_identity():
    """1-device and 8-device meshes must produce bit-identical results —
    the invariant every batched optimizer shares (tests/test_mesh_solver.py)."""
    packed, coords, n_free = mixed_population(seed=11)
    active = np.ones(6, bool)
    config = GradientDescentConfig(maxiter=15, learning_rate=0.1)

    results = {}
    for n_devices in (1, 8):
        evaluator = StatevectorExpectationEvaluator(all_z(3))
        evaluator.set_mesh(population_mesh(n_devices))
        results[n_devices] = BatchedGradientDescent(config).minimize(
            evaluator, packed, coords, n_free, active, seed=2
        )
    np.testing.assert_array_equal(results[1][0], results[8][0])
    np.testing.assert_array_equal(results[1][1], results[8][1])


def test_solver_accepts_gradient_optimizer():
    """Full EVQE solve with the gradient optimizer plugged into the
    standard optimizer knob (solver/evqe.py)."""
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    operator = all_z(2)
    configuration = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedGradientDescent(GradientDescentConfig(maxiter=10, learning_rate=0.2)),
        optimizer_n_circuit_evaluations=None,
        max_generations=2,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=7,
        population_size=4,
        randomize_initial_population_parameters=True,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.3,
        topological_search_probability=0.3,
        layer_removal_probability=0.1,
    )
    result = EVQEMinimumEigensolver(configuration).compute_minimum_eigenvalue(operator)
    assert result.eigenvalue is not None
    assert result.eigenvalue < 0.0


# ---------------------------------------------------------------------------
# fused multi-slot parameter search (minimize_slots)
# ---------------------------------------------------------------------------

from tests.test_slot_fusion import _diagonal_operator, _slot_problem


def test_gradient_fused_slots_matches_sequential():
    """The fused scan runs the same Adam trajectory per slot as the
    sequential per-slot loop; only prefix-split float rounding differs."""
    packed, coords, n_free, active, slot_layers, seeds = _slot_problem()
    op = _diagonal_operator(packed.n_qubits)
    config = GradientDescentConfig(maxiter=8, learning_rate=0.1)

    angles = packed.angles
    for s in range(n_free.shape[1]):
        angles, _, _ = BatchedGradientDescent(config).minimize(
            StatevectorExpectationEvaluator(op), packed,
            coords[:, s], n_free[:, s], active[:, s],
            angles=angles, seed=int(seeds[s]),
        )
    a_seq = np.asarray(angles)

    result = BatchedGradientDescent(
        GradientDescentConfig(maxiter=8, learning_rate=0.1, cache_prefix=True)
    ).minimize_slots(
        StatevectorExpectationEvaluator(op), packed, coords, n_free, active,
        slot_layers, seeds=seeds,
    )
    assert result is not None
    a_fused, e_fused, nfev = result
    assert nfev == config.n_circuit_evaluations()
    evaluator = StatevectorExpectationEvaluator(op)
    seq_e = np.asarray(evaluator.evaluate_packed(packed, angles=a_seq))
    fused_e = np.asarray(evaluator.evaluate_packed(packed, angles=a_fused))
    np.testing.assert_allclose(fused_e, seq_e, rtol=1e-3, atol=1e-3)
    # the returned energies are a fresh forward at the final angles
    np.testing.assert_allclose(e_fused, fused_e, atol=1e-5)


def test_gradient_fused_slots_default_resolution():
    """flag None -> fused only under the production Pallas path (the
    committed-fixture invariant); shot objectives decline fusion."""
    packed, coords, n_free, active, slot_layers, seeds = _slot_problem()
    op = _diagonal_operator(packed.n_qubits)
    assert (
        BatchedGradientDescent(GradientDescentConfig(maxiter=3)).minimize_slots(
            StatevectorExpectationEvaluator(op), packed, coords, n_free, active,
            slot_layers, seeds=seeds,
        )
        is None
    )
    shot_eval = SamplerExpectationEvaluator(op, shots=64, seed=1)
    assert (
        BatchedGradientDescent(
            GradientDescentConfig(maxiter=3, cache_prefix=True)
        ).minimize_slots(
            shot_eval, packed, coords, n_free, active, slot_layers, seeds=seeds,
        )
        is None
    )


def test_gradient_fused_slots_mesh_bit_identity():
    packed, coords, n_free, active, slot_layers, seeds = _slot_problem(pop=8)
    op = _diagonal_operator(packed.n_qubits)
    config = GradientDescentConfig(maxiter=5, learning_rate=0.1, cache_prefix=True)
    results = {}
    for n_devices in (1, 8):
        evaluator = StatevectorExpectationEvaluator(op)
        evaluator.set_mesh(population_mesh(n_devices))
        results[n_devices] = BatchedGradientDescent(config).minimize_slots(
            evaluator, packed, coords, n_free, active, slot_layers, seeds=seeds,
        )
    np.testing.assert_array_equal(results[1][0], results[8][0])
    np.testing.assert_array_equal(results[1][1], results[8][1])
