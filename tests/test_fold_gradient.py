"""Differentiable kron-fold applier (simulate_circuits_folded) and the
gradient optimizer's MXU fold objective.

The fold transform is the production TPU engine; making it differentiable
gives the adjoint-gradient optimizer MXU shape on both passes.  These
tests pin, on the CPU backend: forward parity with the per-slot engine,
gradient parity between the two engines, finite gradients at the
degenerate angles where the eigendecomposition's sqrt/arctan2 chain used
to produce 0/0 cotangents (a freshly grown CROT with all-zero params),
and end-to-end optimizer equivalence under ``use_fold``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.individual import EVQEIndividual
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim import BatchedGradientDescent, GradientDescentConfig
from queasars_tpu.paulis import PauliSum, pauli_z_string
from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator
from queasars_tpu.sim.fold_pipeline import simulate_circuits_folded
from queasars_tpu.sim.statevector import simulate_circuits

N = 7  # smallest folded size (one full lane group)


def packed_population(pop=4, layers=3, seed=5):
    population = EVQEPopulation.random_population(N, layers, pop, True, random_seed=seed)
    return PackedPopulation.pack(list(population.individuals))


def test_folded_forward_matches_slot_engine():
    packed = packed_population()
    want = np.asarray(
        simulate_circuits(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, N
        )
    )
    got = np.asarray(
        simulate_circuits_folded(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, N
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_folded_forward_with_initial_state():
    packed = packed_population(pop=3)
    rng = np.random.default_rng(0)
    init = rng.normal(size=(3, 2, 1 << N)).astype(np.float32)
    init /= np.sqrt((init**2).sum(axis=(1, 2), keepdims=True))
    want = np.asarray(
        simulate_circuits(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, N,
            jnp.asarray(init),
        )
    )
    got = np.asarray(
        simulate_circuits_folded(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, N,
            jnp.asarray(init),
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


def _energy_grad(sim_fn, packed, table):
    def loss(angles):
        states = sim_fn(
            packed.gate_types, packed.controls, angles, packed.layer_mask, N
        )
        probs = states[:, 0, :] ** 2 + states[:, 1, :] ** 2
        return jnp.sum(probs @ table)

    return np.asarray(jax.grad(loss)(jnp.asarray(packed.angles)))


def test_folded_gradient_matches_slot_engine():
    packed = packed_population()
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.normal(size=1 << N).astype(np.float32))
    g_slot = _energy_grad(simulate_circuits, packed, table)
    g_fold = _energy_grad(simulate_circuits_folded, packed, table)
    assert np.isfinite(g_slot).all() and np.isfinite(g_fold).all()
    np.testing.assert_allclose(g_fold, g_slot, atol=5e-5)


def test_degenerate_angles_give_finite_gradients():
    """A freshly grown layer has all parameters at exactly 0 (the
    reference's topological search, mutation.py:337-368) — the CROT
    eigendecomposition is degenerate there.  Contract: the fold's
    gradients are FINITE everywhere (no NaN cotangents from the
    sqrt/arctan2 chain), match the slot engine away from degenerate
    CROT slots, and are zero AT the kink (the factors' derivatives only
    cancel in the composite) — which is why the optimizer's folded
    descent warms up with one per-gate step (see the unstall test)."""
    base = EVQEPopulation.random_population(N, 2, 3, True, random_seed=8)
    grown = [
        EVQEIndividual.add_random_layers(ind, 1, False, random_seed=i)
        for i, ind in enumerate(base.individuals)
    ]
    packed = PackedPopulation.pack(grown)
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=1 << N).astype(np.float32))
    g_slot = _energy_grad(simulate_circuits, packed, table)
    g_fold = _energy_grad(simulate_circuits_folded, packed, table)
    assert np.isfinite(g_slot).all() and np.isfinite(g_fold).all()
    # degenerate CROT slots: freshly grown layer, all-zero angles
    gt = np.asarray(packed.gate_types)
    ang = np.asarray(packed.angles)
    degenerate = np.logical_and(gt == 3, np.all(ang == 0.0, axis=-1))  # [P, L, n]
    ok = ~np.broadcast_to(degenerate[..., None], g_slot.shape)
    np.testing.assert_allclose(g_fold[ok], g_slot[ok], atol=5e-5)
    # at the kink the folded cotangents collapse to ~0 (guarded factor
    # branches) — the optimizer's warmup step exists for exactly this
    assert np.all(np.abs(g_fold[~ok]) < 1e-6)


def test_folded_descent_unsticks_fresh_crot_layers():
    """With use_fold=True, fresh all-zero CROT parameters must still
    move: the first step differentiates through the per-gate engine
    (kink warmup), after which the folded adjoint takes over.  Results
    track the pure per-gate descent."""
    base = EVQEPopulation.random_population(N, 2, 4, True, random_seed=8)
    grown = [
        EVQEIndividual.add_random_layers(ind, 1, False, random_seed=i)
        for i, ind in enumerate(base.individuals)
    ]
    packed = PackedPopulation.pack(grown)
    op = PauliSum.sum([pauli_z_string(q, N) for q in range(N)])
    # optimize ONLY the fresh last layer (all parameters exactly 0)
    real_layers = packed.layer_mask.sum(axis=1).astype(np.int32)
    coords_list = [
        packed.layer_param_coordinates(i, int(real_layers[i] - 1)) for i in range(4)
    ]
    k_max = max(c.shape[0] for c in coords_list)
    coords = np.zeros((4, k_max, 3), np.int32)
    n_free = np.zeros(4, np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
        n_free[i] = c.shape[0]
    active = n_free > 0

    results = {}
    for use_fold in (False, True):
        evaluator = StatevectorExpectationEvaluator(op)
        results[use_fold] = BatchedGradientDescent(
            GradientDescentConfig(maxiter=15, learning_rate=0.1, use_fold=use_fold)
        ).minimize(evaluator, packed, coords, n_free, active, seed=5)
    # the fresh layer's parameters moved under the folded path
    moved = results[True][0] != packed.angles
    pop_idx = np.arange(4)
    for i in pop_idx[active]:
        layer = int(real_layers[i] - 1)
        assert moved[i, layer].any(), f"individual {i} stuck at the kink"
    # near the kink the fold's parametrization derivatives amplify tiny
    # engine differences through Adam's moment normalization, so the
    # trajectories are not float-close — the contract is that BOTH
    # descents make comparable progress from the same start
    evaluator = StatevectorExpectationEvaluator(op)
    before = np.asarray(evaluator.evaluate_packed(packed))[active]
    e_fold = results[True][1][active]
    e_slot = results[False][1][active]
    assert np.isfinite(e_fold).all()
    assert e_fold.sum() < before.sum() - 0.1
    assert abs(e_fold.sum() - e_slot.sum()) < 0.25 * max(1.0, abs(e_slot.sum()))


def test_gradient_optimizer_fold_matches_plain():
    op = PauliSum.sum([pauli_z_string(q, N) for q in range(N)])
    packed = packed_population(pop=4, seed=11)
    coords_list = [packed.param_coordinates(i) for i in range(4)]
    k_max = max(c.shape[0] for c in coords_list)
    coords = np.zeros((4, k_max, 3), np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
    active = np.ones(4, bool)

    results = {}
    for use_fold in (False, True):
        evaluator = StatevectorExpectationEvaluator(op)
        results[use_fold] = BatchedGradientDescent(
            GradientDescentConfig(maxiter=20, learning_rate=0.1, use_fold=use_fold)
        ).minimize(evaluator, packed, coords, packed.n_params.copy(), active, seed=3)
    # per-step gradients match to ~5e-5 (test above), but Adam's moment
    # normalization amplifies engine rounding chaotically over steps —
    # the contract is comparable descent, not float-equal trajectories
    evaluator = StatevectorExpectationEvaluator(op)
    before = np.asarray(evaluator.evaluate_packed(packed)).sum()
    e_fold, e_slot = results[True][1].sum(), results[False][1].sum()
    assert e_fold < before - 0.5 and e_slot < before - 0.5
    assert abs(e_fold - e_slot) < 0.25 * max(1.0, abs(e_slot))


def test_folded_applier_rejects_tiny_sizes():
    packed_small = PackedPopulation.pack(
        [
            EVQEIndividual.random_individual(3, 2, True, random_seed=0),
        ]
    )
    with pytest.raises(ValueError, match="folded"):
        simulate_circuits_folded(
            packed_small.gate_types, packed_small.controls, packed_small.angles,
            packed_small.layer_mask, 3,
        )
