"""Folded (MXU) fully-in-kernel last-layer NFT sweep, in the Pallas
interpreter on CPU: the folded states kernel against the engine, the
host-side sweep metadata against the fold pipeline's own compaction, and
the folded sweep against both the scan path and the slot sweep kernel
(identical update math; probes carry fold + polynomial-atan2 rounding).
Hardware rates live in docs/performance.md.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.individual import EVQEIndividual
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim.nft import BatchedNFT, NFTConfig
from queasars_tpu.optim.sweep_kernel_launch import (
    nft_layer_sweep_folded_launch,
    nft_layer_sweep_launch,
)
from queasars_tpu.paulis import PauliSum
from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator
from queasars_tpu.sim.fold_pipeline import build_fold_pipeline
from queasars_tpu.sim.pallas_fold_kernels import (
    fold_sweep_metadata,
    pallas_population_states_folded,
)
from queasars_tpu.sim.statevector import simulate_circuits


def _diagonal_operator(n_qubits: int, seed: int = 7) -> PauliSum:
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(6):
        z = int(rng.integers(1, 1 << n_qubits))
        label = "".join("Z" if (z >> q) & 1 else "I" for q in range(n_qubits))[::-1]
        parts.append(PauliSum.from_label(label, float(rng.normal())))
    return PauliSum.sum(parts)


def _problem(n_qubits: int = 7, pop: int = 4, layers: int = 3, seed: int = 11):
    population = EVQEPopulation.random_population(
        n_qubits, layers, pop, True, random_seed=seed
    )
    packed = PackedPopulation.pack(list(population.individuals))
    real_layers = packed.layer_mask.sum(axis=1).astype(np.int32)
    last_layer = real_layers - 1
    coords_list = [
        packed.layer_param_coordinates(i, -1) for i in range(packed.n_individuals)
    ]
    k_max = max(max(c.shape[0] for c in coords_list), 1)
    coords = np.zeros((packed.n_individuals, k_max, 3), np.int32)
    n_free = np.zeros(packed.n_individuals, np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
        n_free[i] = c.shape[0]
    active = n_free > 0
    return packed, coords, n_free, active, last_layer


def _table(n_qubits: int, seed: int = 5) -> jnp.ndarray:
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=1 << n_qubits).astype(np.float32))


def test_folded_states_match_engine():
    n = 8
    packed, *_ = _problem(n, pop=3, layers=2, seed=n)
    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
    )
    got = np.asarray(
        pallas_population_states_folded(pipe, n, precision="highest", interpret=True)
    )
    want = np.asarray(
        simulate_circuits(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    # states agree up to the fold's global-phase-free decomposition: the
    # kron-fold transform is exact, so the planes match directly
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_fold_sweep_metadata_matches_pipeline_compaction():
    """The host-side sweep metadata must agree with build_fold_pipeline's
    own CROT compaction for the swept layer (same front-compacted order),
    and the group activity must cover exactly the pipeline's."""
    n = 9
    packed, _, _, _, last_layer = _problem(n, pop=5, layers=3, seed=23)
    pop_idx = np.arange(packed.n_individuals)
    gate1 = packed.gate_types[pop_idx, last_layer]
    ctrl1 = packed.controls[pop_idx, last_layer]
    diag_ctrl, diag_tgt, slot_of_q, diag_count, group_active = fold_sweep_metadata(
        gate1, ctrl1, n
    )
    # single-layer pipeline of just the swept layer
    pipe = build_fold_pipeline(
        gate1[:, None, :],
        ctrl1[:, None, :],
        packed.angles[pop_idx, last_layer][:, None, :, :],
        np.ones((packed.n_individuals, 1), bool),
        n,
    )
    np.testing.assert_array_equal(diag_ctrl[:, 0], np.asarray(pipe.diag_ctrl)[:, 0])
    np.testing.assert_array_equal(diag_tgt[:, 0], np.asarray(pipe.diag_tgt)[:, 0])
    np.testing.assert_array_equal(
        diag_count[:, 0, 0], np.asarray(pipe.diag_count)[:, 0]
    )
    # slot_of_q inverts the compaction
    for p in range(packed.n_individuals):
        for j in range(diag_count[p, 0, 0]):
            q = diag_tgt[p, 0, j]
            assert slot_of_q[p, 0, q] == j
    # pipeline kron layers: 0 = vdag, 1 = main.  group_active must be a
    # superset of the pipeline's (the pipeline also prunes angle-level
    # identities, e.g. zero-angle rotations; metadata is structural)
    pipe_active = np.asarray(pipe.group_active)
    assert np.all(group_active >= pipe_active)


def test_folded_sweep_matches_slot_sweep():
    packed, coords, n_free, active, last_layer = _problem()
    op = _diagonal_operator(packed.n_qubits)
    evaluator = StatevectorExpectationEvaluator(op)
    table = evaluator._table
    args = (
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
        last_layer, coords[:, :, 1:3], n_free, active, table,
    )
    kwargs = dict(n_qubits=packed.n_qubits, maxiter=9, reset_interval=32)
    a_slot, e_slot = nft_layer_sweep_launch(*args, **kwargs)
    a_fold, e_fold = nft_layer_sweep_folded_launch(*args, **kwargs)
    # flat coordinates (zero fitted-sinusoid amplitude) make the raw
    # shift arbitrary up to pi, so compare THROUGH the evaluator — the
    # same equivalence the slot-sweep tests pin against the scan path
    pop_idx = np.arange(packed.n_individuals)

    def energies_at(layer_angles):
        merged = packed.angles.copy()
        merged[pop_idx, last_layer] = np.asarray(layer_angles)
        return np.asarray(evaluator.evaluate_packed(packed, angles=merged))

    np.testing.assert_allclose(
        energies_at(a_fold), energies_at(a_slot), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(e_fold), np.asarray(e_slot), rtol=1e-4, atol=1e-4
    )


def test_folded_sweep_matches_scan_path_through_evaluator():
    packed, coords, n_free, active, last_layer = _problem(seed=17)
    op = _diagonal_operator(packed.n_qubits, seed=3)
    evaluator = StatevectorExpectationEvaluator(op)
    a_scan, e_scan, _ = BatchedNFT(
        NFTConfig(maxiter=9, cache_prefix=False)
    ).minimize(evaluator, packed, coords, n_free, active, last_layer=last_layer)
    a_fold, e_fold = nft_layer_sweep_folded_launch(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
        last_layer, coords[:, :, 1:3], n_free, active, evaluator._table,
        n_qubits=packed.n_qubits, maxiter=9, reset_interval=32,
    )
    merged = packed.angles.copy()
    merged[np.arange(packed.n_individuals), last_layer] = np.asarray(a_fold)
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(packed, angles=merged)),
        np.asarray(evaluator.evaluate_packed(packed, angles=a_scan)),
        rtol=1e-4, atol=1e-4,
    )
    # the recycled z0 is the exact energy at the final angles
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(packed, angles=merged)),
        np.asarray(e_fold),
        rtol=1e-4, atol=1e-4,
    )


def test_folded_sweep_crot_layers_and_gating_edges():
    """CROT-heavy genomes (the diag pass + vdag kron layer), the
    n_free=0-but-active freeze, and inactive individuals."""
    individuals = [
        EVQEIndividual.random_individual(7, 2, True, s) for s in (5, 9, 13, 21)
    ]
    packed = PackedPopulation.pack(individuals)
    real_layers = packed.layer_mask.sum(axis=1).astype(np.int32)
    last_layer = real_layers - 1
    coords_list = [
        packed.layer_param_coordinates(i, -1) for i in range(packed.n_individuals)
    ]
    k_max = max(max(c.shape[0] for c in coords_list), 1)
    coords = np.zeros((packed.n_individuals, k_max, 3), np.int32)
    n_free = np.zeros(packed.n_individuals, np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
        n_free[i] = c.shape[0]
    n_free[1] = 0  # active but frozen
    active = np.ones(packed.n_individuals, bool)
    active[2] = False  # inactive entirely

    op = _diagonal_operator(7, seed=3)
    evaluator = StatevectorExpectationEvaluator(op)
    args = (
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
        last_layer, coords[:, :, 1:3], n_free, active, evaluator._table,
    )
    kwargs = dict(n_qubits=7, maxiter=7, reset_interval=32)
    a_slot, e_slot = nft_layer_sweep_launch(*args, **kwargs)
    a_fold, e_fold = nft_layer_sweep_folded_launch(*args, **kwargs)
    pop_idx = np.arange(packed.n_individuals)

    def energies_at(layer_angles):
        merged = packed.angles.copy()
        merged[pop_idx, last_layer] = np.asarray(layer_angles)
        return np.asarray(evaluator.evaluate_packed(packed, angles=merged))

    np.testing.assert_allclose(
        energies_at(a_fold), energies_at(a_slot), rtol=1e-4, atol=1e-4
    )
    # frozen and inactive individuals keep their starting layer angles
    for i in (1, 2):
        np.testing.assert_allclose(
            np.asarray(a_fold)[i],
            packed.angles[i, last_layer[i]],
            rtol=0, atol=0,
        )


def test_folded_sweep_deterministic():
    packed, coords, n_free, active, last_layer = _problem(seed=29)
    op = _diagonal_operator(packed.n_qubits, seed=1)
    evaluator = StatevectorExpectationEvaluator(op)

    def run():
        return nft_layer_sweep_folded_launch(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            last_layer, coords[:, :, 1:3], n_free, active, evaluator._table,
            n_qubits=packed.n_qubits, maxiter=6, reset_interval=32,
        )

    a1, e1 = run()
    a2, e2 = run()
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_fold_sweep_dispatch_predicate():
    """mxu_fold_enabled(path='sweep') gates the folded sweep: TPU-only,
    n in [7, 20] (four resident planes), honoring the QUEASARS_MXU env."""
    from queasars_tpu.optim.objective import mxu_fold_enabled

    assert mxu_fold_enabled(True, 7, path="sweep", backend="tpu")
    assert mxu_fold_enabled(True, 20, path="sweep", backend="tpu")
    assert not mxu_fold_enabled(True, 21, path="sweep", backend="tpu")
    assert mxu_fold_enabled(True, 21, path="exact", backend="tpu")
    assert not mxu_fold_enabled(True, 6, path="sweep", backend="tpu")
    assert not mxu_fold_enabled(True, 12, path="sweep", backend="cpu")
    assert not mxu_fold_enabled(False, 12, path="sweep", backend="tpu")
