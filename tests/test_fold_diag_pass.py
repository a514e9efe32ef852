"""Multi-slot controlled-diagonal pass coverage for the folded kernels.

Random-genome fold tests only reach multi-slot residual diag layers by
luck; these workloads are handcrafted so every layer holds >= 2 CROTs
with control and target in DIFFERENT 7-qubit axis groups — pairs the
production ``absorb_diag=True`` build can NOT absorb, guaranteeing the
per-slot complex diag pass runs with multiple slots (and, in the last
test, its row-chunked n>=22 form).

An angle-accumulation rewrite of this pass (accumulate the unit-modulus
phase ANGLES into one real plane, then a single cos/sin complex
multiply) was measured and REJECTED on hardware: 1424.7 vs 1753.5
evals/s (0.81x) at the bench workload — the vector cos/sin plus the
full-plane fori carry cost more than the per-slot complex multiplies
they replace (`experiments/exp_diag_accum.py`, docs/performance.md).
"""

import numpy as np
import pytest

from queasars_tpu.sim.fold_pipeline import LANE_BITS, build_fold_pipeline
from queasars_tpu.sim.pallas_fold_kernels import (
    pallas_energies_exact_folded,
    pallas_population_probs_folded,
)
from queasars_tpu.sim.statevector import (
    GATE_CROT,
    GATE_CTRL,
    GATE_ROT,
    probabilities,
)


def _cross_group_workload(n, pairs_per_layer, n_layers=2, pop=3, seed=11):
    """Genomes whose layers hold ``pairs_per_layer`` CROTs with control
    and target in DIFFERENT 7-qubit axis groups (plus rotations on the
    leftovers), so every CROT stays in the residual diag list."""
    assert n > LANE_BITS, "cross-group pairs need at least two axis groups"
    rng = np.random.default_rng(seed)
    gate_types = np.zeros((pop, n_layers, n), np.int32)
    controls = np.full((pop, n_layers, n), -1, np.int32)
    angles = rng.uniform(0.0, 2 * np.pi, size=(pop, n_layers, n, 3)).astype(np.float32)
    low = list(range(LANE_BITS))          # lane group
    high = list(range(LANE_BITS, n))      # row group
    for p in range(pop):
        for l in range(n_layers):
            used = set()
            for j in range(pairs_per_layer):
                # pair j uses low[j] and high[j]; alternate the target
                # group so both directions are covered
                t, c = (low[j], high[j]) if j % 2 == 0 else (high[j], low[j])
                gate_types[p, l, t] = GATE_CROT
                gate_types[p, l, c] = GATE_CTRL
                controls[p, l, t] = c
                used.update((t, c))
            for q in range(n):
                if q not in used:
                    gate_types[p, l, q] = GATE_ROT
    layer_mask = np.ones((pop, n_layers), bool)
    return gate_types, controls, angles, layer_mask


@pytest.mark.parametrize("n,pairs", [(9, 2), (10, 3), (12, 4)])
def test_multislot_probs_match_engine(n, pairs):
    gt, c, a, lm = _cross_group_workload(n, pairs)
    pipe = build_fold_pipeline(gt, c, a, lm, n, absorb_diag=True)
    counts = np.asarray(pipe.diag_count)
    assert counts.max() >= 2, "workload never builds a multi-slot diag layer"
    assert int(np.asarray(pipe.abs_count).sum()) == 0, "cross-group pairs must not absorb"
    got = np.asarray(pallas_population_probs_folded(pipe, n, interpret=True))
    want = np.asarray(probabilities(gt, c, a, lm, n))
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_multislot_high_precision_within_gate():
    n, pairs = 10, 3
    gt, c, a, lm = _cross_group_workload(n, pairs, seed=23)
    pipe = build_fold_pipeline(gt, c, a, lm, n, absorb_diag=True)
    got = np.asarray(
        pallas_population_probs_folded(pipe, n, precision="high", interpret=True)
    )
    want = np.asarray(probabilities(gt, c, a, lm, n))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_multislot_energies_match_dense(rtol=1e-5):
    n, pairs = 10, 2
    gt, c, a, lm = _cross_group_workload(n, pairs, seed=5)
    pipe = build_fold_pipeline(gt, c, a, lm, n, absorb_diag=True)
    table = np.linspace(-1.0, 1.0, 1 << n).astype(np.float32)
    got = np.asarray(
        pallas_energies_exact_folded(pipe, table, n, interpret=True)
    )
    probs = np.asarray(probabilities(gt, c, a, lm, n))
    want = probs @ table
    np.testing.assert_allclose(got, want, rtol=rtol, atol=1e-5)


def test_mixed_single_and_multislot_layers():
    """Layers with count == 1 and count == 2 interleave in one circuit."""
    n = 9
    gt, c, a, lm = _cross_group_workload(n, 1, n_layers=1, pop=2, seed=3)
    gt2, c2, a2, lm2 = _cross_group_workload(n, 2, n_layers=1, pop=2, seed=3)
    gt = np.concatenate([gt, gt2], axis=1)
    c = np.concatenate([c, c2], axis=1)
    a = np.concatenate([a, a2], axis=1)
    lm = np.concatenate([lm, lm2], axis=1)
    pipe = build_fold_pipeline(gt, c, a, lm, n, absorb_diag=True)
    counts = np.asarray(pipe.diag_count)
    assert counts.min() == 1 and counts.max() == 2
    got = np.asarray(pallas_population_probs_folded(pipe, n, interpret=True))
    want = np.asarray(probabilities(gt, c, a, lm, n))
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_multislot_chunked_path(monkeypatch):
    """Past n=21 the diag passes run row-chunked; shrink the threshold
    to exercise the chunked multi-slot branch at interpreter size."""
    from queasars_tpu.sim import pallas_fold_kernels as pfk

    monkeypatch.setattr(pfk, "_WHOLE_STATE_MAX_ROWS", 256)
    monkeypatch.setattr(pfk, "_LANE_CHUNK_ROWS", 128)
    monkeypatch.setattr(pfk, "_TOP_SUB_CHUNK_ROWS", 128)
    n = 16
    gt, c, a, lm = _cross_group_workload(n, 3, n_layers=2, pop=2, seed=29)
    pipe = build_fold_pipeline(gt, c, a, lm, n, absorb_diag=True)
    assert np.asarray(pipe.diag_count).max() >= 2
    got = np.asarray(pallas_population_probs_folded(pipe, n, interpret=True))
    want = np.asarray(probabilities(gt, c, a, lm, n))
    np.testing.assert_allclose(got, want, atol=5e-6)
