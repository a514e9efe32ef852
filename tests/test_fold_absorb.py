"""Same-group controlled-diagonal absorption in the kron-fold pipeline.

``build_fold_pipeline(absorb_diag=True)`` moves every CDiag whose
control and target share one 7-qubit axis group (and whose kron layer
is already active in that group) out of the full-state diag pass and
into per-group row-scales of the group matmul — an exact algebraic
rewrite (the CDiag is diagonal within the group's 2^m space).  These
tests pin the classification, the reference applier's handling of the
absorbed slots, and the Pallas kernels' row-scale path in interpret
mode; the hardware rate numbers live in docs/performance.md.
"""

import numpy as np
import pytest

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.individual import EVQEIndividual
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.sim.fold_pipeline import (
    LANE_BITS,
    apply_fold_pipeline_reference,
    build_fold_pipeline,
)
from queasars_tpu.sim.pallas_fold_kernels import (
    pallas_energies_exact_folded,
    pallas_population_probs_folded,
)
from queasars_tpu.sim.statevector import GATE_CROT, probabilities, simulate_circuits


def _packed(n, layers, pop, seed=0):
    population = EVQEPopulation.random_population(n, layers, pop, True, random_seed=seed)
    return PackedPopulation.pack(list(population.individuals))


def _build(packed, n, absorb):
    return build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n,
        absorb_diag=absorb,
    )


@pytest.mark.parametrize("n,layers,seed", [(5, 3, 1), (8, 3, 2), (10, 4, 3)])
def test_absorbed_pipeline_matches_engine(n, layers, seed):
    """The absorbed pipeline is the same exact transform: the dense
    reference applier must still reproduce the statevector engine."""
    packed = _packed(n, layers, pop=6, seed=seed)
    pipe = _build(packed, n, absorb=True)
    assert int(np.asarray(pipe.abs_count).sum()) > 0, "workload has no absorbable slots"
    got = np.asarray(apply_fold_pipeline_reference(pipe, n))
    want = np.asarray(
        simulate_circuits(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_classification_invariants():
    """Every CROT lands in exactly one list; absorbed slots are
    same-group pairs of kron-active groups; absorb off keeps every slot
    in the residual list with identical content to the absorbed build's
    union."""
    n, layers = 10, 4
    packed = _packed(n, layers, pop=8, seed=7)
    plain = _build(packed, n, absorb=False)
    absorbed = _build(packed, n, absorb=True)

    total_crot = np.logical_and(
        np.asarray(packed.gate_types) == GATE_CROT,
        np.asarray(packed.layer_mask)[:, :, None],
    ).sum(axis=2)
    np.testing.assert_array_equal(np.asarray(plain.diag_count), total_crot)
    assert int(np.asarray(plain.abs_count).sum()) == 0
    np.testing.assert_array_equal(
        np.asarray(absorbed.diag_count) + np.asarray(absorbed.abs_count), total_crot
    )

    a_ctrl = np.asarray(absorbed.abs_ctrl)
    a_tgt = np.asarray(absorbed.abs_tgt)
    ga = np.asarray(absorbed.group_active)
    used = a_ctrl >= 0
    assert used.any()
    # same group (and the control is never the padding -1 when used)
    g_c = np.minimum(a_ctrl // LANE_BITS, 2)
    g_t = np.minimum(np.maximum(a_tgt, 0) // LANE_BITS, 2)
    assert np.all((g_c == g_t) | ~used)
    # only into active kron layers (indexed by the layer = diag index)
    p_idx, l_idx, s_idx = np.nonzero(used)
    assert np.all(ga[p_idx, l_idx, g_t[p_idx, l_idx, s_idx]] == 1)
    # residual slots are exactly the cross-group / inactive ones
    r_ctrl = np.asarray(absorbed.diag_ctrl)
    r_tgt = np.asarray(absorbed.diag_tgt)
    r_used = r_ctrl >= 0
    rg_c = np.minimum(r_ctrl // LANE_BITS, 2)
    rg_t = np.minimum(np.maximum(r_tgt, 0) // LANE_BITS, 2)
    rp, rl, rs = np.nonzero(r_used)
    cross_or_inactive = (rg_c[rp, rl, rs] != rg_t[rp, rl, rs]) | (
        ga[rp, rl, rg_t[rp, rl, rs]] == 0
    )
    assert np.all(cross_or_inactive)


@pytest.mark.parametrize("n", [8, 10, 15])
def test_interpret_probs_match_plain_pipeline(n):
    """The kernels' group-matrix row-scale reproduces the full-state
    diag pass (Pallas interpreter, HIGHEST precision)."""
    packed = _packed(n, 3, pop=4, seed=n)
    plain = _build(packed, n, absorb=False)
    absorbed = _build(packed, n, absorb=True)
    assert int(np.asarray(absorbed.abs_count).sum()) > 0
    got = np.asarray(pallas_population_probs_folded(absorbed, n, interpret=True))
    ref = np.asarray(pallas_population_probs_folded(plain, n, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    want = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_interpret_energies_match_plain_pipeline():
    n = 10
    packed = _packed(n, 4, pop=4, seed=21)
    table = np.random.default_rng(0).normal(size=1 << n).astype(np.float32)
    plain = _build(packed, n, absorb=False)
    absorbed = _build(packed, n, absorb=True)
    got = np.asarray(pallas_energies_exact_folded(absorbed, table, n, interpret=True))
    ref = np.asarray(pallas_energies_exact_folded(plain, table, n, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_top_group_not_absorbed_past_21():
    """At n=22 the kernels split the top group into two sub-kron
    contractions whose row-scales cannot host a cross-sub diagonal, so
    the build must keep top-group pairs in the residual pass."""
    n = 22
    individuals = [EVQEIndividual.random_individual(n, 3, True, random_seed=s) for s in (1, 2)]
    packed = PackedPopulation.pack(individuals)
    pipe = _build(packed, n, absorb=True)
    a_tgt = np.asarray(pipe.abs_tgt)
    used = a_tgt >= 0
    assert np.all((a_tgt < 2 * LANE_BITS) | ~used), "top-group slot absorbed at n=22"
    # at n=21 the top group applies whole-state and absorbs
    n21 = 21
    individuals = [
        EVQEIndividual.random_individual(n21, 4, True, random_seed=s) for s in (3, 4, 5)
    ]
    packed21 = PackedPopulation.pack(individuals)
    pipe21 = _build(packed21, n21, absorb=True)
    a_tgt21 = np.asarray(pipe21.abs_tgt)
    assert np.any(a_tgt21 >= 2 * LANE_BITS), "no top-group absorption at n=21"
