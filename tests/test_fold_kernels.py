"""Folded (MXU) Pallas kernels vs the statevector engine, in the Pallas
interpreter on CPU.  The hardware cost/accuracy numbers live in
docs/performance.md; these tests pin the kernel LOGIC: group-fold
construction from SMEM 2x2 factors, the three axis-group matmuls, the
controlled-diagonal phase pass, initial states, and the shared sampler
epilogue."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.sim.fold_pipeline import build_fold_pipeline
from queasars_tpu.sim.pallas_fold_kernels import (
    pallas_energies_exact_folded,
    pallas_population_probs_folded,
    pallas_sampled_shot_energies_folded,
)
from queasars_tpu.sim.statevector import probabilities, simulate_circuits


def _workload(n, layers, pop, seed=0):
    population = EVQEPopulation.random_population(n, layers, pop, True, random_seed=seed)
    packed = PackedPopulation.pack(list(population.individuals))
    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
    )
    return packed, pipe


@pytest.mark.parametrize("n", [7, 8, 10, 14, 15])
def test_probs_match_engine(n):
    packed, pipe = _workload(n, 2, pop=3, seed=n)
    got = np.asarray(pallas_population_probs_folded(pipe, n, interpret=True))
    want = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_probs_match_engine_deep_mixed_depths():
    """Different per-individual depths exercise identity kron layers."""
    n = 9
    from queasars_tpu.genome.individual import EVQEIndividual

    individuals = [
        EVQEIndividual.random_individual(n, d, True, random_seed=40 + d)
        for d in (1, 3, 5, 2)
    ]
    packed = PackedPopulation.pack(individuals)
    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
    )
    got = np.asarray(pallas_population_probs_folded(pipe, n, interpret=True))
    want = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_energies_match_engine():
    n = 10
    packed, pipe = _workload(n, 3, pop=4, seed=2)
    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.normal(size=1 << n).astype(np.float32))
    got = np.asarray(pallas_energies_exact_folded(pipe, table, n, interpret=True))
    probs_ref = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    want = probs_ref @ np.asarray(table)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_initial_state_roundtrip():
    """Folded kernel from a cached prefix state must equal the engine's
    full-circuit result (the optimizer prefix-cache contract)."""
    n = 8
    packed, pipe = _workload(n, 2, pop=3, seed=7)
    rng = np.random.default_rng(11)
    raw = rng.normal(size=(3, 2, 1 << n)).astype(np.float32)
    norm = np.sqrt((raw**2).sum(axis=(1, 2), keepdims=True))
    initial = jnp.asarray(raw / norm)
    got = np.asarray(
        pallas_population_probs_folded(pipe, n, interpret=True, initial=initial)
    )
    states = np.asarray(
        simulate_circuits(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n,
            initial,
        )
    )
    want = states[:, 0] ** 2 + states[:, 1] ** 2
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_sampled_shot_energies_match_unfolded_stream():
    """The folded sampler shares the epilogue with the slot-kernel
    sampler: same uniforms -> same sampled energies."""
    from queasars_tpu.sim.pallas_kernels import pallas_sampled_shot_energies

    n, shots = 14, 64
    packed, pipe = _workload(n, 2, pop=2, seed=3)
    rng = np.random.default_rng(9)
    table = jnp.asarray(rng.normal(size=1 << n).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(4), packed.n_individuals)
    frac = jnp.stack([jax.random.uniform(k, (shots,), jnp.float32) for k in keys])
    got = np.asarray(
        pallas_sampled_shot_energies_folded(pipe, table, frac, n, shots, interpret=True)
    )
    want = np.asarray(
        pallas_sampled_shot_energies(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            table, frac, n, shots, interpret=True,
        )
    )
    # identical draws; interpreter matmuls are exact f32, so the only
    # divergence source is the f32 fold-vs-slot state difference moving a
    # boundary draw — none on this workload
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sampled_initial_state_dma_matches_slot_stream():
    """The folded sampler's initial state arrives in ANY (HBM) and DMAs
    straight into the state scratch (a VMEM input window for it
    overflowed scoped VMEM by 6.1M at n=21/pop-16 in the production
    prefix-cached sweep).  Same uniforms + same init -> same sampled
    energies as the slot-kernel sampler, whose init rides a VMEM
    window: the DMA placement must be value-invisible."""
    from queasars_tpu.sim.pallas_kernels import pallas_sampled_shot_energies

    n, shots, pop = 14, 512, 2
    packed, pipe = _workload(n, 2, pop=pop, seed=23)
    rng = np.random.default_rng(29)
    raw = rng.normal(size=(pop, 2, 1 << n)).astype(np.float32)
    norm = np.sqrt((raw**2).sum(axis=(1, 2), keepdims=True))
    initial = jnp.asarray(raw / norm)
    table = jnp.asarray(rng.normal(size=1 << n).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(31), pop)
    frac = jnp.stack([jax.random.uniform(k, (shots,), jnp.float32) for k in keys])

    got = np.asarray(
        pallas_sampled_shot_energies_folded(
            pipe, table, frac, n, shots, interpret=True, initial=initial
        )
    )
    want = np.asarray(
        pallas_sampled_shot_energies(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            table, frac, n, shots, interpret=True, initial=initial,
        )
    )
    # identical draws; the dense random init amplifies the f32
    # fold-vs-slot state difference enough to move the rare boundary
    # draw, so assert the stream-agreement rate like the slot-kernel
    # stream test does (and that every draw is a real table energy)
    assert (got == want).mean() > 0.99
    assert np.isin(got, np.asarray(table)).all()


def test_chunked_group_matmuls_match_engine(monkeypatch):
    """Past n=21 the kernels bound their Gauss temporaries: the lane
    group runs row-chunked and the top group splits into two sub-kron
    contractions.  Shrinking the thresholds exercises those exact code
    paths at interpreter-friendly sizes (n=16 -> lane chunks, 2-bit top
    group split 1+1 with strided sub-chunks)."""
    from queasars_tpu.sim import pallas_fold_kernels as pfk

    monkeypatch.setattr(pfk, "_WHOLE_STATE_MAX_ROWS", 256)
    monkeypatch.setattr(pfk, "_LANE_CHUNK_ROWS", 128)
    monkeypatch.setattr(pfk, "_TOP_SUB_CHUNK_ROWS", 128)
    n = 16
    packed, pipe = _workload(n, 2, pop=2, seed=13)
    got = np.asarray(pallas_population_probs_folded(pipe, n, interpret=True))
    want = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_bf16x3_precision_within_gate():
    """precision="high" (emulated bf16x3 — Mosaic has no HIGH lowering)
    must stay well within the 1e-5 engine gate on a full circuit."""
    n = 12
    packed, pipe = _workload(n, 3, pop=3, seed=17)
    got = np.asarray(
        pallas_population_probs_folded(pipe, n, precision="high", interpret=True)
    )
    want = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mxu_fold_enablement_predicate(monkeypatch):
    """The production dispatch (optim/objective.py) engages the folded
    kernels by default but only on a supported platform/size, and both
    the knob and the env var can veto it."""
    from queasars_tpu.optim.objective import mxu_fold_enabled

    # default ON, but gated on fold_supported: this test runs on the CPU
    # backend, where the folded TPU kernels never engage
    monkeypatch.delenv("QUEASARS_MXU", raising=False)
    assert mxu_fold_enabled(None, 20) is False
    assert mxu_fold_enabled(True, 20) is False
    # explicit False wins over the env var
    monkeypatch.setenv("QUEASARS_MXU", "1")
    assert mxu_fold_enabled(False, 20) is False
    # env opt-out wins over the default
    monkeypatch.setenv("QUEASARS_MXU", "0")
    assert mxu_fold_enabled(None, 20) is False


def test_fold_supported_ranges():
    from queasars_tpu.sim.pallas_fold_kernels import fold_supported

    assert fold_supported(20, "tpu")
    assert fold_supported(7, "tpu")
    assert not fold_supported(6, "tpu")   # below one lane group
    # the exact/probs kernels reach two qubits past the slot kernels
    # (chunked group matmuls past n=21, see _apply_kron_layer)
    assert fold_supported(21, "tpu")
    assert fold_supported(22, "tpu")
    assert not fold_supported(23, "tpu")  # 2x64 MB planes exceed VMEM
    # the in-VMEM sampler epilogue caps at n=21: n=22 is a measured
    # compiler impossibility (177 MB of register spills, 226M/128M VMEM
    # after a 28-min compile — experiments/exp_sampler_n22.py); its
    # shot path runs folded probs + XLA-side sampling instead
    assert fold_supported(20, "tpu", "sampler")
    assert fold_supported(21, "tpu", "sampler")
    assert not fold_supported(22, "tpu", "sampler")
    assert fold_supported(20, "tpu", "sweep")
    assert not fold_supported(21, "tpu", "sweep")
    assert not fold_supported(20, "cpu")
