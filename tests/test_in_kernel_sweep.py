"""Fully-in-kernel last-layer NFT sweep (pallas_nft_layer_sweep).

Interpret-mode validation against the regular scan path: identical NFT
math (polynomial atan2 aside), untouched layers preserved, gating
predicates, determinism.
"""

from __future__ import annotations

import numpy as np

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


def _problem(n_qubits: int = 7, pop: int = 4, layers: int = 3):
    population = EVQEPopulation.random_population(n_qubits, layers, pop, True, random_seed=11)
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
    return packed, coords, n_free, active, last_layer


def test_in_kernel_sweep_matches_scan_path():
    packed, coords, n_free, active, last_layer = _problem()
    op = _diagonal_operator(packed.n_qubits)
    evaluator = StatevectorExpectationEvaluator(op)

    a_scan, e_scan, n_scan = BatchedNFT(
        NFTConfig(maxiter=9, cache_prefix=False)
    ).minimize(evaluator, packed, coords, n_free, active, last_layer=last_layer, seed=3)
    a_k, e_k, n_k = BatchedNFT(
        NFTConfig(maxiter=9, cache_prefix=True, in_kernel_sweep=True)
    ).minimize(evaluator, packed, coords, n_free, active, last_layer=last_layer, seed=3)
    assert n_scan == n_k
    # same outcomes through the evaluator (poly-atan2 rounding aside)
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(packed, angles=a_k)),
        np.asarray(evaluator.evaluate_packed(packed, angles=a_scan)),
        rtol=1e-4, atol=1e-4,
    )
    # last-layer z0 is the exact energy at the final angles
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(packed, angles=a_k)), e_k,
        rtol=1e-4, atol=1e-4,
    )
    # untouched layers preserved bit-exactly
    for i in range(packed.n_individuals):
        for l in range(packed.max_layers):
            if l != last_layer[i]:
                np.testing.assert_array_equal(a_k[i, l], packed.angles[i, l])


def test_in_kernel_sweep_deterministic_and_inactive_preserved():
    packed, coords, n_free, active, last_layer = _problem()
    active = active.copy()
    active[0] = False
    op = _diagonal_operator(packed.n_qubits)
    evaluator = StatevectorExpectationEvaluator(op)

    def run():
        return BatchedNFT(
            NFTConfig(maxiter=6, cache_prefix=True, in_kernel_sweep=True)
        ).minimize(evaluator, packed, coords, n_free, active, last_layer=last_layer)

    a1, e1, _ = run()
    a2, e2, _ = run()
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(a1[0], packed.angles[0])  # inactive untouched
    # inactive individuals report their true (unchanged) energy
    np.testing.assert_allclose(
        e1[0], np.asarray(evaluator.evaluate_packed(packed))[0], rtol=1e-5, atol=1e-5
    )


def test_in_kernel_sweep_crot_layers_and_edge_masks():
    """CROT-heavy genomes and the n_free=0-but-active edge: the kernel's
    control handling and update guards must match the scan path."""
    from queasars_tpu.genome.individual import EVQEIndividual

    rng_seeds = [5, 9, 13, 21]
    individuals = [
        EVQEIndividual.random_individual(7, 2, True, s) for s in rng_seeds
    ]
    packed = PackedPopulation.pack(individuals)
    real_layers = packed.layer_mask.sum(axis=1).astype(np.int32)
    last_layer = real_layers - 1
    coords_list = [packed.layer_param_coordinates(i, -1) for i in range(packed.n_individuals)]
    k_max = max(max(c.shape[0] for c in coords_list), 1)
    coords = np.zeros((packed.n_individuals, k_max, 3), np.int32)
    n_free = np.zeros(packed.n_individuals, np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
        n_free[i] = c.shape[0]
    # force one individual into the "no free parameters but active" edge
    n_free[1] = 0
    active = np.ones(packed.n_individuals, bool)

    op = _diagonal_operator(7, seed=3)
    evaluator = StatevectorExpectationEvaluator(op)
    a_scan, e_scan, _ = BatchedNFT(
        NFTConfig(maxiter=7, cache_prefix=False)
    ).minimize(evaluator, packed, coords, n_free, active, last_layer=last_layer)
    a_k, e_k, _ = BatchedNFT(
        NFTConfig(maxiter=7, cache_prefix=True, in_kernel_sweep=True)
    ).minimize(evaluator, packed, coords, n_free, active, last_layer=last_layer)
    np.testing.assert_allclose(
        np.asarray(evaluator.evaluate_packed(packed, angles=a_k)),
        np.asarray(evaluator.evaluate_packed(packed, angles=a_scan)),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_array_equal(a_k[1], packed.angles[1])  # frozen individual


def test_in_kernel_sweep_gating():
    nft = BatchedNFT(NFTConfig(in_kernel_sweep=True))
    op = _diagonal_operator(6)
    from queasars_tpu.optim.objective import objective_operands

    assert nft._in_kernel_sweep_applies(
        objective_operands(StatevectorExpectationEvaluator(op)), 6
    )
    assert not nft._in_kernel_sweep_applies(
        objective_operands(StatevectorExpectationEvaluator(op, alpha=0.5)), 6
    )
    assert not nft._in_kernel_sweep_applies(
        objective_operands(SamplerExpectationEvaluator(op, shots=64, seed=0)), 6
    )
    assert not nft._in_kernel_sweep_applies(
        objective_operands(StatevectorExpectationEvaluator(op, precision=0.01, seed=0)), 6
    )
    assert not BatchedNFT(
        NFTConfig(in_kernel_sweep=True, five_point=True)
    )._in_kernel_sweep_applies(objective_operands(StatevectorExpectationEvaluator(op)), 6)
    # default (None) requires the Pallas path — off on CPU evaluators
    assert not BatchedNFT(NFTConfig())._in_kernel_sweep_applies(
        objective_operands(StatevectorExpectationEvaluator(op)), 6
    )
    # explicit False always declines
    assert not BatchedNFT(
        NFTConfig(in_kernel_sweep=False)
    )._in_kernel_sweep_applies(objective_operands(StatevectorExpectationEvaluator(op)), 6)


def test_in_kernel_sweep_declines_past_slot_cap_on_tpu():
    """n=21/22 set use_pallas=True through the FOLDED kernels, but the
    in-kernel sweep runs SLOT kernels (cap n=20): on the TPU backend it
    must decline past the cap so the scan path (jnp prefix + folded
    probes) takes over; off-TPU (interpret tests) any size applies."""
    nft = BatchedNFT(NFTConfig(in_kernel_sweep=True))
    op = _diagonal_operator(6)
    from queasars_tpu.optim.objective import objective_operands

    operands = objective_operands(StatevectorExpectationEvaluator(op))
    for n in (21, 22):
        assert not nft._in_kernel_sweep_applies(operands, n, backend="tpu")
        assert nft._in_kernel_sweep_applies(operands, n, backend="cpu")
    assert nft._in_kernel_sweep_applies(operands, 20, backend="tpu")
