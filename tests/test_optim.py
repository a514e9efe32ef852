"""Batched optimizer tests: NFT exactness on sinusoids, SPSA improvement,
termination checker semantics, COBYLA parity path."""

import numpy as np
import pytest

from queasars_tpu.genome import EVQEIndividual, EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim import (
    BatchedNFT,
    BatchedSPSA,
    NFTConfig,
    ScipyCobyla,
    SPSAConfig,
    SPSATerminationChecker,
)
from queasars_tpu.paulis import PauliSum, pauli_z_string
from queasars_tpu.sim.evaluators import (
    SamplerExpectationEvaluator,
    StatevectorExpectationEvaluator,
)

from tests.test_evaluators import rotation_individual


def all_z(n):
    return PauliSum.sum([pauli_z_string(q, n) for q in range(n)])


def full_coords(packed):
    coords = np.stack([packed.param_coordinates(i) for i in range(packed.n_individuals)])
    n_free = packed.n_params.copy()
    return coords, n_free


def test_nft_single_step_exact_on_sinusoid():
    """The Z-expectation of one U3 angle is an exact sinusoid; NFT must jump
    to the global minimum (-1) in one parameter update."""
    evaluator = StatevectorExpectationEvaluator(pauli_z_string(0, 1))
    packed = PackedPopulation.pack([rotation_individual(0.3)])
    coords = packed.param_coordinates(0)[None, :1]  # just theta
    angles, energies, nfev = BatchedNFT(NFTConfig(maxiter=1)).minimize(
        evaluator, packed, coords, np.array([1]), np.array([True])
    )
    assert energies[0] == pytest.approx(-1.0, abs=1e-5)
    # the recycled-minimum prediction matches a fresh evaluation
    fresh = evaluator.evaluate_packed(packed, angles=angles)
    assert fresh[0] == pytest.approx(-1.0, abs=1e-5)
    assert nfev == 3  # 2 per step + 1 reset


def test_nft_population_mixed_structures():
    """Individuals with different layer/param counts optimize in lock-step;
    inactive individuals stay untouched."""
    n = 3
    evaluator = StatevectorExpectationEvaluator(all_z(n))
    pop = EVQEPopulation.random_population(n, 2, 6, True, random_seed=9)
    packed = PackedPopulation.pack(list(pop.individuals))
    coords_list = [packed.param_coordinates(i) for i in range(6)]
    k_max = max(c.shape[0] for c in coords_list)
    coords = np.zeros((6, k_max, 3), np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
    n_free = packed.n_params.copy()
    active = np.array([True, True, True, True, False, False])

    before = np.asarray(evaluator.evaluate_packed(packed))
    angles, energies, _ = BatchedNFT(NFTConfig(maxiter=20)).minimize(
        evaluator, packed, coords, n_free, active
    )
    after = np.asarray(evaluator.evaluate_packed(packed, angles=angles))

    # active individuals strictly improved (directional assertion, like the
    # reference operator tests, test_evqe_operators.py:91-93)
    assert after[active].sum() < before[active].sum()
    # inactive angles unchanged
    np.testing.assert_array_equal(angles[~active], packed.angles[~active])
    # the scan's recycled energies match fresh evaluations (noiseless)
    np.testing.assert_allclose(energies[active], after[active], atol=1e-4)


def test_nft_with_sampler_objective():
    evaluator = SamplerExpectationEvaluator(all_z(2), shots=2048, seed=3)
    packed = PackedPopulation.pack([rotation_individual(0.4, n_qubits=2)])
    coords, n_free = full_coords(packed)
    angles, _, _ = BatchedNFT(NFTConfig(maxiter=12)).minimize(
        evaluator, packed, coords, n_free, np.array([True]), seed=4
    )
    exact = StatevectorExpectationEvaluator(all_z(2))
    assert exact.evaluate_packed(packed, angles=angles)[0] < -1.5  # near -2 optimum


def test_spsa_improves():
    n = 2
    evaluator = StatevectorExpectationEvaluator(all_z(n))
    packed = PackedPopulation.pack([rotation_individual(0.4, n_qubits=n)])
    coords, n_free = full_coords(packed)
    before = evaluator.evaluate_packed(packed)[0]
    angles, energies, nfev = BatchedSPSA(SPSAConfig(maxiter=60, learning_rate=0.3)).minimize(
        evaluator, packed, coords, n_free, np.array([True]), seed=5
    )
    assert energies[0] < before
    assert nfev == 120


def test_spsa_calibration_path():
    n = 2
    evaluator = StatevectorExpectationEvaluator(all_z(n))
    packed = PackedPopulation.pack([rotation_individual(0.4, n_qubits=n)])
    coords, n_free = full_coords(packed)
    angles, energies, nfev = BatchedSPSA(
        SPSAConfig(maxiter=40, learning_rate=None, calibration_steps=10)
    ).minimize(evaluator, packed, coords, n_free, np.array([True]), seed=6)
    assert nfev == 2 * 10 + 2 * 40
    assert energies[0] < evaluator.evaluate_packed(packed)[0]


def test_spsa_with_termination_checker():
    n = 2
    evaluator = StatevectorExpectationEvaluator(all_z(n))
    packed = PackedPopulation.pack([rotation_individual(0.4, n_qubits=n)])
    coords, n_free = full_coords(packed)
    checker = SPSATerminationChecker(
        minimum_relative_change=0.5, allowed_consecutive_violations=0, maxfev=None
    )
    angles, energies, nfev = BatchedSPSA(SPSAConfig(maxiter=200, learning_rate=0.05)).minimize(
        evaluator, packed, coords, n_free, np.array([True]),
        seed=7, termination_checkers=[checker],
    )
    # loose threshold terminates early
    assert nfev < 400
    assert checker.best_function_value <= energies[0] + 1e-6
    assert checker.best_parameter_values.shape == packed.angles[0].shape


def test_termination_checker_semantics():
    checker = SPSATerminationChecker(minimum_relative_change=0.01, allowed_consecutive_violations=1)
    x = np.zeros(2)
    # big changes: no termination
    assert not checker.termination_check(2, x, 100.0, 0.1, True)
    assert not checker.termination_check(4, x, 50.0, 0.1, True)
    # two consecutive tiny relative changes -> terminate on the second
    assert not checker.termination_check(6, x, 49.9999, 0.1, True)
    assert checker.termination_check(8, x, 49.9998, 0.1, True)
    # reuse resets state (nfev went backwards)
    assert not checker.termination_check(2, x, 10.0, 0.1, True)
    # maxfev cap
    capped = SPSATerminationChecker(0.001, 0, maxfev=4)
    assert not capped.termination_check(2, x, 1.0, 0.1, True)
    assert capped.termination_check(4, x, 0.9, 0.1, True)
    # not-accepted iterations are ignored
    ignored = SPSATerminationChecker(0.9, 0)
    assert not ignored.termination_check(2, x, 1.0, 0.1, True)
    assert not ignored.termination_check(4, x, 1.0, 0.1, False)


def test_cobyla_parity_path():
    evaluator = StatevectorExpectationEvaluator(pauli_z_string(0, 1))
    packed = PackedPopulation.pack([rotation_individual(0.3)])
    coords, n_free = full_coords(packed)
    angles, energies, nfev = ScipyCobyla().minimize(
        evaluator, packed, coords, n_free, np.array([True])
    )
    assert energies[0] < -0.9
    assert nfev > 0


def test_nft_noop_when_nothing_active():
    evaluator = StatevectorExpectationEvaluator(pauli_z_string(0, 1))
    packed = PackedPopulation.pack([rotation_individual(0.3)])
    coords, n_free = full_coords(packed)
    angles, energies, nfev = BatchedNFT().minimize(
        evaluator, packed, coords, n_free, np.array([False])
    )
    assert nfev == 0
    np.testing.assert_array_equal(angles, packed.angles)
