"""QAOA solver tests (beyond-reference capability).

The simulation is pinned against an independent dense-matrix oracle
(numpy complex128: explicit diag(exp(-i gamma E)) cost unitaries and
kron-built RX mixers), the optimizer against a finite-difference
gradient check, and the solver end-to-end on a MaxCut instance whose
optimum is known by exhaustion.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from queasars_tpu.paulis import PauliSum
from queasars_tpu.paulis.diagonal import diagonal_energy_table, diagonal_energy_table_device
from queasars_tpu.problems import maxcut_hamiltonian
from queasars_tpu.sim.qaoa import qaoa_energies_batch, qaoa_energy, qaoa_state
from queasars_tpu.solver import QAOAConfiguration, QAOAMinimumEigensolver


def _dense_qaoa_oracle(table: np.ndarray, gammas, betas) -> np.ndarray:
    """Independent complex128 QAOA simulation (little-endian indices)."""
    dim = table.shape[0]
    n = dim.bit_length() - 1
    psi = np.full(dim, 1.0 / np.sqrt(dim), dtype=np.complex128)
    for gamma, beta in zip(gammas, betas):
        psi = np.exp(-1j * gamma * table) * psi
        rx = np.array(
            [[np.cos(beta), -1j * np.sin(beta)], [-1j * np.sin(beta), np.cos(beta)]]
        )
        mixer = np.array([[1.0]])
        for _ in range(n):
            mixer = np.kron(mixer, rx)
        psi = mixer @ psi
    return psi


def _random_diagonal_op(n_qubits: int, seed: int) -> PauliSum:
    rng = np.random.default_rng(seed)
    terms = []
    for _ in range(5):
        label = "".join(rng.choice(["I", "Z"], size=n_qubits))
        terms.append(PauliSum.from_label(label, float(rng.normal())))
    return PauliSum.sum(terms)


class TestQAOASimulation:
    def test_state_matches_dense_oracle(self):
        op = _random_diagonal_op(3, seed=7)
        table = diagonal_energy_table(op)
        rng = np.random.default_rng(11)
        gammas = rng.uniform(-1.0, 1.0, size=3)
        betas = rng.uniform(0.0, np.pi, size=3)

        state = qaoa_state(
            jnp.asarray(table, dtype=jnp.float32),
            jnp.asarray(gammas, dtype=jnp.float32),
            jnp.asarray(betas, dtype=jnp.float32),
            3,
        )
        psi = np.asarray(state[0]) + 1j * np.asarray(state[1])
        oracle = _dense_qaoa_oracle(table, gammas, betas)
        np.testing.assert_allclose(psi, oracle, atol=5e-6)
        np.testing.assert_allclose(np.sum(np.abs(psi) ** 2), 1.0, atol=1e-5)

    def test_energy_matches_oracle_expectation(self):
        op = _random_diagonal_op(4, seed=3)
        table = diagonal_energy_table(op)
        gammas = np.array([0.3, -0.2])
        betas = np.array([0.7, 1.1])
        oracle = _dense_qaoa_oracle(table, gammas, betas)
        expected = float(np.sum(np.abs(oracle) ** 2 * table))

        energy = qaoa_energy(
            jnp.asarray(table, dtype=jnp.float32),
            jnp.asarray(gammas, dtype=jnp.float32),
            jnp.asarray(betas, dtype=jnp.float32),
            4,
        )
        assert abs(float(energy) - expected) < 1e-5

    def test_batched_energies_match_single(self):
        op = _random_diagonal_op(3, seed=5)
        table = diagonal_energy_table_device(op)
        rng = np.random.default_rng(2)
        gammas = jnp.asarray(rng.uniform(-1, 1, size=(4, 2)), dtype=jnp.float32)
        betas = jnp.asarray(rng.uniform(0, np.pi, size=(4, 2)), dtype=jnp.float32)
        batch = qaoa_energies_batch(table, gammas, betas, 3)
        singles = [float(qaoa_energy(table, gammas[i], betas[i], 3)) for i in range(4)]
        np.testing.assert_allclose(np.asarray(batch), singles, atol=1e-6)

    def test_gradient_matches_finite_differences(self):
        op = _random_diagonal_op(3, seed=9)
        table = diagonal_energy_table_device(op)

        def energy(params):
            return qaoa_energy(table, params[:2], params[2:], 3)

        params = jnp.asarray([0.2, -0.4, 0.9, 0.3], dtype=jnp.float32)
        grad = np.asarray(jax.grad(energy)(params))
        eps = 1e-3
        for i in range(4):
            shift = jnp.zeros(4).at[i].set(eps)
            fd = (float(energy(params + shift)) - float(energy(params - shift))) / (2 * eps)
            assert abs(grad[i] - fd) < 5e-3


class TestQAOASolver:
    def test_maxcut_ring_reaches_optimum(self):
        # C4 ring: optimal cut = 4 (alternating partition)
        op, offset = maxcut_hamiltonian(4, [(0, 1), (1, 2), (2, 3), (3, 0)])
        table = diagonal_energy_table(op)
        config = QAOAConfiguration(reps=2, n_starts=4, maxiter=120, seed=1)
        result = QAOAMinimumEigensolver(config).compute_minimum_eigenvalue(op)

        assert result.best_bitstring_energy == pytest.approx(float(np.min(table)))
        cut = offset - result.best_bitstring_energy
        assert cut == pytest.approx(4.0)
        # the optimized expectation must beat the uniform-state value (0)
        assert result.eigenvalue < -1.0
        # 2 reference-equivalent evals per Adam step (forward + adjoint,
        # the gradient-family ledger convention) + the final forward pass
        assert result.circuit_evaluations == 4 * (2 * 120 + 1)
        assert len(result.optimal_gammas) == 2 and len(result.optimal_betas) == 2

    def test_shots_path_reproducible_and_consistent(self):
        op, _ = maxcut_hamiltonian(4, [(0, 1), (1, 2), (2, 3), (3, 0)])
        table = diagonal_energy_table(op)
        config = QAOAConfiguration(reps=2, n_starts=2, maxiter=60, shots=256, seed=4)
        solver = QAOAMinimumEigensolver(config)
        r1 = solver.compute_minimum_eigenvalue(op)
        r2 = solver.compute_minimum_eigenvalue(op)

        assert r1.best_bitstring == r2.best_bitstring
        assert r1.eigenstate == r2.eigenstate
        assert r1.best_bitstring_energy == pytest.approx(
            float(table[r1.best_bitstring])
        )
        assert abs(sum(r1.eigenstate.values()) - 1.0) < 1e-9

    def test_optimal_state_matches_distribution(self):
        op, _ = maxcut_hamiltonian(4, [(0, 1), (1, 2), (2, 3), (3, 0)])
        result = QAOAMinimumEigensolver(
            QAOAConfiguration(reps=2, n_starts=2, maxiter=40, seed=6)
        ).compute_minimum_eigenvalue(op)
        assert result.optimal_state.shape == (2, 16)
        probs = result.optimal_state[0] ** 2 + result.optimal_state[1] ** 2
        np.testing.assert_allclose(np.sum(probs), 1.0, atol=1e-5)
        assert int(np.argmax(probs)) == result.best_bitstring

    def test_warm_starts_evqe(self):
        # the QAOA state seeds an EVQE solve via the driver's
        # initial-state prepend (reference circuit_evaluation.py:148-149)
        from queasars_tpu.optim import BatchedNFT, NFTConfig
        from queasars_tpu.solver import (
            ConfiguredEstimator,
            EVQEMinimumEigensolver,
            EVQEMinimumEigensolverConfiguration,
        )

        op, _ = maxcut_hamiltonian(4, [(0, 1), (1, 2), (2, 3), (3, 0)])
        qaoa_result = QAOAMinimumEigensolver(
            QAOAConfiguration(reps=2, n_starts=4, maxiter=80, seed=1)
        ).compute_minimum_eigenvalue(op)

        config = EVQEMinimumEigensolverConfiguration(
            configured_estimator=ConfiguredEstimator(),
            configured_sampler=None,
            optimizer=BatchedNFT(NFTConfig(maxiter=8)),
            optimizer_n_circuit_evaluations=None,
            max_generations=2,
            max_circuit_evaluations=None,
            termination_criterion=None,
            random_seed=0,
            population_size=4,
            speciation_genetic_distance_threshold=2,
            selection_alpha_penalty=0.0,
            selection_beta_penalty=0.0,
            parameter_search_probability=0.3,
            topological_search_probability=0.4,
            layer_removal_probability=0.05,
            use_tournament_selection=True,
            tournament_size=2,
        )
        result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue_with_initial_state(
            op, initial_state=qaoa_result.optimal_state
        )
        # refinement may only improve on the warm start's expectation
        assert result.eigenvalue <= qaoa_result.eigenvalue + 1e-4


class TestShardedQAOA:
    """Amplitude-sharded QAOA on the virtual 8-device CPU mesh."""

    def _op(self):
        return maxcut_hamiltonian(5, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2)])

    def test_sharded_energies_match_single_chip(self):
        from queasars_tpu.paulis.diagonal import diagonal_terms
        from queasars_tpu.sim.qaoa import make_sharded_qaoa_energies_fn, qaoa_energies_batch
        from queasars_tpu.sim.sharded_evaluator import amplitude_mesh
        from queasars_tpu.sim.sharded_statevector import build_device_table

        op, _ = self._op()
        coeffs, z_masks = diagonal_terms(op)
        table_single = diagonal_energy_table_device(op)
        rng = np.random.default_rng(8)
        gammas = jnp.asarray(rng.uniform(-0.5, 0.5, size=(3, 2)), dtype=jnp.float32)
        betas = jnp.asarray(rng.uniform(0, np.pi, size=(3, 2)), dtype=jnp.float32)
        expected = np.asarray(qaoa_energies_batch(table_single, gammas, betas, 5))

        mesh = amplitude_mesh(4)
        table = build_device_table(mesh, coeffs, z_masks, 5)
        energies = make_sharded_qaoa_energies_fn(mesh, 5)(table, gammas, betas)
        np.testing.assert_allclose(np.asarray(energies), expected, atol=2e-6)

    def test_energies_bit_identical_across_factorizations(self):
        from queasars_tpu.paulis.diagonal import diagonal_terms
        from queasars_tpu.sim.qaoa import make_sharded_qaoa_energies_fn
        from queasars_tpu.sim.sharded_evaluator import amplitude_mesh
        from queasars_tpu.sim.sharded_statevector import build_device_table

        op, _ = self._op()
        coeffs, z_masks = diagonal_terms(op)
        rng = np.random.default_rng(13)
        gammas = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 3)), dtype=jnp.float32)
        betas = jnp.asarray(rng.uniform(0, np.pi, size=(2, 3)), dtype=jnp.float32)

        results = []
        for n_dev in (1, 2, 4, 8):
            mesh = amplitude_mesh(n_dev)
            table = build_device_table(mesh, coeffs, z_masks, 5)
            e = make_sharded_qaoa_energies_fn(mesh, 5)(table, gammas, betas)
            results.append(np.asarray(e))
        for other in results[1:]:
            np.testing.assert_array_equal(results[0], other)

    def test_sharded_gradient_matches_single_chip(self):
        from queasars_tpu.paulis.diagonal import diagonal_terms
        from queasars_tpu.sim.qaoa import make_sharded_qaoa_energies_fn, qaoa_energies_batch
        from queasars_tpu.sim.sharded_evaluator import amplitude_mesh
        from queasars_tpu.sim.sharded_statevector import build_device_table

        op, _ = self._op()
        coeffs, z_masks = diagonal_terms(op)
        table_single = diagonal_energy_table_device(op)
        mesh = amplitude_mesh(4)
        table = build_device_table(mesh, coeffs, z_masks, 5)
        fn = make_sharded_qaoa_energies_fn(mesh, 5)

        params = jnp.asarray([[0.2, -0.3, 0.8, 1.1]], dtype=jnp.float32)
        g_sharded = jax.grad(lambda x: jnp.sum(fn(table, x[:, :2], x[:, 2:])))(params)
        g_single = jax.grad(
            lambda x: jnp.sum(qaoa_energies_batch(table_single, x[:, :2], x[:, 2:], 5))
        )(params)
        np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single), atol=5e-5)

    def test_sharded_solve_exact_and_shots(self):
        op, offset = self._op()
        table = diagonal_energy_table(op)
        config = QAOAConfiguration(reps=3, n_starts=4, maxiter=120, seed=2, n_devices=4)
        result = QAOAMinimumEigensolver(config).compute_minimum_eigenvalue(op)
        assert result.best_bitstring_energy == pytest.approx(float(np.min(table)))
        assert result.optimal_state is None
        assert abs(sum(result.eigenstate.values()) - 1.0) < 1e-5

        shot_config = QAOAConfiguration(
            reps=3, n_starts=4, maxiter=120, seed=2, n_devices=4, shots=256
        )
        shot_result = QAOAMinimumEigensolver(shot_config).compute_minimum_eigenvalue(op)
        assert shot_result.best_bitstring_energy == pytest.approx(
            float(table[shot_result.best_bitstring])
        )
        assert abs(sum(shot_result.eigenstate.values()) - 1.0) < 1e-9

    def test_sharded_solve_matches_single_chip_trajectory(self):
        # same seed, same schedule init -> the optimized energies agree
        op, _ = self._op()
        single = QAOAMinimumEigensolver(
            QAOAConfiguration(reps=2, n_starts=3, maxiter=60, seed=5)
        ).compute_minimum_eigenvalue(op)
        sharded = QAOAMinimumEigensolver(
            QAOAConfiguration(reps=2, n_starts=3, maxiter=60, seed=5, n_devices=8)
        ).compute_minimum_eigenvalue(op)
        np.testing.assert_allclose(
            np.asarray(sharded.start_energies), np.asarray(single.start_energies), atol=5e-5
        )
        assert sharded.best_bitstring == single.best_bitstring

    def test_sharded_shots_bit_identical_across_device_counts(self):
        """Round 4 (ADVICE r3): the finalize measurement draws through
        the width-invariant blocked inverse-CDF, so sampled bitstrings
        (and hence the whole shot result) are bit-identical across
        amplitude-mesh device counts."""
        op, _ = self._op()
        results = [
            QAOAMinimumEigensolver(
                QAOAConfiguration(
                    reps=2, n_starts=3, maxiter=60, seed=5, n_devices=d, shots=128
                )
            ).compute_minimum_eigenvalue(op)
            for d in (2, 4, 8)
        ]
        for other in results[1:]:
            assert other.eigenstate == results[0].eigenstate
            assert other.best_bitstring == results[0].best_bitstring
            assert other.best_bitstring_energy == results[0].best_bitstring_energy


class TestQAOAValidation:
    def test_non_diagonal_operator_rejected(self):
        op = PauliSum.from_label("XZ", 1.0)
        with pytest.raises(ValueError, match="diagonal"):
            QAOAMinimumEigensolver(QAOAConfiguration()).compute_minimum_eigenvalue(op)

    def test_configuration_validation(self):
        with pytest.raises(ValueError):
            QAOAConfiguration(reps=0)
        with pytest.raises(ValueError):
            QAOAConfiguration(n_starts=0)
        with pytest.raises(ValueError):
            QAOAConfiguration(shots=0)
