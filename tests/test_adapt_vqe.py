"""ADAPT-VQE (arXiv:1812.11173) — gradient-screened adaptive ansatz growth.

Beyond-reference capability (the reference implements only E-VQE):
these tests pin the pool-gradient screen against finite differences,
exact-optimum solves on diagonal Hamiltonians, ground-state quality on
TFIM, the eigenstate-start convergence guard, genome export and
determinism.
"""

import numpy as np
import pytest

from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.paulis import pauli_z_string
from queasars_tpu.paulis.diagonal import diagonal_energy_table
from queasars_tpu.problems.spin_chains import transverse_field_ising
from queasars_tpu.sim.statevector import simulate_circuits
from queasars_tpu.solver import (
    AdaptVQEConfiguration,
    AdaptVQEMinimumEigensolver,
    AdaptVQEResult,
)
from queasars_tpu.solver.adapt_vqe import _build_pool, _screen_pool

import jax.numpy as jnp


def _diag_h(n=3):
    return pauli_z_string(0, n) + (pauli_z_string(1, n) * -1.0) + pauli_z_string(2, n)


def _plus_state(n):
    amp = np.float32(2.0 ** (-n / 2.0))
    return np.stack([np.full(1 << n, amp, np.float32), np.zeros(1 << n, np.float32)])


def test_reaches_exact_optimum_on_diagonal_hamiltonian():
    h = _diag_h()
    exact = float(diagonal_energy_table(h).min())
    cfg = AdaptVQEConfiguration(max_depth=5, optimizer_maxiter=80)
    res = AdaptVQEMinimumEigensolver(cfg).compute_minimum_eigenvalue(h)
    assert isinstance(res, AdaptVQEResult)
    assert res.eigenvalue == pytest.approx(exact, abs=1e-3)
    # the greedy picks are the three RY rotations flipping each qubit
    assert {r.candidate for r in res.iterations[:3]} == {"RY(0)", "RY(1)", "RY(2)"}


def test_tfim_ground_state_quality():
    h = transverse_field_ising(4, coupling=1.0, field=1.0)
    exact = float(np.linalg.eigvalsh(h.to_dense_matrix()).min())
    cfg = AdaptVQEConfiguration(
        max_depth=10, optimizer_maxiter=150, pool="linear", energy_tolerance=1e-5
    )
    res = AdaptVQEMinimumEigensolver(cfg).compute_minimum_eigenvalue(h)
    assert res.eigenvalue >= exact - 1e-4  # variational
    assert res.eigenvalue - exact < 0.05


def test_pool_gradients_match_finite_differences():
    n = 3
    h = transverse_field_ising(n, coupling=0.7, field=1.3)
    operands = (
        jnp.asarray(h.coeffs.real.astype(np.float32)),
        jnp.asarray(h.coeffs.imag.astype(np.float32)),
        jnp.asarray(h.z[:, 0].astype(np.uint32)),
        jnp.asarray(h.x[:, 0].astype(np.uint32)),
    )
    rng = np.random.default_rng(7)
    vec = rng.normal(size=(2, 1 << n)).astype(np.float32)
    vec /= np.sqrt((vec**2).sum())
    state = jnp.asarray(vec)
    pool_t, pool_c, pool_a, labels = _build_pool(n, "full")
    grads = np.asarray(
        _screen_pool(
            state, jnp.asarray(pool_t), jnp.asarray(pool_c), jnp.asarray(pool_a),
            operands, n, False,
        )
    )

    # finite differences through the genome engine (one-layer circuits)
    eps = 1e-3
    cr, ci, z, x = (np.asarray(o) for o in operands)

    def energy(theta, k):
        angles = pool_a[k][None, None] * theta     # [1, 1, n, 3]
        s = np.asarray(
            simulate_circuits(
                jnp.asarray(pool_t[k][None, None]),
                jnp.asarray(pool_c[k][None, None]),
                jnp.asarray(angles.astype(np.float32)),
                jnp.ones((1, 1), bool),
                n,
                initial_state=state[None],
            )
        )[0]
        psi = s[0] + 1j * s[1]
        idx = np.arange(1 << n, dtype=np.uint64)
        total = 0.0
        for c_k, z_k, x_k in zip(cr + 1j * ci, z, x):
            signs = 1.0 - 2.0 * (
                np.bitwise_count(idx & np.uint64(z_k)).astype(np.float64) % 2
            )
            total += (c_k * np.vdot(psi * signs, psi[idx ^ np.uint64(x_k)])).real
        return total

    for k in range(len(labels)):
        fd = (energy(eps, k) - energy(-eps, k)) / (2 * eps)
        assert grads[k] == pytest.approx(fd, abs=5e-3), labels[k]


def test_eigenstate_start_converges_immediately():
    h = _diag_h()
    cfg = AdaptVQEConfiguration(max_depth=4, start="zero")
    res = AdaptVQEMinimumEigensolver(cfg).compute_minimum_eigenvalue(h)
    assert res.converged
    assert res.iterations == ()
    # E(|000>) = <Z0> - <Z1> + <Z2> = 1 - 1 + 1
    assert res.eigenvalue == pytest.approx(1.0, abs=1e-6)
    # genome export still yields a valid (identity) individual
    assert len(res.optimal_individual.layers) == 1
    assert res.optimal_individual.parameter_values == ()


def test_genome_export_reproduces_energy():
    h = _diag_h()
    n = h.n_qubits
    cfg = AdaptVQEConfiguration(max_depth=4, optimizer_maxiter=60)
    res = AdaptVQEMinimumEigensolver(cfg).compute_minimum_eigenvalue(h)
    ind = res.optimal_individual
    packed = PackedPopulation.pack([ind])
    state = np.asarray(
        simulate_circuits(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n,
            initial_state=jnp.asarray(_plus_state(n)[None]),
        )
    )[0]
    probs = state[0] ** 2 + state[1] ** 2
    energy = float(probs @ diagonal_energy_table(h, dtype=np.float64))
    assert energy == pytest.approx(res.eigenvalue, abs=1e-5)
    # QASM export of the grown ansatz works
    from queasars_tpu.genome.qasm import individual_to_qasm

    qasm = individual_to_qasm(ind)
    assert "OPENQASM 2.0" in qasm


def test_deterministic():
    h = transverse_field_ising(3, coupling=1.0, field=0.8)
    cfg = AdaptVQEConfiguration(max_depth=5, optimizer_maxiter=40, pool="linear")
    r1 = AdaptVQEMinimumEigensolver(cfg).compute_minimum_eigenvalue(h)
    r2 = AdaptVQEMinimumEigensolver(cfg).compute_minimum_eigenvalue(h)
    assert r1.eigenvalue == r2.eigenvalue
    assert r1.iterations == r2.iterations


def test_pool_shapes_and_labels():
    n = 4
    t, c, a, labels = _build_pool(n, "full")
    # 2n single rotations + 2 * n(n-1) pair gates
    assert len(labels) == 2 * n + 2 * n * (n - 1)
    t, c, a, labels = _build_pool(n, "linear")
    assert len(labels) == 2 * n + 4 * (n - 1)
    t, c, a, labels = _build_pool(n, "single")
    assert len(labels) == 2 * n
    assert a.sum() == len(labels)  # exactly one free angle per candidate


def test_configuration_validation():
    with pytest.raises(ValueError):
        AdaptVQEConfiguration(max_depth=0)
    with pytest.raises(ValueError):
        AdaptVQEConfiguration(pool="nope")
    with pytest.raises(ValueError):
        AdaptVQEConfiguration(start="one")
    with pytest.raises(ValueError):
        AdaptVQEConfiguration(learning_rate=0.0)
    with pytest.raises(ValueError):
        AdaptVQEConfiguration(gradient_tolerance=-1.0)


def test_evaluation_ledger_counts():
    h = _diag_h()
    cfg = AdaptVQEConfiguration(max_depth=3, optimizer_maxiter=10, pool="single")
    res = AdaptVQEMinimumEigensolver(cfg).compute_minimum_eigenvalue(h)
    n_pool = 2 * h.n_qubits
    grown = len(res.iterations)
    # 1 initial energy + one screen per loop entry (a converged loop
    # screens once more without growing) + 2*maxiter per growth
    screens = grown + (1 if res.converged else 0)
    expected = 1 + screens * n_pool + grown * 2 * 10
    assert res.n_circuit_evaluations == expected


def test_mesh_sharded_screen_matches_single_device():
    """The pool screen sharded over the 8-device mesh is bit-identical
    per candidate to the single-device screen (the candidate axis is
    embarrassingly parallel — no collective, no reduction reorder), and
    a mesh solve reproduces the unsharded solve."""
    import jax

    from queasars_tpu.parallel import population_mesh
    from queasars_tpu.solver.adapt_vqe import _screen_pool_sharded

    n = 4
    h = transverse_field_ising(n, coupling=0.9, field=1.1)
    operands = (
        jnp.asarray(h.coeffs.real.astype(np.float32)),
        jnp.asarray(h.coeffs.imag.astype(np.float32)),
        jnp.asarray(h.z[:, 0].astype(np.uint32)),
        jnp.asarray(h.x[:, 0].astype(np.uint32)),
    )
    pool_t, pool_c, pool_a, labels = _build_pool(n, "full")
    pool_t, pool_c, pool_a = map(jnp.asarray, (pool_t, pool_c, pool_a))
    amp = np.float32(2.0 ** (-n / 2.0))
    state = jnp.asarray(
        np.stack([np.full(1 << n, amp, np.float32), np.zeros(1 << n, np.float32)])
    )
    single = np.asarray(_screen_pool(state, pool_t, pool_c, pool_a, operands, n, False))
    # the full pool (2n + 4*n*(n-1)/2*2 candidates) is not a multiple of
    # 8, so the padding path is exercised too
    sharded = np.asarray(
        _screen_pool_sharded(
            population_mesh(8), state, pool_t, pool_c, pool_a, operands, n, False
        )
    )
    assert sharded.shape == (len(labels),)
    np.testing.assert_array_equal(single, sharded)

    cfg = dict(max_depth=3, optimizer_maxiter=15, pool="linear")
    plain = AdaptVQEMinimumEigensolver(
        AdaptVQEConfiguration(**cfg)
    ).compute_minimum_eigenvalue(h)
    meshed = AdaptVQEMinimumEigensolver(
        AdaptVQEConfiguration(**cfg, n_devices=8)
    ).compute_minimum_eigenvalue(h)
    assert [it.candidate for it in meshed.iterations] == [it.candidate for it in plain.iterations]
    assert meshed.eigenvalue == pytest.approx(plain.eigenvalue, abs=1e-6)
    assert meshed.n_circuit_evaluations == plain.n_circuit_evaluations
