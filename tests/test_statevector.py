"""Statevector engine tests against dense numpy oracles.

Mirrors the reference's fidelity stance (qiskit-aer as exact oracle): here
the oracle is explicit kron-built dense unitaries in complex128.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from queasars_tpu.paulis import PauliSum, diagonal_energy_table
from queasars_tpu.sim import (
    GATE_CROT,
    GATE_CTRL,
    GATE_ID,
    GATE_ROT,
    apply_circuit,
    simulate_circuits,
    cvar_expectation_from_probs,
    expectation_from_probs,
    general_pauli_expectation,
)
from queasars_tpu.sim.sampling import empirical_probs, quasi_distribution, sample_counts

import jax


def u3_dense(theta, phi, lam):
    return np.array(
        [
            [np.cos(theta / 2), -np.exp(1j * lam) * np.sin(theta / 2)],
            [np.exp(1j * phi) * np.sin(theta / 2), np.exp(1j * (phi + lam)) * np.cos(theta / 2)],
        ],
        dtype=np.complex128,
    )


def embed(op2, qubit, n):
    """Single-qubit operator on ``qubit`` (bit q = qubit q, little-endian)."""
    out = np.array([[1.0 + 0j]])
    for q in range(n - 1, -1, -1):
        out = np.kron(out, op2 if q == qubit else np.eye(2))
    return out


def cu3_dense(theta, phi, lam, control, target, n):
    p0 = np.array([[1, 0], [0, 0]], dtype=np.complex128)
    p1 = np.array([[0, 0], [0, 1]], dtype=np.complex128)
    return embed(p0, control, n) + embed(p1, control, n) @ embed(u3_dense(theta, phi, lam), target, n)


def dense_layer(gate_types, controls, angles, n):
    u = np.eye(1 << n, dtype=np.complex128)
    for q in range(n):
        if gate_types[q] == GATE_ROT:
            u = embed(u3_dense(*angles[q]), q, n) @ u
        elif gate_types[q] == GATE_CROT:
            u = cu3_dense(*angles[q], control=controls[q], target=q, n=n) @ u
    return u


def random_genome(rng, n, layers):
    """Random valid genome tensors (one CROT pair or ROT/ID per slot)."""
    gate_types = np.zeros((layers, n), dtype=np.int32)
    controls = np.full((layers, n), -1, dtype=np.int32)
    angles = rng.uniform(0, 2 * np.pi, size=(layers, n, 3)).astype(np.float32)
    for l in range(layers):
        qubits = list(rng.permutation(n))
        while len(qubits) >= 2 and rng.random() < 0.7:
            t, c = qubits.pop(), qubits.pop()
            gate_types[l, t] = GATE_CROT
            controls[l, t] = c
            gate_types[l, c] = GATE_CTRL
        for q in qubits:
            gate_types[l, q] = rng.choice([GATE_ID, GATE_ROT])
    return gate_types, controls, angles


def test_single_rotation_analytic():
    theta = 1.234
    gate_types = np.array([[GATE_ROT]], dtype=np.int32)
    controls = np.array([[-1]], dtype=np.int32)
    angles = np.array([[[theta, 0.0, 0.0]]], dtype=np.float32)
    state = np.asarray(
        apply_circuit(gate_types, controls, angles, np.array([True]), n_qubits=1)
    )
    np.testing.assert_allclose(state, [np.cos(theta / 2), np.sin(theta / 2)], atol=1e-6)


def test_crot_controlled_behaviour():
    # control qubit 0 stays |0> -> CU3 on target 1 must do nothing
    n = 2
    gate_types = np.array([[GATE_CTRL, GATE_CROT]], dtype=np.int32)
    controls = np.array([[-1, 0]], dtype=np.int32)
    angles = np.full((1, n, 3), 0.7, dtype=np.float32)
    state = np.asarray(apply_circuit(gate_types, controls, angles, np.array([True]), n_qubits=n))
    np.testing.assert_allclose(state, [1, 0, 0, 0], atol=1e-6)

    # flip control with a ROT(pi) first -> CU3 acts
    gate_types = np.array([[GATE_ROT, GATE_ID], [GATE_CTRL, GATE_CROT]], dtype=np.int32)
    controls = np.array([[-1, -1], [-1, 0]], dtype=np.int32)
    angles = np.zeros((2, n, 3), dtype=np.float32)
    angles[0, 0, 0] = np.pi
    theta = 0.9
    angles[1, 1] = [theta, 0.0, 0.0]
    state = np.asarray(
        apply_circuit(gate_types, controls, angles, np.array([True, True]), n_qubits=n)
    )
    # |psi> = |1>_q0 (cos t/2 |0> + sin t/2 |1>)_q1
    expected = np.zeros(4, dtype=np.complex128)
    expected[0b01] = np.cos(theta / 2)
    expected[0b11] = np.sin(theta / 2)
    np.testing.assert_allclose(state, expected, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_circuit_matches_dense_oracle(seed):
    rng = np.random.default_rng(seed)
    n, layers = 4, 3
    gate_types, controls, angles = random_genome(rng, n, layers)
    state = np.asarray(
        apply_circuit(gate_types, controls, angles, np.ones(layers, bool), n_qubits=n)
    )
    psi = np.zeros(1 << n, dtype=np.complex128)
    psi[0] = 1.0
    for l in range(layers):
        psi = dense_layer(gate_types[l], controls[l], angles[l].astype(np.float64), n) @ psi
    np.testing.assert_allclose(state, psi, atol=1e-5)
    np.testing.assert_allclose(np.sum(np.abs(state) ** 2), 1.0, atol=1e-5)


def test_layer_mask_padding():
    rng = np.random.default_rng(3)
    n, layers = 3, 4
    gate_types, controls, angles = random_genome(rng, n, layers)
    mask_full = np.array([True, True, False, False])
    state_padded = np.asarray(apply_circuit(gate_types, controls, angles, mask_full, n_qubits=n))
    state_short = np.asarray(
        apply_circuit(gate_types[:2], controls[:2], angles[:2], np.ones(2, bool), n_qubits=n)
    )
    np.testing.assert_allclose(state_padded, state_short, atol=1e-6)


def test_batched_simulation_matches_single():
    rng = np.random.default_rng(4)
    n, layers, batch = 3, 2, 5
    genomes = [random_genome(rng, n, layers) for _ in range(batch)]
    gate_types = np.stack([g[0] for g in genomes])
    controls = np.stack([g[1] for g in genomes])
    angles = np.stack([g[2] for g in genomes])
    mask = np.ones((batch, layers), bool)
    states = np.asarray(simulate_circuits(gate_types, controls, angles, mask, n_qubits=n))
    assert states.shape == (batch, 2, 1 << n)
    for b in range(batch):
        single = np.asarray(
            apply_circuit(gate_types[b], controls[b], angles[b], mask[b], n_qubits=n)
        )
        np.testing.assert_allclose(states[b, 0] + 1j * states[b, 1], single, atol=1e-6)


def test_probabilities_shape_and_norm():
    rng = np.random.default_rng(11)
    n, layers, batch = 3, 2, 4
    genomes = [random_genome(rng, n, layers) for _ in range(batch)]
    from queasars_tpu.sim import probabilities

    probs = np.asarray(
        probabilities(
            np.stack([g[0] for g in genomes]),
            np.stack([g[1] for g in genomes]),
            np.stack([g[2] for g in genomes]),
            np.ones((batch, layers), bool),
            n_qubits=n,
        )
    )
    assert probs.shape == (batch, 1 << n)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)


def test_initial_state_prepend():
    n = 2
    initial = np.array([0, 0, 0, 1], dtype=np.complex64)  # |11>
    gate_types = np.array([[GATE_ID, GATE_ID]], dtype=np.int32)
    controls = np.full((1, 2), -1, dtype=np.int32)
    angles = np.zeros((1, 2, 3), dtype=np.float32)
    state = np.asarray(
        apply_circuit(gate_types, controls, angles, np.array([True]), n_qubits=n, initial_state=initial)
    )
    np.testing.assert_allclose(state, initial, atol=1e-7)


# ---------------------------------------------------------------------------
# expectation
# ---------------------------------------------------------------------------


def reference_cvar(probs, energies, alpha):
    """Direct transliteration of the reference's sequential accumulation
    (expectation_calculation.py:14-32) as a python oracle."""
    order = np.argsort(energies, kind="stable")
    gathered, expectation = 0.0, 0.0
    for i in order:
        p = min(alpha - gathered, probs[i])
        expectation += p * energies[i]
        gathered += p
        if np.isclose(gathered, alpha):
            break
    return expectation / alpha


@pytest.mark.parametrize("alpha", [1.0, 0.5, 0.1])
def test_cvar_matches_reference_oracle(alpha):
    rng = np.random.default_rng(5)
    dim = 32
    probs = rng.dirichlet(np.ones(dim)).astype(np.float32)
    energies = rng.normal(size=dim).astype(np.float32)
    order = np.argsort(energies, kind="stable")
    got = float(
        cvar_expectation_from_probs(
            jnp.asarray(probs), jnp.asarray(energies[order]), jnp.asarray(order), alpha
        )
    )
    want = reference_cvar(probs, energies, alpha)
    assert got == pytest.approx(want, abs=1e-5)


def test_plain_expectation():
    rng = np.random.default_rng(6)
    probs = rng.dirichlet(np.ones(16)).astype(np.float32)
    energies = rng.normal(size=16).astype(np.float32)
    got = float(expectation_from_probs(jnp.asarray(probs), jnp.asarray(energies)))
    assert got == pytest.approx(float(probs @ energies), abs=1e-6)


def test_general_pauli_expectation_vs_dense():
    rng = np.random.default_rng(7)
    n = 3
    labels = ["XZI", "IYZ", "ZZZ", "XXI"]
    coeffs = rng.normal(size=len(labels))
    op = PauliSum.sum([PauliSum.from_label(lb, c) for lb, c in zip(labels, coeffs)])

    gate_types, controls, angles = random_genome(rng, n, 2)
    psi = np.asarray(apply_circuit(gate_types, controls, angles, np.ones(2, bool), n_qubits=n))

    got = float(
        general_pauli_expectation(
            jnp.asarray(psi),
            jnp.asarray(op.coeffs.astype(np.complex64)),
            jnp.asarray(op.z[:, 0].astype(np.uint32)),
            jnp.asarray(op.x[:, 0].astype(np.uint32)),
        )
    )
    want = float(np.real(psi.conj() @ op.to_dense_matrix() @ psi))
    assert got == pytest.approx(want, abs=1e-4)

    # real-pair (TPU-safe) variant agrees
    from queasars_tpu.sim import general_pauli_expectation_real

    state2 = np.stack([psi.real, psi.imag]).astype(np.float32)
    got_real = float(
        general_pauli_expectation_real(
            jnp.asarray(state2),
            jnp.asarray(op.coeffs.real.astype(np.float32)),
            jnp.asarray(op.coeffs.imag.astype(np.float32)),
            jnp.asarray(op.z[:, 0].astype(np.uint32)),
            jnp.asarray(op.x[:, 0].astype(np.uint32)),
        )
    )
    assert got_real == pytest.approx(want, abs=1e-4)


def test_diagonal_expectation_consistency():
    """For diagonal ops, |psi|^2 @ table == general pauli expectation."""
    rng = np.random.default_rng(8)
    n = 3
    op = PauliSum.sum(
        [PauliSum.from_label("".join(rng.choice(["I", "Z"]) for _ in range(n)), rng.normal()) for _ in range(4)]
    )
    gate_types, controls, angles = random_genome(rng, n, 2)
    psi = np.asarray(apply_circuit(gate_types, controls, angles, np.ones(2, bool), n_qubits=n))
    probs = np.abs(psi) ** 2
    table = diagonal_energy_table(op, dtype=np.float32)
    via_table = float(probs @ table)
    via_dense = float(np.real(psi.conj() @ op.to_dense_matrix() @ psi))
    assert via_table == pytest.approx(via_dense, abs=1e-4)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def test_sampling_statistics():
    key = jax.random.PRNGKey(0)
    probs = jnp.asarray(np.array([0.5, 0.0, 0.25, 0.25], dtype=np.float32))
    counts = np.asarray(sample_counts(key, probs, shots=4096))
    assert counts.sum() == 4096
    assert counts[1] == 0
    emp = np.asarray(empirical_probs(key, probs, shots=4096))
    np.testing.assert_allclose(emp, np.asarray(probs), atol=0.05)


def test_quasi_distribution_sparsity():
    dist = quasi_distribution(np.array([0.5, 0.0, 0.5, 0.0]))
    assert dist == {0: 0.5, 2: 0.5}
