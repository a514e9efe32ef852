"""Unit tests for the packed-bitmask Pauli-sum algebra.

Oracle strategy: small-n dense matrices built with numpy ``kron`` validate
every algebraic operation, standing in for the Qiskit ``SparsePauliOp``
semantics the reference relies on (queasars/utility/pauli_strings.py).
"""

import numpy as np
import pytest

from queasars_tpu.paulis import (
    PauliSum,
    pauli_identity_string,
    pauli_z_string,
    diagonal_energy_table,
    diagonal_energy_table_device,
)

I2 = np.eye(2, dtype=np.complex128)
X = np.array([[0, 1], [1, 0]], dtype=np.complex128)
Y = np.array([[0, -1j], [1j, 0]], dtype=np.complex128)
Z = np.array([[1, 0], [0, -1]], dtype=np.complex128)
MATS = {"I": I2, "X": X, "Y": Y, "Z": Z}


def dense_from_label(label: str) -> np.ndarray:
    """Kron with the leftmost label char as the highest qubit (qiskit order)."""
    out = np.array([[1.0 + 0j]])
    for ch in label:
        out = np.kron(out, MATS[ch])
    return out


@pytest.mark.parametrize("label", ["I", "Z", "X", "Y", "ZZ", "XY", "YX", "IZX", "YYZ", "XIZY"])
def test_from_label_dense(label):
    np.testing.assert_allclose(
        PauliSum.from_label(label).to_dense_matrix(), dense_from_label(label), atol=1e-12
    )


def test_pauli_z_string_position():
    # qubit index counts from the right (reference pauli_strings.py:39)
    op = pauli_z_string(qubit_index=1, n_qubits=3)
    np.testing.assert_allclose(op.to_dense_matrix(), dense_from_label("IZI"), atol=1e-12)


def test_identity_expectation():
    op = pauli_identity_string(4)
    np.testing.assert_allclose(op.to_dense_matrix(), np.eye(16), atol=1e-12)


def test_validation_errors():
    with pytest.raises(ValueError):
        pauli_identity_string(0)
    with pytest.raises(ValueError):
        pauli_z_string(qubit_index=3, n_qubits=3)
    with pytest.raises(ValueError):
        pauli_z_string(qubit_index=-1, n_qubits=3)


@pytest.mark.parametrize(
    "la, lb",
    [("Z", "X"), ("X", "Z"), ("Y", "Z"), ("XY", "ZZ"), ("ZIX", "XYZ"), ("YY", "XZ")],
)
def test_compose_matches_dense(la, lb):
    a, b = PauliSum.from_label(la), PauliSum.from_label(lb)
    np.testing.assert_allclose(
        a.compose(b).to_dense_matrix(),
        dense_from_label(la) @ dense_from_label(lb),
        atol=1e-12,
    )


def test_sum_and_scalar():
    rng = np.random.default_rng(0)
    labels = ["ZZI", "IXZ", "YIZ", "ZZI"]
    coeffs = rng.normal(size=len(labels))
    ops = [PauliSum.from_label(lb, c) for lb, c in zip(labels, coeffs)]
    total = PauliSum.sum(ops) * 2.5
    dense = 2.5 * sum(c * dense_from_label(lb) for lb, c in zip(labels, coeffs))
    np.testing.assert_allclose(total.to_dense_matrix(), dense, atol=1e-12)
    # duplicate ZZI terms must have merged
    assert total.n_terms == 3


def test_simplify_drops_cancelled_terms():
    a = PauliSum.from_label("ZZ")
    diff = a - a
    s = diff.simplify(atol=1e-12)
    assert s.n_terms == 1 and abs(s.coeffs[0]) < 1e-12


def test_equiv():
    a = PauliSum.from_label("ZI") + PauliSum.from_label("IZ")
    b = PauliSum.from_label("IZ") + PauliSum.from_label("ZI")
    assert a.equiv(b)
    assert not a.equiv(PauliSum.from_label("ZZ"))


def test_is_diagonal():
    assert (PauliSum.from_label("ZIZ") + PauliSum.from_label("IZZ")).is_diagonal
    assert not PauliSum.from_label("XII").is_diagonal


def test_diagonal_energy_table_matches_dense():
    rng = np.random.default_rng(1)
    n = 5
    ops = []
    for _ in range(6):
        label = "".join(rng.choice(["I", "Z"]) for _ in range(n))
        ops.append(PauliSum.from_label(label, rng.normal()))
    op = PauliSum.sum(ops)
    table = diagonal_energy_table(op)
    dense_diag = np.diag(op.to_dense_matrix()).real
    np.testing.assert_allclose(table, dense_diag, atol=1e-10)


def test_diagonal_energy_table_device_matches_host():
    rng = np.random.default_rng(2)
    n = 8
    ops = []
    for _ in range(20):
        label = "".join(rng.choice(["I", "Z"]) for _ in range(n))
        ops.append(PauliSum.from_label(label, rng.normal()))
    op = PauliSum.sum(ops)
    host = diagonal_energy_table(op)
    device = np.asarray(diagonal_energy_table_device(op))
    np.testing.assert_allclose(device, host, rtol=1e-5, atol=1e-5)


def test_from_sparse_list():
    op = PauliSum.from_sparse_list([("ZZ", [0, 2], 1.5), ("X", [1], -0.5)], n_qubits=3)
    dense = 1.5 * dense_from_label("ZIZ") - 0.5 * dense_from_label("IXI")
    np.testing.assert_allclose(op.to_dense_matrix(), dense, atol=1e-12)


def test_to_labels_round_trips_through_from_label():
    """to_labels unfolds the stored (-i)^{n_Y} phase so from_label on its
    output reconstructs an equivalent operator — the interop-bundle
    export contract (matrix elements must match what qiskit's
    SparsePauliOp.from_list builds from the same pairs)."""
    op = PauliSum.sum(
        [
            PauliSum.from_label("XYZI", 0.5),
            PauliSum.from_label("YYYY", 1.25 - 0.5j),
            PauliSum.from_label("IZIZ", -2.0),
            PauliSum.from_label("YXIZ", 0.75j),
        ]
    )
    rebuilt = PauliSum.sum(
        [PauliSum.from_label(label, coeff) for label, coeff in op.to_labels()]
    )
    assert rebuilt.equiv(op)
    np.testing.assert_allclose(
        rebuilt.to_dense_matrix(), op.to_dense_matrix(), atol=1e-12
    )
