"""Direct unit tests for the domain-wall variable encoding
(reference: utility/domain_wall_variables.py:14-170 — there validated only
indirectly through the encoder; here both directly and exhaustively)."""

import numpy as np
import pytest

from queasars_tpu.paulis import diagonal_energy_table
from queasars_tpu.problems.jssp.domain_wall_variables import DomainWallVariable


@pytest.fixture()
def variable():
    # 4 values -> 3 qubits, starting at qubit 1 of a 5-qubit circuit
    return DomainWallVariable(qubit_start_index=1, values=("a", "b", "c", "d"))


def _full(variable, segment):
    """Embed a 3-bit segment into the full 5-qubit circuit bit list."""
    bits = [0] * 5
    bits[variable.qubit_start_index : variable.qubit_start_index + variable.n_qubits] = segment
    return bits


def test_value_decoding(variable):
    # valid domain-wall states: 000 -> a, 100 -> b, 110 -> c, 111 -> d
    assert variable.value_from_bitlist(_full(variable, [0, 0, 0])) == "a"
    assert variable.value_from_bitlist(_full(variable, [1, 0, 0])) == "b"
    assert variable.value_from_bitlist(_full(variable, [1, 1, 0])) == "c"
    assert variable.value_from_bitlist(_full(variable, [1, 1, 1])) == "d"
    # broken walls decode to None (reference :167-168)
    assert variable.value_from_bitlist(_full(variable, [0, 1, 0])) is None
    assert variable.value_from_bitlist(_full(variable, [0, 0, 1])) is None
    assert variable.value_from_bitlist(_full(variable, [1, 0, 1])) is None


def test_viability_term_spectrum(variable):
    """The viability penalty is 0 exactly on intact domain walls and > 0
    otherwise, for every basis state of the enclosing circuit."""
    n = 5
    table = diagonal_energy_table(variable.viability_term(n))
    for state in range(1 << n):
        bits = [(state >> q) & 1 for q in range(5)]
        decodable = variable.value_from_bitlist(bits) is not None
        if decodable:
            assert table[state] == pytest.approx(0.0, abs=1e-9)
        else:
            assert table[state] > 1e-9


def test_value_term_is_indicator(variable):
    """On viable states, each value term is 1 exactly when the variable
    holds that value and 0 for the other values."""
    n = 5
    tables = {
        value: diagonal_energy_table(variable.value_term(value, n))
        for value in variable.values
    }
    for state in range(1 << n):
        bits = [(state >> q) & 1 for q in range(5)]
        held = variable.value_from_bitlist(bits)
        if held is None:
            continue
        for value, table in tables.items():
            expected = 1.0 if value == held else 0.0
            assert table[state] == pytest.approx(expected, abs=1e-9)


def test_value_terms_independent_of_other_qubits(variable):
    """Qubits outside the variable's window never change its terms."""
    n = 5
    table = diagonal_energy_table(variable.value_term("c", n))
    for state in range(1 << variable.n_qubits):
        base = state << variable.qubit_start_index
        flipped = base | 1 | (1 << 4)  # toggle the surrounding qubits
        assert table[base] == pytest.approx(table[flipped], abs=1e-12)
