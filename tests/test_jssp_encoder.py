"""Exhaustive-spectrum oracle tests for the JSSP domain-wall encoder.

Port of the reference's gold fidelity tests
(test/job_shop_scheduling/test_domain_wall_hamiltonian_encoder.py:14-124):
every 2^n basis state is decoded and its energy classified — encoding
violations >= encoding penalty, JSSP constraint violations >= constraint
penalty, valid schedules <= max_opt_value with strict energy ordering by
makespan class.  The energy oracle here is the f64 host diagonal table
(replacing qiskit's ``_evaluate_sparsepauli``).
"""

import numpy as np
import pytest

from queasars_tpu.paulis import diagonal_energy_table
from queasars_tpu.problems.jssp import JSSPDomainWallHamiltonianEncoder
from queasars_tpu.problems.jssp.exact_solver import solve_jssp_exact

from tests.jssp_fixtures import problem_instance


def test_raises_for_too_small_timelimit():
    with pytest.raises(ValueError):
        encoder = JSSPDomainWallHamiltonianEncoder(jssp_instance=problem_instance(), makespan_limit=1)
        encoder.get_problem_hamiltonian()


def test_n_qubits_matches_hamiltonian():
    encoder = JSSPDomainWallHamiltonianEncoder(jssp_instance=problem_instance(), makespan_limit=3)
    hamiltonian = encoder.get_problem_hamiltonian()
    assert encoder.n_qubits == hamiltonian.n_qubits
    assert hamiltonian.is_diagonal


def test_encoding_constraint_energy_level():
    penalty = 100
    encoder = JSSPDomainWallHamiltonianEncoder(
        jssp_instance=problem_instance(),
        makespan_limit=4,
        encoding_penalty=penalty,
        overlap_constraint_penalty=0,
        precedence_constraint_penalty=0,
        max_opt_value=0,
    )
    table = diagonal_energy_table(encoder.get_problem_hamiltonian())
    n = encoder.n_qubits
    for state in range(2**n):
        result = encoder.translate_result_state(state)
        encoding_broken = any(
            not op.is_scheduled for ops in result.schedule.values() for op in ops
        )
        if encoding_broken:
            assert table[state] >= penalty, (
                f"state {state} has energy {table[state]} below the encoding penalty {penalty}"
            )


def test_jssp_constraint_energy_level():
    penalty = 100
    encoder = JSSPDomainWallHamiltonianEncoder(
        jssp_instance=problem_instance(),
        makespan_limit=4,
        encoding_penalty=0,
        overlap_constraint_penalty=penalty,
        precedence_constraint_penalty=penalty,
        max_opt_value=0,
    )
    table = diagonal_energy_table(encoder.get_problem_hamiltonian())
    n = encoder.n_qubits
    for state in range(2**n):
        result = encoder.translate_result_state(state)
        encoding_broken = any(
            not op.is_scheduled for ops in result.schedule.values() for op in ops
        )
        if (not result.is_valid) and (not encoding_broken):
            assert table[state] >= penalty, (
                f"state {state} has energy {table[state]} below the constraint penalty {penalty}"
            )


def test_optimization_energy_level():
    optimization_value = 100
    encoder = JSSPDomainWallHamiltonianEncoder(
        jssp_instance=problem_instance(),
        makespan_limit=4,
        encoding_penalty=0,
        overlap_constraint_penalty=0,
        precedence_constraint_penalty=0,
        max_opt_value=optimization_value,
        opt_all_operations_share=0,
    )
    table = diagonal_energy_table(encoder.get_problem_hamiltonian())
    n = encoder.n_qubits

    energy_per_makespan: dict[int, list[float]] = {2: [], 3: [], 4: []}
    for state in range(2**n):
        result = encoder.translate_result_state(state)
        if result.is_valid:
            assert table[state] <= optimization_value + 1e-9
            energy_per_makespan[result.makespan].append(table[state])

    assert max(energy_per_makespan[2]) < min(energy_per_makespan[3])
    assert max(energy_per_makespan[3]) < min(energy_per_makespan[4])


def test_full_hamiltonian_minimum_is_an_optimal_schedule():
    """The global minimum of the default-penalty Hamiltonian decodes to a
    valid schedule achieving the exact-solver's optimal makespan."""
    instance = problem_instance()
    encoder = JSSPDomainWallHamiltonianEncoder(jssp_instance=instance, makespan_limit=4)
    table = diagonal_energy_table(encoder.get_problem_hamiltonian())
    best_state = int(np.argmin(table))
    result = encoder.translate_result_state(best_state)
    assert result.is_valid
    oracle = solve_jssp_exact(instance, makespan_limit=4)
    assert oracle is not None and oracle.is_valid
    assert result.makespan == oracle.makespan == 2


def test_bitstring_translation_round_trip():
    encoder = JSSPDomainWallHamiltonianEncoder(jssp_instance=problem_instance(), makespan_limit=3)
    n = encoder.n_qubits
    with pytest.raises(ValueError):
        encoder.translate_result_bitstring("0" * (n + 1))
    with pytest.raises(ValueError):
        encoder.translate_result_bitstring("2" * n)
    for state in (0, 1, (1 << n) - 1):
        bitstring = format(state, f"0{n}b")
        via_string = encoder.translate_result_bitstring(bitstring)
        via_state = encoder.translate_result_state(state)
        assert repr(via_string) == repr(via_state)


def test_early_start_term_share():
    """opt_all_operations_share diverts optimization weight to early starts;
    the expectation bounds must still hold."""
    encoder = JSSPDomainWallHamiltonianEncoder(
        jssp_instance=problem_instance(),
        makespan_limit=4,
        encoding_penalty=0,
        overlap_constraint_penalty=0,
        precedence_constraint_penalty=0,
        max_opt_value=50,
        opt_all_operations_share=0.5,
    )
    table = diagonal_energy_table(encoder.get_problem_hamiltonian())
    n = encoder.n_qubits
    for state in range(2**n):
        if encoder.translate_result_state(state).is_valid:
            assert -1e-9 <= table[state] <= 50 + 1e-9
