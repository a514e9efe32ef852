"""Encoder spectrum tests with non-unit durations and longer jobs.

Extends the exhaustive-spectrum gate beyond the reference fixture: mixed
processing durations and a 3-operation job, still classified over every
basis state against the exact branch-and-bound oracle.
"""

import numpy as np
import pytest

from queasars_tpu.paulis import diagonal_energy_table
from queasars_tpu.problems.jssp import (
    Job,
    JobShopSchedulingProblemInstance,
    JSSPDomainWallHamiltonianEncoder,
    Machine,
    Operation,
)
from queasars_tpu.problems.jssp.exact_solver import solve_jssp_exact


@pytest.fixture(scope="module")
def duration_instance():
    m1, m2 = Machine("m1"), Machine("m2")
    j1 = Job(
        "j1",
        (
            Operation("a", "j1", m1, processing_duration=2),
            Operation("b", "j1", m2, processing_duration=1),
        ),
    )
    j2 = Job(
        "j2",
        (
            Operation("c", "j2", m2, processing_duration=2),
            Operation("d", "j2", m1, processing_duration=1),
        ),
    )
    return JobShopSchedulingProblemInstance("durations", (m1, m2), (j1, j2))


def test_spectrum_classification_with_durations(duration_instance):
    encoder = JSSPDomainWallHamiltonianEncoder(
        jssp_instance=duration_instance,
        makespan_limit=5,
        encoding_penalty=300,
        overlap_constraint_penalty=100,
        precedence_constraint_penalty=100,
        max_opt_value=50,
    )
    hamiltonian = encoder.get_problem_hamiltonian()
    n = encoder.n_qubits
    assert n <= 12  # keep exhaustive enumeration fast
    table = diagonal_energy_table(hamiltonian)

    oracle = solve_jssp_exact(duration_instance, makespan_limit=5)
    assert oracle is not None

    valid_makespans = {}
    for state in range(1 << n):
        result = encoder.translate_result_state(state)
        encoding_broken = any(
            not op.is_scheduled for ops in result.schedule.values() for op in ops
        )
        if encoding_broken:
            assert table[state] >= 100  # at least a constraint-scale penalty
        elif not result.is_valid:
            assert table[state] >= 100 - 1e-9
        else:
            assert table[state] <= 50 + 1e-9
            valid_makespans.setdefault(result.makespan, []).append(table[state])

    # the oracle's optimal makespan class exists and is the cheapest class
    assert oracle.makespan in valid_makespans
    ordered = sorted(valid_makespans)
    assert ordered[0] == oracle.makespan
    for earlier, later in zip(ordered, ordered[1:]):
        assert max(valid_makespans[earlier]) < min(valid_makespans[later])

    # global minimum decodes to an optimal schedule
    best_state = int(np.argmin(table))
    best = encoder.translate_result_state(best_state)
    assert best.is_valid and best.makespan == oracle.makespan


def test_three_operation_job_roundtrip():
    m1, m2, m3 = Machine("m1"), Machine("m2"), Machine("m3")
    j1 = Job(
        "j1",
        (
            Operation("a", "j1", m1, 1),
            Operation("b", "j1", m2, 1),
            Operation("c", "j1", m3, 1),
        ),
    )
    instance = JobShopSchedulingProblemInstance("threeop", (m1, m2, m3), (j1,))
    encoder = JSSPDomainWallHamiltonianEncoder(jssp_instance=instance, makespan_limit=4)
    table = diagonal_energy_table(encoder.get_problem_hamiltonian())
    best = encoder.translate_result_state(int(np.argmin(table)))
    assert best.is_valid and best.makespan == 3
