"""JSON round-trip tests for the JSSP codec (mirrors reference
test/job_shop_scheduling/test_serialization.py) plus oracle-solver and
visualization smoke checks."""

import json
import os

from queasars_tpu.problems.jssp import random_job_shop_scheduling_instance
from queasars_tpu.problems.jssp.exact_solver import solve_jssp_exact
from queasars_tpu.problems.jssp.serialization import JSSPJSONDecoder, JSSPJSONEncoder
from queasars_tpu.problems.jssp.visualization import (
    plot_jssp_problem_instance_gantt,
    plot_jssp_problem_solution_gantt,
)

from tests.jssp_fixtures import invalid_result, problem_instance, valid_result


def roundtrip(obj):
    return json.loads(json.dumps(obj, cls=JSSPJSONEncoder), cls=JSSPJSONDecoder)


def test_instance_roundtrip():
    instance = problem_instance()
    assert roundtrip(instance) == instance


def test_random_instance_roundtrip_and_determinism():
    a = random_job_shop_scheduling_instance("rand", 3, 3, 1.0, {1: 0.5, 2: 0.5}, random_seed=7)
    b = random_job_shop_scheduling_instance("rand", 3, 3, 1.0, {1: 0.5, 2: 0.5}, random_seed=7)
    assert a == b
    assert roundtrip(a) == a


def test_result_roundtrip():
    for result in (valid_result(), invalid_result()):
        restored = roundtrip(result)
        assert restored.problem_instance == result.problem_instance
        assert restored.schedule == result.schedule
        assert restored.is_valid == result.is_valid
        assert restored.makespan == result.makespan


def test_exact_solver_optimum():
    instance = problem_instance()
    result = solve_jssp_exact(instance)
    assert result is not None and result.is_valid and result.makespan == 2
    # infeasible limit
    assert solve_jssp_exact(instance, makespan_limit=1) is None


def test_gantt_plots(tmp_path):
    instance = problem_instance()
    path_instance = os.path.join(tmp_path, "instance.png")
    path_solution = os.path.join(tmp_path, "solution.png")
    assert plot_jssp_problem_instance_gantt(instance, save_path=path_instance) is None
    assert plot_jssp_problem_solution_gantt(valid_result(), save_path=path_solution) is None
    assert os.path.getsize(path_instance) > 0
    assert os.path.getsize(path_solution) > 0
    fig = plot_jssp_problem_instance_gantt(instance)
    assert fig is not None
