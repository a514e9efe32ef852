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


def test_reference_wire_format_population_decodes():
    """A population JSON authored in the REFERENCE encoder's exact wire
    format (sentinel keys and nesting transcribed from
    evqe/serialization.py:33-64 and quantum_circuit/serialization.py:30-59)
    decodes into our genome objects and round-trips byte-compatibly."""
    import json
    import os

    from queasars_tpu.genome import EVQEPopulation
    from queasars_tpu.genome.gates import (
        ControlGate,
        ControlledRotationGate,
        IdentityGate,
        RotationGate,
    )
    from queasars_tpu.genome.serialization import (
        EVQEPopulationJSONDecoder,
        EVQEPopulationJSONEncoder,
    )

    path = os.path.join(os.path.dirname(__file__), "fixtures", "reference_wire_population.json")
    with open(path) as fh:
        population = json.load(fh, cls=EVQEPopulationJSONDecoder)

    assert isinstance(population, EVQEPopulation)
    assert len(population.individuals) == 2
    first = population.individuals[0]
    assert first.n_qubits == 3
    gates = first.layers[0].gates
    assert isinstance(gates[0], RotationGate)
    assert isinstance(gates[1], ControlledRotationGate) and gates[1].control_qubit_index == 2
    assert isinstance(gates[2], ControlGate) and gates[2].controlled_qubit_index == 1
    assert first.parameter_values == (0.1, 0.2, 0.3, 0.4, 0.5, 0.6)
    assert isinstance(population.individuals[1].layers[0].gates[2], IdentityGate)
    # speciation state restored
    assert population.species_members is not None
    ((representative, members),) = population.species_members.items()
    assert members == [0, 1]
    assert population.species_membership[0] == representative

    # our encoder emits the same wire format back
    redecoded = json.loads(
        json.dumps(population, cls=EVQEPopulationJSONEncoder), cls=EVQEPopulationJSONDecoder
    )
    assert redecoded.individuals == population.individuals
    with open(path) as fh:
        raw = json.load(fh)
    assert json.loads(json.dumps(population, cls=EVQEPopulationJSONEncoder)) == raw
