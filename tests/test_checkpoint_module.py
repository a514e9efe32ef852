"""Unit tests for solver/checkpoint.py building blocks (the solver-level
round trips live in test_checkpointing.py)."""

import os
from random import Random

import numpy as np
import pytest

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.solver.checkpoint import (
    load_checkpoint,
    operator_rng_states,
    random_state_from_json,
    random_state_to_json,
    restore_operator_rng_states,
    write_checkpoint,
)


class _FakeOperator:
    def __init__(self, seed):
        self.random_generator = Random(seed)
        self._private_rng = Random(seed + 1)
        self.not_an_rng = "plain attribute"


def test_random_state_json_round_trip():
    rng = Random(42)
    rng.random()
    state = random_state_from_json(random_state_to_json(rng))
    clone = Random()
    clone.setstate(state)
    assert [clone.random() for _ in range(5)] == [rng.random() for _ in range(5)]


def test_operator_rng_capture_and_restore():
    ops = [_FakeOperator(1), _FakeOperator(2)]
    ops[0].random_generator.random()  # advance one stream
    states = operator_rng_states(ops)
    assert set(states[0]) == {"random_generator", "_private_rng"}

    expected = [op.random_generator.random() for op in ops]
    fresh = [_FakeOperator(9), _FakeOperator(9)]
    restore_operator_rng_states(fresh, states)
    assert [op.random_generator.random() for op in fresh] == expected


def test_restore_rejects_operator_count_mismatch():
    states = operator_rng_states([_FakeOperator(1)])
    with pytest.raises(ValueError, match="pipeline has"):
        restore_operator_rng_states([_FakeOperator(1), _FakeOperator(2)], states)


def test_write_and_load_full_state(tmp_path):
    population = EVQEPopulation.random_population(3, 1, 4, True, random_seed=0)
    path = os.path.join(tmp_path, "state.json")

    class _Evaluator:
        _counter = 7
        _noise_rng = np.random.default_rng(3)

    _Evaluator._noise_rng.normal()  # advance
    write_checkpoint(
        path,
        population=population,
        n_generations=2,
        n_circuit_evaluations=[10, 20],
        population_evaluations=[],
        best_individual=population.individuals[0],
        best_expectation_value=-1.5,
        operators=[_FakeOperator(5)],
        evaluator=_Evaluator,
    )
    state = load_checkpoint(path)
    assert state.n_generations == 2
    assert state.n_circuit_evaluations == [10, 20]
    assert state.population.individuals == population.individuals
    assert state.best_individual == population.individuals[0]
    assert state.best_expectation_value == -1.5
    assert state.evaluator["counter"] == 7
    # the noise generator state round-trips to identical draws
    from queasars_tpu.solver.checkpoint import restore_evaluator_state

    expected_next = float(_Evaluator._noise_rng.normal())

    class _Fresh:
        _counter = 0
        _noise_rng = np.random.default_rng(0)

    restore_evaluator_state(_Fresh, state.evaluator)
    assert _Fresh._counter == 7
    assert float(_Fresh._noise_rng.normal()) == expected_next


def test_restore_rejects_stale_noise_rng_state(tmp_path):
    """A version-1 checkpoint of a precision>0 solve carries a Gaussian
    _noise_rng state; current evaluators realize precision as shot
    sampling and cannot consume it — restoring must fail loudly instead
    of silently resuming under a different noise law."""
    from queasars_tpu.solver.checkpoint import restore_evaluator_state

    class _ShotEvaluator:  # shot-law evaluator: counter only, no _noise_rng
        _counter = 0

    stale_state = {"counter": 3, "noise_rng": {"state": {"state": 1}}}
    with pytest.raises(ValueError, match="different noise law"):
        restore_evaluator_state(_ShotEvaluator, stale_state)
    # counterless states restore fine
    restore_evaluator_state(_ShotEvaluator, {"counter": 5})
    assert _ShotEvaluator._counter == 5


def test_load_population_only_file(tmp_path):
    import json

    from queasars_tpu.genome.serialization import EVQEPopulationJSONEncoder

    population = EVQEPopulation.random_population(3, 1, 2, True, random_seed=1)
    path = os.path.join(tmp_path, "population.json")
    with open(path, "w") as fh:
        json.dump(population, fh, cls=EVQEPopulationJSONEncoder)
    state = load_checkpoint(path)
    assert state.population.individuals == population.individuals
    assert state.n_generations == 0 and state.operator_rngs == []
