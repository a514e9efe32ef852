"""Stateful SPSA termination checker.

Behavioral port of queasars/utility/spsa_termination.py:11-143: terminates
when the relative change in function value stays below a threshold for a
window of consecutive iterations, or when a maxfev cap is reached; tracks
the best value/parameters and the full value history; auto-resets when
reused on a fresh optimization (detected by a non-increasing evaluation
count, :59-66).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class SPSATerminationChecker:
    """Callback-style termination state for SPSA runs.

    :param minimum_relative_change: relative change threshold
    :param allowed_consecutive_violations: consecutive below-threshold
        iterations tolerated before terminating (0 = terminate at first)
    :param maxfev: optional hard cap on function evaluations
    """

    def __init__(
        self,
        minimum_relative_change: float,
        allowed_consecutive_violations: int,
        maxfev: Optional[int] = None,
    ):
        self._minimum_relative_change = minimum_relative_change
        self._allowed_consecutive_violations = allowed_consecutive_violations
        self._maxfev = maxfev
        self._reset()

    def _reset(self) -> None:
        self._function_value_history: list[float] = []
        self._change_history: list[float] = []
        self._n_function_evaluations = 0
        self._n_function_evaluation_history: list[float] = []
        self._best_function_value = float("inf")
        self._best_parameter_values: Optional[np.ndarray] = None
        self._done = False

    def termination_check(
        self,
        n_function_evaluations: int,
        parameter_values: np.ndarray,
        function_value: float,
        step_size: float,
        accepted: bool,
    ) -> bool:
        """SPSA callback signature (nfev, x, fx, stepsize, accepted) -> stop?

        Reference: spsa_termination.py:48-96 (including the reuse
        auto-reset and the maxfev check preceding the accepted gate).
        """
        if self._done or n_function_evaluations < self._n_function_evaluations:
            self._reset()

        self._n_function_evaluations = n_function_evaluations

        if self._maxfev is not None and self._n_function_evaluations >= self._maxfev:
            return True

        if not accepted:
            return False

        self._function_value_history.append(function_value)
        self._n_function_evaluation_history.append(n_function_evaluations)

        if function_value < self._best_function_value:
            self._best_function_value = function_value
            self._best_parameter_values = np.asarray(parameter_values).copy()

        if len(self._function_value_history) < 2:
            return False

        change = abs(function_value - self._function_value_history[-2]) / self._function_value_history[-2]
        self._change_history.append(change)

        if len(self._change_history) < self._allowed_consecutive_violations + 1:
            return False

        window = self._change_history[-self._allowed_consecutive_violations - 1 :]
        if max(window) < self._minimum_relative_change:
            self._done = True
            return True
        return False

    @property
    def n_function_evaluations(self) -> int:
        return self._n_function_evaluations

    @property
    def function_value_history(self) -> list[float]:
        return self._function_value_history

    @property
    def n_function_evaluation_history(self) -> list[float]:
        return self._n_function_evaluation_history

    @property
    def best_function_value(self) -> float:
        return self._best_function_value

    @property
    def best_parameter_values(self) -> np.ndarray:
        if self._best_parameter_values is None:
            raise ValueError(
                "The termination checker seems to have never been called! "
                "Therefore it currently stores no parameter values!"
            )
        return self._best_parameter_values
