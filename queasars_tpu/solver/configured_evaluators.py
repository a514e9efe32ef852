"""Evaluator configuration records.

Analog of queasars/circuit_evaluation/configured_primitives.py:9-22: the
reference pairs a primitive with its shot/precision setting so the config
travels with it; here the records carry what is needed to build the TPU
evaluators (there is no opaque primitive object to wrap).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


@dataclass
class ConfiguredSampler:
    """Shot-based evaluation settings (analog of ConfiguredSamplerV2,
    configured_primitives.py:9-14).

    :param shots: measurement shots per circuit evaluation
    :param seed: RNG seed for the measurement sampling
    """

    shots: int
    seed: int = 0

    def __post_init__(self):
        if self.shots < 1:
            raise ValueError("shots must be at least 1")


@dataclass
class ConfiguredEstimator:
    """Exact-expectation settings (analog of ConfiguredEstimatorV2,
    configured_primitives.py:17-22).

    :param precision: accepted for API parity; the statevector expectation
        is exact, so this is informational only (the reference forwards it
        to Aer's shot-noise model, circuit_evaluation.py:210-213)
    """

    precision: Optional[float] = None
