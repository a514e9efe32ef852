"""Utility toolkit: seed plumbing, bitstring objectives.

Mirrors queasars/utility/ (reference layer L4) minus the Pauli helpers,
which live in :mod:`queasars_tpu.paulis`.
"""

from queasars_tpu.utils.random import new_random_seed
from queasars_tpu.utils.bitstring_evaluation import BitstringEvaluator
from queasars_tpu.utils.profiling import trace, annotate

__all__ = ["new_random_seed", "BitstringEvaluator", "trace", "annotate"]
