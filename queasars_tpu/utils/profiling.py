"""Profiling and evaluation-ledger observability.

The reference's only observability is the eval-count ledger
(SURVEY.md §5); this module keeps that (it lives in the solver driver)
and adds the TPU-native upgrade: ``jax.profiler`` trace capture around
any region of a solve for inspection in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None, label: str = "queasars") -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region.

    With ``log_dir`` None only wall-clock logging happens (cheap default).

    Usage::

        with trace("/tmp/jax-trace"):
            solver.compute_minimum_eigenvalue(hamiltonian)
    """
    start = time.perf_counter()
    if log_dir is not None:
        import jax

        jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        if log_dir is not None:
            import jax

            jax.profiler.stop_trace()
        elapsed = time.perf_counter() - start
        logger.info("%s: %.3f s", label, elapsed)


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-region inside a captured trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
