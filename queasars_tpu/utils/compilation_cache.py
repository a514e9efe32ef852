"""Persistent XLA compilation cache plumbing.

On this platform Pallas kernels compile through a remote service at
minutes per shape (CLAUDE.md), and plain jit graphs take seconds to tens
of seconds — per process.  JAX's persistent compilation cache removes
both costs for previously seen (program, flags, device) keys: measured
on the axon v5e chip, the n=8 fused slot kernel went from 198.4 s cold
to 0.92 s warm, and a scanned jnp graph from 2.0 s to 0.64 s
(docs/performance.md, "Compile-time economics").

The reference has no analog — qiskit-aer re-"compiles" (transpiles)
every circuit object per call (reference
queasars/circuit_evaluation/transpiling_primitives.py:22-83); here
compilation is per program *shape* and now persists across processes.

Opt-out with QUEASARS_NO_CACHE=1; relocate with QUEASARS_CACHE_DIR.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

_DEFAULT_DIR = Path(__file__).resolve().parent.parent.parent / ".jax_cache"


def enable_persistent_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path`` and drop the
    min-compile-time/min-entry-size thresholds so every executable is
    cached (remote Pallas compiles report near-zero *local* compile time,
    which the default 1 s threshold would skip).

    Returns the cache directory in use, or None when disabled via
    QUEASARS_NO_CACHE=1.  Safe to call repeatedly and before or after
    backend initialization.
    """
    if os.environ.get("QUEASARS_NO_CACHE") == "1":
        return None
    cache_dir = str(path or os.environ.get("QUEASARS_CACHE_DIR") or _DEFAULT_DIR)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
