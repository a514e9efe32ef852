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


def cache_probe() -> dict:
    """Compile one tiny FIXED program against the active persistent cache
    and report whether it was served from cache.

    The committed ``.jax_cache/`` holds this probe's TPU executable
    (written by ``python tools/warm_cache.py``); a platform/jaxlib bump
    silently invalidates every committed entry — including the expensive
    remote-compiled Pallas kernels — and the first symptom used to be a
    mysteriously cold (minutes-long) benchmark run.  This probe makes
    staleness loud: ``hits == 0`` on a backend whose entries are
    committed means the cache must be regenerated (``python
    tools/warm_cache.py`` for the probe; ``python bench.py`` re-populates
    every bench-stage kernel).

    Returns ``{"backend", "hits", "misses", "compile_s"}`` — hit/miss
    counts come from JAX's own cache instrumentation
    (``/jax/compilation_cache/cache_hits``).
    """
    import time

    import jax
    import jax.numpy as jnp
    from jax._src import monitoring

    events: list[str] = []
    listener = lambda event, **kw: events.append(event)
    monitoring.register_event_listener(listener)
    try:
        # the probe program: fixed shape/ops so its cache key is stable
        # across runs (never change this without regenerating .jax_cache)
        @jax.jit
        def _cache_probe_program(x):
            return (x * 1.000001 + 0.5).sum() * 2.0

        start = time.perf_counter()
        result = float(_cache_probe_program(jnp.arange(4096, dtype=jnp.float32)))
        compile_s = time.perf_counter() - start
    finally:
        # no public unregister in this jax version — drop from the list
        try:
            monitoring._event_listeners.remove(listener)
        except ValueError:
            pass
    assert abs(result - 2 * (4096 * 4095 / 2 * 1.000001 + 0.5 * 4096)) < 1.0
    return {
        "backend": jax.default_backend(),
        "hits": sum(1 for e in events if e.endswith("cache_hits")),
        "misses": sum(1 for e in events if e.endswith("cache_misses")),
        "compile_s": compile_s,
    }
