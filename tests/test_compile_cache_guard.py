"""Committed compile-cache staleness guard.

The committed ``.jax_cache/`` keys every entry to the toolchain version;
a platform/jaxlib bump silently invalidates all of them and the driver's
bench run reverts to cold remote Pallas compiles (the round-3 failure
mode in a new disguise).  This guard compiles one tiny committed-cache-
covered program ON THE TPU in a subprocess and FAILS LOUD on a cache
miss — regeneration: ``python tools/warm_cache.py`` (probe entry) then
``python bench.py`` (all bench-stage kernels), commit ``.jax_cache/``.
"""

import json
import os
import subprocess
import sys

import pytest


def _run_probe_subprocess() -> dict:
    """Run utils/compilation_cache.cache_probe on the DEFAULT backend
    (the TPU on this box) — the test suite itself is pinned to the
    virtual CPU mesh, so the probe needs its own process."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # conftest pins cpu; the probe must not be
    env.pop("XLA_FLAGS", None)
    env.pop("QUEASARS_NO_CACHE", None)
    env.pop("QUEASARS_CACHE_DIR", None)  # probe the COMMITTED cache
    code = (
        "import json\n"
        "from queasars_tpu.utils.compilation_cache import cache_probe, enable_persistent_cache\n"
        "enable_persistent_cache()\n"
        "print('PROBE ' + json.dumps(cache_probe()))\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True, text=True,
            timeout=240,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    except subprocess.TimeoutExpired:
        # the single TPU serializes compile/dispatch across processes: a
        # concurrently running experiment can starve the probe.  That is
        # chip contention, not cache staleness — skip rather than fail.
        pytest.skip("TPU busy: the cache probe could not get the chip in 240s")
    assert proc.returncode == 0, f"probe subprocess failed: {proc.stderr[-800:]}"
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE "):
            return json.loads(line[len("PROBE "):])
    raise AssertionError(f"no probe output in: {proc.stdout[-400:]}")


def test_committed_cache_serves_the_probe_program():
    probe = _run_probe_subprocess()
    if probe["backend"] != "tpu":
        pytest.skip(f"default backend is {probe['backend']}; committed entries are TPU-keyed")
    assert probe["hits"] >= 1 and probe["misses"] == 0, (
        f"COMMITTED COMPILE CACHE IS COLD for this toolchain ({probe}): a "
        "platform/jaxlib bump invalidated .jax_cache/ — the bench run will "
        "pay minutes-per-shape remote Pallas compiles.  Regenerate: "
        "python tools/warm_cache.py && python bench.py, then commit .jax_cache/"
    )
    # a warm probe compiles in under a second; the bound is generous
    # because the first dispatch over a cold TPU tunnel adds tens of
    # seconds of one-off latency unrelated to the cache
    assert probe["compile_s"] < 120
