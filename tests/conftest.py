"""Test harness configuration.

Distribution logic is tested on a virtual 8-device CPU mesh (the TPU analog
of the reference's dask ``LocalCluster(n_workers=2)`` fixture, see
reference test/minimum_eigensolvers/evqe/test_evqe_operators.py:25-29) —
the env vars MUST be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
