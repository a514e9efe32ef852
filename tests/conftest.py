"""Test harness configuration.

Distribution logic is tested on a virtual 8-device CPU mesh (the TPU analog
of the reference's dask ``LocalCluster(n_workers=2)`` fixture, see
reference test/minimum_eigensolvers/evqe/test_evqe_operators.py:25-29).

Note: this environment preloads jax via sitecustomize with the ``axon``
TPU platform pinned, so plain env vars are too late — the platform must be
redirected through jax.config before the first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"
