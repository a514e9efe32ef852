"""Multi-host initialization: one global mesh across processes/slices.

The reference scales across machines through a dask scheduler + TCP
workers (SURVEY.md §2.3); the TPU-native equivalent is JAX's multi-
controller runtime: every host process calls
:func:`initialize_multihost` first, after which ``jax.devices()`` is the
GLOBAL device list and the population/amplitude meshes built from it span
all hosts — collectives ride ICI within a slice and DCN across slices,
with no scheduler process at all.

Usage (same program on every host):

    from queasars_tpu.parallel import initialize_multihost, population_mesh

    initialize_multihost(coordinator_address="host0:1234",
                         num_processes=4, process_id=RANK)
    mesh = population_mesh()            # spans every host's devices
    ...EVQEMinimumEigensolverConfiguration(mesh=mesh, ...)

On Cloud TPU pods the three arguments are auto-detected from the
environment — call ``initialize_multihost()`` with no arguments.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[list[int]] = None,
) -> None:
    """Join this process to the global JAX runtime
    (``jax.distributed.initialize``); must run before first backend use.

    All arguments are optional on platforms with cluster auto-detection
    (Cloud TPU); otherwise pass the coordinator's ``host:port``, the total
    process count and this process's rank.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def is_multihost() -> bool:
    """True when more than one controller process is attached."""
    return jax.process_count() > 1


def process_info() -> tuple[int, int]:
    """(process_id, process_count) of the global runtime."""
    return jax.process_index(), jax.process_count()
