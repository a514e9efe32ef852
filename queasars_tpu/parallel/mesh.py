"""Population-axis sharding over a device mesh.

Replaces dask task farming (reference: mutation.py:206-218,
selection.py:75-84 submit/wait per individual) with data parallelism over
the population axis: genome tensors carry a ``NamedSharding`` over a 1-D
mesh and the already-jitted evaluation/optimization programs run SPMD —
XLA partitions the batch dimension; the per-individual work is
embarrassingly parallel so no collectives are needed until reductions
(argmin/summaries), which ride ICI via ``psum``-family ops XLA inserts.

Multi-host: call ``jax.distributed.initialize`` before building the mesh;
everything below is expressed against global devices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from queasars_tpu.genome.packing import PackedPopulation

POP_AXIS = "pop"


def population_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over the population axis.

    :param n_devices: number of devices to use (default: all)
    :param devices: explicit device list (overrides n_devices)
    """
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), (POP_AXIS,))


def _pad_to_multiple(array: np.ndarray, multiple: int) -> np.ndarray:
    pop = array.shape[0]
    padded = -(-pop // multiple) * multiple
    if padded == pop:
        return array
    pad_widths = [(0, padded - pop)] + [(0, 0)] * (array.ndim - 1)
    return np.pad(array, pad_widths)


def shard_packed(packed: PackedPopulation, mesh: Mesh) -> tuple[dict, int]:
    """Place a packed population's tensors on the mesh, sharded over the
    population axis (padding the population to a device multiple).

    :return: (dict of sharded device arrays, original population size)
    """
    n_devices = mesh.devices.size
    sharding = NamedSharding(mesh, P(POP_AXIS))
    original = packed.n_individuals
    arrays = {
        "gate_types": _pad_to_multiple(packed.gate_types, n_devices),
        "controls": _pad_to_multiple(packed.controls, n_devices),
        "angles": _pad_to_multiple(packed.angles, n_devices),
        "layer_mask": _pad_to_multiple(packed.layer_mask, n_devices),
    }
    placed = {name: jax.device_put(arr, sharding) for name, arr in arrays.items()}
    return placed, original


def sharded_population_energies(
    mesh: Mesh,
    packed: PackedPopulation,
    table: np.ndarray,
) -> np.ndarray:
    """Exact diagonal-table energies of a population, sharded over the mesh.

    The energy table is replicated to every device; genome tensors are
    population-sharded.  One jitted SPMD program computes everything.
    """
    from queasars_tpu.sim.evaluators import _energies_exact

    placed, original = shard_packed(packed, mesh)
    replicated = NamedSharding(mesh, P())
    table_dev = jax.device_put(np.asarray(table, np.float32), replicated)
    energies = _energies_exact(
        placed["gate_types"], placed["controls"], placed["angles"], placed["layer_mask"],
        table_dev, packed.n_qubits,
    )
    return np.asarray(energies)[:original]


def sharded_training_step(
    mesh: Mesh,
    packed: PackedPopulation,
    table: np.ndarray,
    coords: np.ndarray,
    n_free: np.ndarray,
    active: np.ndarray,
    maxiter: int = 4,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """One full EVQE training step, SPMD over the mesh: batched NFT on the
    given coordinates followed by a selection-style population evaluation.

    This is the multi-chip analog of the reference's generation hot path
    (parameter-search mutation + selection evaluation); used by the
    multi-chip dry run and as the scaling benchmark body.

    :return: (optimized angles, final energies), trimmed to the original
        population size
    """
    from queasars_tpu.optim.nft import _nft_scan

    n_devices = mesh.devices.size
    placed, original = shard_packed(packed, mesh)
    pop_sharding = NamedSharding(mesh, P(POP_AXIS))
    replicated = NamedSharding(mesh, P())

    coords_p = jax.device_put(_pad_to_multiple(coords, n_devices), pop_sharding)
    n_free_p = jax.device_put(_pad_to_multiple(np.asarray(n_free), n_devices), pop_sharding)
    active_p = jax.device_put(_pad_to_multiple(np.asarray(active), n_devices), pop_sharding)
    table_dev = jax.device_put(np.asarray(table, np.float32), replicated)
    dummy = jax.device_put(jnp.zeros(1, jnp.float32), replicated)
    dummy_order = jax.device_put(jnp.zeros(1, jnp.int32), replicated)

    angles, energies = _nft_scan(
        placed["gate_types"], placed["controls"], placed["layer_mask"], placed["angles"],
        coords_p, n_free_p, active_p,
        table_dev, dummy, dummy_order, jnp.float32(1.0),
        jax.random.PRNGKey(seed), None,
        n_qubits=packed.n_qubits, maxiter=maxiter, reset_interval=32,
        shots=0, use_cvar=False, use_shots=False,
    )
    return np.asarray(angles)[:original], np.asarray(energies)[:original]
