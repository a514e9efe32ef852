"""Population-axis sharding over a device mesh.

Replaces dask task farming (reference: mutation.py:206-218,
selection.py:75-84 submit/wait per individual) with data parallelism over
the population axis: the population is padded to a device multiple and the
already-jitted evaluation/optimization programs run SPMD under
``jax.shard_map`` — each device owns a contiguous block of individuals,
the per-individual work is embarrassingly parallel, and no collectives are
needed until host-side reductions (argmin/summaries) over the gathered
energies.

Determinism: every per-individual computation (including shot sampling,
which uses per-individual PRNG keys) is local to its block, so a seeded
solve produces bit-identical trajectories on a 1-device and an 8-device
mesh.  The population is padded to ``lcm(n_devices, POPULATION_PAD)`` so
the compiled program shapes — and therefore the float arithmetic — do not
depend on the device count (for any power-of-two count up to
POPULATION_PAD).

Multi-host: call ``jax.distributed.initialize`` before building the mesh;
everything below is expressed against global devices.
"""

from __future__ import annotations

from math import lcm
from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from queasars_tpu.genome.packing import PackedPopulation

POP_AXIS = "pop"

#: population padding quantum — mesh runs pad the population to a multiple
#: of this (and of the device count) so 1-, 2-, 4- and 8-device meshes
#: compile consistent per-row programs and give bit-identical trajectories
POPULATION_PAD = 8

#: minimum individuals per device block: a local batch of 1 makes XLA CPU
#: pick scalar (libm) transcendental code paths that differ from the
#: vectorized ones by an ulp — padding to >= 2 per device keeps every
#: block on the vectorized path and preserves cross-device-count
#: bit-identity
MIN_BLOCK = 2


def population_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over the population axis.

    :param n_devices: number of devices to use (default: all)
    :param devices: explicit device list (overrides n_devices)
    """
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), (POP_AXIS,))


def population_pad_multiple(mesh: Mesh) -> int:
    """The multiple the population axis is padded to for this mesh."""
    return max(lcm(mesh.devices.size, POPULATION_PAD), MIN_BLOCK * mesh.devices.size)


def pad_population_axis(array: np.ndarray, multiple: int) -> np.ndarray:
    """Zero-pad axis 0 up to the next multiple (no-op when aligned)."""
    arr = np.asarray(array)
    pop = arr.shape[0]
    padded = -(-pop // multiple) * multiple
    if padded == pop:
        return arr
    pad_widths = [(0, padded - pop)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad_widths)


def run_population_sharded(mesh: Mesh, fn: Callable, pop_args: tuple, rep_args: tuple):
    """Run ``fn(pop_args, rep_args)`` SPMD over the mesh's population axis.

    :param fn: callable taking the two tuples; every array in ``pop_args``
        has the (padded) population as axis 0, every output does too;
        ``rep_args`` are replicated operands (tables, permutations,
        scalars, optional initial states)
    :return: fn's outputs with global (padded) population axes

    Multi-host: when more than one controller process is attached
    (``initialize_multihost``), every process runs this same call with
    identical host data (the solver's host logic is deterministic and
    replicated); inputs are assembled into global arrays from each
    process's addressable shards, and outputs are all-gathered so every
    host sees the full population axis.
    """
    if jax.process_count() > 1:
        return _run_population_sharded_multihost(mesh, fn, pop_args, rep_args)
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(POP_AXIS), P()),
        out_specs=P(POP_AXIS),
        check_vma=False,
    )
    return mapped(pop_args, rep_args)


def _run_population_sharded_multihost(mesh: Mesh, fn: Callable, pop_args: tuple, rep_args: tuple):
    """Multi-controller variant: globalize inputs, all-gather outputs."""
    pop_sharding = NamedSharding(mesh, P(POP_AXIS))
    rep_sharding = NamedSharding(mesh, P())

    def globalize(sharding):
        def build(value):
            arr = np.asarray(value)
            return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])

        return build

    pop_global = jax.tree.map(globalize(pop_sharding), pop_args)
    rep_global = jax.tree.map(globalize(rep_sharding), rep_args)

    def gathered(pa, ra):
        out = fn(pa, ra)
        return jax.tree.map(lambda x: jax.lax.all_gather(x, POP_AXIS, axis=0, tiled=True), out)

    mapped = jax.shard_map(
        gathered,
        mesh=mesh,
        in_specs=(P(POP_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return mapped(pop_global, rep_global)


def shard_packed(packed: PackedPopulation, mesh: Mesh) -> tuple[dict, int]:
    """Place a packed population's tensors on the mesh, sharded over the
    population axis (padding the population to the mesh's pad multiple).

    :return: (dict of sharded device arrays, original population size)
    """
    multiple = population_pad_multiple(mesh)
    sharding = NamedSharding(mesh, P(POP_AXIS))
    original = packed.n_individuals
    arrays = {
        "gate_types": pad_population_axis(packed.gate_types, multiple),
        "controls": pad_population_axis(packed.controls, multiple),
        "angles": pad_population_axis(packed.angles, multiple),
        "layer_mask": pad_population_axis(packed.layer_mask, multiple),
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
    population-sharded.  One SPMD program computes everything.
    """
    from queasars_tpu.sim.evaluators import _energies_exact

    multiple = population_pad_multiple(mesh)
    pop_args = tuple(
        pad_population_axis(arr, multiple)
        for arr in (packed.gate_types, packed.controls, packed.angles, packed.layer_mask)
    )
    table_f32 = np.asarray(table, np.float32)
    energies = run_population_sharded(
        mesh,
        lambda pa, ra: _energies_exact(pa[0], pa[1], pa[2], pa[3], ra[0], packed.n_qubits),
        pop_args,
        (table_f32,),
    )
    return np.asarray(energies)[: packed.n_individuals]


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

    multiple = population_pad_multiple(mesh)
    original = packed.n_individuals
    pop_keys = np.asarray(jax.random.split(jax.random.PRNGKey(seed), packed.n_individuals))
    pop_args = tuple(
        pad_population_axis(arr, multiple)
        for arr in (
            packed.gate_types,
            packed.controls,
            packed.layer_mask,
            packed.angles,
            np.asarray(coords),
            np.asarray(n_free),
            np.asarray(active),
            pop_keys,
        )
    )
    dummy = jnp.zeros(1, jnp.float32)
    dummy_order = jnp.zeros(1, jnp.int32)

    def fn(pa, ra):
        gt, ctrl, lm, ang, crd, nf, act, keys = pa
        tab, se, eo, alpha = ra
        return _nft_scan(
            gt, ctrl, lm, ang, crd, nf, act, tab, se, eo, alpha, keys, None,
            n_qubits=packed.n_qubits, maxiter=maxiter, reset_interval=32,
            shots=0, use_cvar=False, use_shots=False,
        )

    angles, energies = run_population_sharded(
        mesh, fn, pop_args,
        (np.asarray(table, np.float32), dummy, dummy_order, jnp.float32(1.0)),
    )
    return np.asarray(angles)[:original], np.asarray(energies)[:original]
