"""Compacted-gate Pallas kernels: skip empty genome slots entirely.

The slot kernel (pallas_kernels.py) visits every (layer, qubit) slot and
relies on ``pl.when`` predication to skip identity/control/padding slots —
but Mosaic's predication still pays ~70% of a skipped slot's vector work
(docs/performance.md "kernel cost structure").  At the benchmark shape
(~45% of slot visits predicated off) that overhead is the largest
remaining term.

Here the genome is *compacted on the host* into a per-individual list of
only the active gates, sorted (layer, axis-group): within a layer all
gates commute (they act on disjoint qubits — genome validity), so lane-
axis gates (q < 7, partner exchange = lane roll) are grouped before
row-axis gates (q >= 7, partner exchange = sublane roll).  The kernel
then runs two ``fori_loop``s per layer with per-individual dynamic
bounds — padding and inactive slots are never visited, and each loop body
contains only its own axis' partner-exchange code (no dual-path
predication).  Dynamic-distance partner exchange uses ``pltpu.roll`` with
traced shifts (validated on hardware: both axes lower correctly,
experiments/exp_dynroll.py).

Gate order within a layer differs from the slot kernel (grouped vs qubit
order), which is mathematically identical (disjoint supports) but may
differ in float rounding at the ulp level.

Angles stay in the canonical [P, L, n, 3] tensor (the optimizers update
it in place); the wrapper gathers the per-gate angle triples in-graph, so
one host-side compaction serves a whole parameter sweep.

**Measured outcome (v5e, n=20/pop=32, experiments/exp_compact.py): 392
evals/s sustained vs 746 for the slot kernel — 0.53x, REJECTED for
production.**  Dynamic-shift rolls plus dynamic-bound loops cost more on
this toolchain than the predicated-off slot visits they remove (energies
matched the slot kernel bit-for-bit).  Kept as a correct, tested
alternative formulation: on toolchains where ``tpu.dynamic_rotate`` is
native-speed the same compaction wins by the visit ratio (~1.8x here).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from queasars_tpu.sim.pallas_kernels import LANES, LANE_BITS


@dataclass
class CompactGates:
    """Host-side compacted gate lists for a packed population.

    ``G`` is the (bucketed) maximum active-gate count over the population.

    - ``qubits`` [P, G] int32 — target qubit per gate
    - ``controls`` [P, G] int32 — control qubit per gate, -1 for plain U3
    - ``angle_index`` [P, G] int32 — flat (layer * n_qubits + qubit) index
      of the gate's angle triple in the [P, L*n, 3] angle view
    - ``boundaries`` [P, 2L+1] int32 — segment starts: gates
      [boundaries[2l], boundaries[2l+1]) are layer l's lane-axis gates,
      [boundaries[2l+1], boundaries[2l+2]) its row-axis gates
    """

    qubits: np.ndarray
    controls: np.ndarray
    angle_index: np.ndarray
    boundaries: np.ndarray
    n_qubits: int
    n_layers: int

    @property
    def max_gates(self) -> int:
        return int(self.qubits.shape[1])


def compact_gates(
    gate_types: np.ndarray,
    controls: np.ndarray,
    layer_mask: np.ndarray,
    n_qubits: int,
    bucket: int = 16,
) -> CompactGates:
    """Compact [P, L, n] genome structure tensors into per-individual
    active-gate lists (see :class:`CompactGates`).

    ``bucket`` pads the gate-count dimension so repeated packings of
    similar populations hit few compiled shapes (padded entries sit past
    every individual's last segment boundary and are never visited).
    """
    gate_types = np.asarray(gate_types)
    controls = np.asarray(controls)
    layer_mask = np.asarray(layer_mask)
    pop, n_layers, _ = gate_types.shape

    per_ind: list[tuple[list[int], list[int], list[int], list[int]]] = []
    max_count = 1
    for p in range(pop):
        qs: list[int] = []
        cs: list[int] = []
        ai: list[int] = []
        bounds: list[int] = [0]
        for l in range(n_layers):
            active = layer_mask[p, l]
            for group in (0, 1):  # 0 = lane-axis, 1 = row-axis
                if active:
                    for q in range(n_qubits):
                        if (q >= LANE_BITS) != bool(group):
                            continue
                        gt = gate_types[p, l, q]
                        if gt == 1 or gt == 3:  # ROT / CROT
                            qs.append(q)
                            cs.append(int(controls[p, l, q]) if gt == 3 else -1)
                            ai.append(l * n_qubits + q)
                bounds.append(len(qs))
        per_ind.append((qs, cs, ai, bounds))
        max_count = max(max_count, len(qs))

    g_max = -(-max_count // bucket) * bucket
    qubits = np.zeros((pop, g_max), np.int32)
    ctrl = np.full((pop, g_max), -1, np.int32)
    angle_index = np.zeros((pop, g_max), np.int32)
    boundaries = np.zeros((pop, 2 * n_layers + 1), np.int32)
    for p, (qs, cs, ai, bounds) in enumerate(per_ind):
        qubits[p, : len(qs)] = qs
        ctrl[p, : len(cs)] = cs
        angle_index[p, : len(ai)] = ai
        boundaries[p] = bounds
    return CompactGates(qubits, ctrl, angle_index, boundaries, n_qubits, n_layers)


def _apply_gate(state_re, state_im, partner_plane, bit_vec, theta, phi, lam, control, row_ids, lane_ids):
    """Shared complex 2x2 combine + control select.

    ``partner_plane(plane)`` returns the partner-amplitude plane;
    ``bit_vec`` is the (broadcastable) target-qubit bit of each position.
    """
    cos = jnp.cos(theta / 2)
    sin = jnp.sin(theta / 2)
    u00r, u00i = cos, jnp.float32(0.0)
    u01r, u01i = -jnp.cos(lam) * sin, -jnp.sin(lam) * sin
    u10r, u10i = jnp.cos(phi) * sin, jnp.sin(phi) * sin
    u11r, u11i = jnp.cos(phi + lam) * cos, jnp.sin(phi + lam) * cos

    re = state_re[:]
    im = state_im[:]
    partner_re = partner_plane(re)
    partner_im = partner_plane(im)

    bit0 = bit_vec == 0
    a_re = jnp.where(bit0, u00r, u11r)
    a_im = jnp.where(bit0, u00i, u11i)
    b_re = jnp.where(bit0, u01r, u10r)
    b_im = jnp.where(bit0, u01i, u10i)

    new_re = a_re * re - a_im * im + b_re * partner_re - b_im * partner_im
    new_im = a_re * im + a_im * re + b_re * partner_im + b_im * partner_re

    is_crot = control >= 0
    c_lane = jnp.clip(control, 0, LANE_BITS - 1)
    c_row = jnp.clip(control - LANE_BITS, 0, 31)
    lane_bit = (lane_ids >> c_lane) & 1
    row_bit = (row_ids >> c_row) & 1
    ctrl_bit = jnp.where(control < LANE_BITS, lane_bit, row_bit)
    active = jnp.logical_or(jnp.logical_not(is_crot), ctrl_bit == 1)

    state_re[:] = jnp.where(active, new_re, re)
    state_im[:] = jnp.where(active, new_im, im)


def _run_compact_circuit(
    qubits_ref,      # SMEM [1, 1, G] int32
    controls_ref,    # SMEM [1, 1, G] int32
    angles_ref,      # SMEM [1, G, 3] f32 (gathered per-gate triples)
    bounds_ref,      # SMEM [1, 1, 2L+1] int32
    state_re,
    state_im,
    n_qubits: int,
    n_layers: int,
    init_ref=None,
):
    rows = 1 << (n_qubits - LANE_BITS)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    if init_ref is not None:
        state_re[:] = init_ref[0, 0]
        state_im[:] = init_ref[0, 1]
    else:
        state_re[:] = jnp.where(
            jnp.logical_and(row_ids == 0, lane_ids == 0), 1.0, 0.0
        ).astype(jnp.float32)
        state_im[:] = jnp.zeros((rows, LANES), jnp.float32)

    def lane_gate(g, carry):
        q = qubits_ref[0, 0, g]
        shift = jnp.left_shift(jnp.int32(1), q)

        def partner(plane):
            fwd = pltpu.roll(plane, LANES - shift, 1)  # idx+2^q -> idx
            bwd = pltpu.roll(plane, shift, 1)          # idx-2^q -> idx
            return jnp.where(((lane_ids >> q) & 1) == 0, fwd, bwd)

        _apply_gate(
            state_re, state_im, partner, (lane_ids >> q) & 1,
            angles_ref[0, g, 0], angles_ref[0, g, 1], angles_ref[0, g, 2],
            controls_ref[0, 0, g], row_ids, lane_ids,
        )
        return carry

    def row_gate(g, carry):
        q = qubits_ref[0, 0, g]
        r = q - LANE_BITS
        stride = jnp.left_shift(jnp.int32(1), r)

        def partner(plane):
            fwd = pltpu.roll(plane, rows - stride, 0)
            bwd = pltpu.roll(plane, stride, 0)
            return jnp.where(((row_ids >> r) & 1) == 0, fwd, bwd)

        _apply_gate(
            state_re, state_im, partner, (row_ids >> r) & 1,
            angles_ref[0, g, 0], angles_ref[0, g, 1], angles_ref[0, g, 2],
            controls_ref[0, 0, g], row_ids, lane_ids,
        )
        return carry

    for l in range(n_layers):
        jax.lax.fori_loop(bounds_ref[0, 0, 2 * l], bounds_ref[0, 0, 2 * l + 1], lane_gate, 0)
        jax.lax.fori_loop(bounds_ref[0, 0, 2 * l + 1], bounds_ref[0, 0, 2 * l + 2], row_gate, 0)


def _compact_energies_kernel(
    qubits_ref, controls_ref, angles_ref, bounds_ref, table_ref,
    out_ref, state_re, state_im,
    *, n_qubits: int, n_layers: int,
):
    rows = 1 << (n_qubits - LANE_BITS)
    _run_compact_circuit(
        qubits_ref, controls_ref, angles_ref, bounds_ref,
        state_re, state_im, n_qubits, n_layers,
    )
    prod = (state_re[:] * state_re[:] + state_im[:] * state_im[:]) * table_ref[:]
    out_ref[0, :, :] = jnp.sum(prod.reshape(rows // 8, 8, LANES), axis=0)


def _compact_probs_kernel(
    qubits_ref, controls_ref, angles_ref, bounds_ref,
    out_ref, state_re, state_im, dma_sem,
    *, n_qubits: int, n_layers: int,
):
    _run_compact_circuit(
        qubits_ref, controls_ref, angles_ref, bounds_ref,
        state_re, state_im, n_qubits, n_layers,
    )
    state_re[:] = state_re[:] * state_re[:] + state_im[:] * state_im[:]
    copy = pltpu.make_async_copy(state_re, out_ref.at[pl.program_id(0)], dma_sem)
    copy.start()
    copy.wait()


def _gather_gate_angles(angles: jax.Array, angle_index: jax.Array) -> jax.Array:
    """[P, L, n, 3] angle tensor + [P, G] flat indices -> [P, G, 3]."""
    pop = angles.shape[0]
    flat = angles.reshape(pop, -1, 3)
    return jnp.take_along_axis(flat, angle_index[:, :, None], axis=1)


@partial(jax.jit, static_argnames=("n_qubits", "n_layers", "interpret"))
def _compact_energies_call(
    qubits, controls, gate_angles, boundaries, table, n_qubits, n_layers, interpret=False
):
    pop, g_max = qubits.shape
    rows = 1 << (n_qubits - LANE_BITS)
    kernel = partial(_compact_energies_kernel, n_qubits=n_qubits, n_layers=n_layers)
    partials = pl.pallas_call(
        kernel,
        grid=(pop,),
        in_specs=[
            pl.BlockSpec((1, 1, g_max), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, g_max), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g_max, 3), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, boundaries.shape[1]), lambda p: (p, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((rows, LANES), lambda p: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((pop, 8, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        qubits[:, None, :], controls[:, None, :], gate_angles,
        boundaries[:, None, :], table.reshape(rows, LANES),
    )
    return jnp.sum(partials, axis=(-2, -1))


@partial(jax.jit, static_argnames=("n_qubits", "n_layers", "interpret"))
def _compact_probs_call(
    qubits, controls, gate_angles, boundaries, n_qubits, n_layers, interpret=False
):
    pop, g_max = qubits.shape
    rows = 1 << (n_qubits - LANE_BITS)
    kernel = partial(_compact_probs_kernel, n_qubits=n_qubits, n_layers=n_layers)
    out = pl.pallas_call(
        kernel,
        grid=(pop,),
        in_specs=[
            pl.BlockSpec((1, 1, g_max), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, g_max), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g_max, 3), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, boundaries.shape[1]), lambda p: (p, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((pop, rows, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qubits[:, None, :], controls[:, None, :], gate_angles, boundaries[:, None, :])
    return out.reshape(pop, rows * LANES)


def compact_energies_exact(
    compact: CompactGates, angles: jax.Array, table: jax.Array, interpret: bool = False
) -> jax.Array:
    """Exact diagonal-table energies [P] via the compacted-gate kernel.

    Same contract as :func:`pallas_energies_exact` with the genome
    structure pre-compacted (``compact_gates``); ``angles`` is the live
    [P, L, n, 3] tensor (gathered per gate in-graph)."""
    gate_angles = _gather_gate_angles(jnp.asarray(angles), jnp.asarray(compact.angle_index))
    return _compact_energies_call(
        compact.qubits, compact.controls, gate_angles, compact.boundaries,
        table, compact.n_qubits, compact.n_layers, interpret=interpret,
    )


def compact_probs(
    compact: CompactGates, angles: jax.Array, interpret: bool = False
) -> jax.Array:
    """Measurement probabilities [P, 2^n] via the compacted-gate kernel."""
    gate_angles = _gather_gate_angles(jnp.asarray(angles), jnp.asarray(compact.angle_index))
    return _compact_probs_call(
        compact.qubits, compact.controls, gate_angles, compact.boundaries,
        compact.n_qubits, compact.n_layers, interpret=interpret,
    )
