"""Pallas TPU kernels: fused whole-circuit population evaluation.

The jnp engine (statevector.py) round-trips the [2, 2^n] state through HBM
for every gate (~1.6 GB of traffic per 20-qubit individual per
evaluation).  This kernel keeps the state **resident in VMEM** for the
whole circuit: grid over the population, per-program scratch holds the
state planes, every gate is applied with VPU ops + ``pltpu.roll`` partner
exchanges, and only the final scalar energy (or the probability vector)
leaves the chip.

VMEM budget at n=20: state 2 x 4 MB + energy table 4 MB = 12 MB resident
plus roll temporaries — past the 16 MB default scoped budget (hence the
raised ``vmem_limit_bytes``) and, with the compiler's working set, at the
edge of the 128 MB physical VMEM; n=21 fails to compile, which pins the
documented n <= 20 working limit.  n < 7 (state smaller than one 128-lane
row) falls back to the jnp engine.

Layout: the 2^n amplitudes live as [R, 128] float32 planes with
R = 2^(n-7); flat index = row * 128 + lane, bit q of the flat index is
qubit q (same convention as statevector.py).  A gate on qubit q pairs
flat indices differing in bit q = distance 2^q, realized as two circular
rolls (one per direction) along lanes (q < 7) or rows (q >= 7) plus a
bit-select — no gathers, no reshapes.

Gate/genome semantics are identical to statevector.py (U3/CU3, gate-type
codes, control indices, layer masks); identity/control slots are skipped
with predicated regions rather than multiplied through.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
LANE_BITS = 7


def _u3_entries(theta, phi, lam):
    """Scalar U3 matrix entries as (re, im) pairs."""
    cos = jnp.cos(theta / 2)
    sin = jnp.sin(theta / 2)
    u00 = (cos, jnp.float32(0.0))
    u01 = (-jnp.cos(lam) * sin, -jnp.sin(lam) * sin)
    u10 = (jnp.cos(phi) * sin, jnp.sin(phi) * sin)
    u11 = (jnp.cos(phi + lam) * cos, jnp.sin(phi + lam) * cos)
    return u00, u01, u10, u11


def _apply_u3_slot(
    state_re, state_im, row_ids, lane_ids, rows, q,
    gate_type, control, theta, phi, lam,
):
    """Apply one (predicated) U3/CU3 slot on qubit ``q`` to the resident
    state planes.  ``q`` is static (unrolled slot loop); gate type,
    control and angles are dynamic SMEM scalars."""
    has_gate = jnp.logical_or(gate_type == 1, gate_type == 3)

    @pl.when(has_gate)
    def _():
        (u00r, u00i), (u01r, u01i), (u10r, u10i), (u11r, u11i) = _u3_entries(theta, phi, lam)

        re = state_re[:]
        im = state_im[:]

        # partner amplitudes: flat index XOR 2^q, as two circular rolls +
        # bit select on the lane axis (q < 7) or the sublane/row axis
        # (q >= 7) — rolls are native, reshapes force relayouts
        # (experiments/exp_slot_costs.py lane_vs_row)
        if q < LANE_BITS:
            shift = 1 << q
            # pltpu.roll requires non-negative shifts; rolling by
            # size-s is the circular equivalent of rolling by -s
            fwd_re = pltpu.roll(re, LANES - shift, 1)  # brings idx+2^q to idx
            fwd_im = pltpu.roll(im, LANES - shift, 1)
            bwd_re = pltpu.roll(re, shift, 1)          # brings idx-2^q to idx
            bwd_im = pltpu.roll(im, shift, 1)
            bit0 = ((lane_ids >> q) & 1) == 0
        else:
            stride = 1 << (q - LANE_BITS)
            fwd_re = pltpu.roll(re, rows - stride, 0)
            fwd_im = pltpu.roll(im, rows - stride, 0)
            bwd_re = pltpu.roll(re, stride, 0)
            bwd_im = pltpu.roll(im, stride, 0)
            bit0 = ((row_ids >> (q - LANE_BITS)) & 1) == 0
        partner_re = jnp.where(bit0, fwd_re, bwd_re)
        partner_im = jnp.where(bit0, fwd_im, bwd_im)

        # positions with bit=0 take row 0 of U against (self, partner);
        # positions with bit=1 take row 1 against (partner, self)
        a_re = jnp.where(bit0, u00r, u11r)
        a_im = jnp.where(bit0, u00i, u11i)
        b_re = jnp.where(bit0, u01r, u10r)
        b_im = jnp.where(bit0, u01i, u10i)

        new_re = a_re * re - a_im * im + b_re * partner_re - b_im * partner_im
        new_im = a_re * im + a_im * re + b_re * partner_im + b_im * partner_re

        is_crot = gate_type == 3
        # control bit from the narrow index vectors (control is dynamic:
        # select lane- vs row-derived bit by the scalar comparison)
        c_lane = jnp.clip(control, 0, LANE_BITS - 1)
        c_row = jnp.clip(control - LANE_BITS, 0, 31)
        lane_bit = (lane_ids >> c_lane) & 1
        row_bit = (row_ids >> c_row) & 1
        ctrl_bit = jnp.where(control < LANE_BITS, lane_bit, row_bit)
        active = jnp.logical_or(jnp.logical_not(is_crot), ctrl_bit == 1)

        state_re[:] = jnp.where(active, new_re, re)
        state_im[:] = jnp.where(active, new_im, im)


def _run_circuit_in_vmem(
    gate_types_ref,
    controls_ref,
    angles_ref,
    layer_mask_ref,
    state_re,
    state_im,
    n_qubits: int,
    n_layers: int,
    init_ref=None,
):
    """Shared kernel body: initialize the VMEM scratch planes (|0...0>, or
    a per-individual start state from ``init_ref`` [1, 2, R, 128]) and
    apply the whole genome circuit (layers predicated by mask, slots by
    gate type)."""
    rows = 1 << (n_qubits - LANE_BITS)

    # narrow index vectors; full [R, 128] masks are never materialized —
    # they broadcast lazily inside the selects (the dense versions cost
    # 12 MB of resident VMEM, which blows the budget at n=20)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    if init_ref is not None:
        state_re[:] = init_ref[0, 0]
        state_im[:] = init_ref[0, 1]
    else:
        # |0...0> (vectorized init — scalar stores to VMEM are not lowerable)
        state_re[:] = jnp.where(
            jnp.logical_and(row_ids == 0, lane_ids == 0), 1.0, 0.0
        ).astype(jnp.float32)
        state_im[:] = jnp.zeros((rows, LANES), jnp.float32)

    def apply_slot(l, q):
        _apply_u3_slot(
            state_re, state_im, row_ids, lane_ids, rows, q,
            gate_types_ref[0, l, q], controls_ref[0, l, q],
            angles_ref[0, l, q, 0], angles_ref[0, l, q, 1], angles_ref[0, l, q, 2],
        )

    def layer_body(l, carry):
        @pl.when(layer_mask_ref[0, l, 0] != 0)
        def _():
            for q in range(n_qubits):
                apply_slot(l, q)
        return carry

    jax.lax.fori_loop(0, n_layers, layer_body, 0)


def _population_probs_kernel(
    gate_types_ref,  # SMEM [1, L, n] int32
    controls_ref,    # SMEM [1, L, n] int32
    angles_ref,      # SMEM [1, L, n, 3] f32
    layer_mask_ref,  # SMEM [1, L, 1] int32
    *rest,           # [init_ref?], out_ref, state_re, state_im, dma_sem
    n_qubits: int,
    n_layers: int,
    has_init: bool,
):
    if has_init:
        init_ref, out_ref, state_re, state_im, dma_sem = rest
    else:
        out_ref, state_re, state_im, dma_sem = rest
        init_ref = None
    _run_circuit_in_vmem(
        gate_types_ref, controls_ref, angles_ref, layer_mask_ref,
        state_re, state_im, n_qubits, n_layers, init_ref,
    )
    # measurement probabilities overwrite the real plane, then one DMA
    # ships them to HBM — the only data leaving the chip per individual
    state_re[:] = state_re[:] * state_re[:] + state_im[:] * state_im[:]
    copy = pltpu.make_async_copy(state_re, out_ref.at[pl.program_id(0)], dma_sem)
    copy.start()
    copy.wait()


def _population_states_kernel(
    gate_types_ref,  # SMEM [1, L, n] int32
    controls_ref,    # SMEM [1, L, n] int32
    angles_ref,      # SMEM [1, L, n, 3] f32
    layer_mask_ref,  # SMEM [1, L, 1] int32
    out_ref,         # HBM [P, 2, R, 128] f32 (program p writes slot p)
    state_re,        # VMEM scratch [R, 128]
    state_im,        # VMEM scratch [R, 128]
    dma_sem_re,      # DMA completion semaphores
    dma_sem_im,
    *,
    n_qubits: int,
    n_layers: int,
):
    """Full statevector planes out (the layer-prefix cache of the batched
    optimizers: the state after the frozen prefix layers is computed once
    per parameter sweep and re-entered via the ``initial`` input of the
    probs/energies kernels)."""
    _run_circuit_in_vmem(
        gate_types_ref, controls_ref, angles_ref, layer_mask_ref,
        state_re, state_im, n_qubits, n_layers,
    )
    p = pl.program_id(0)
    copy_re = pltpu.make_async_copy(state_re, out_ref.at[p, 0], dma_sem_re)
    copy_im = pltpu.make_async_copy(state_im, out_ref.at[p, 1], dma_sem_im)
    copy_re.start()
    copy_im.start()
    copy_re.wait()
    copy_im.wait()


def _population_energies_kernel(
    gate_types_ref,  # SMEM [1, L, n] int32
    controls_ref,    # SMEM [1, L, n] int32
    angles_ref,      # SMEM [1, L, n, 3] f32
    layer_mask_ref,  # SMEM [1, L, 1] int32
    table_ref,       # VMEM [R, 128] f32 (diagonal energy table, all programs)
    *rest,           # [init_ref?], out_ref, state_re, state_im
    n_qubits: int,
    n_layers: int,
    has_init: bool,
):
    """Fully fused evaluation: the energy contraction happens against the
    VMEM-resident table, so only one (8, 128) partial-sum tile per
    individual leaves the chip (4 KB, vs a 4 MB probability plane + an
    HBM-side dot).  The tile shape satisfies Mosaic's (8, 128) minimum
    output block."""
    if has_init:
        init_ref, out_ref, state_re, state_im = rest
    else:
        out_ref, state_re, state_im = rest
        init_ref = None
    rows = 1 << (n_qubits - LANE_BITS)
    _run_circuit_in_vmem(
        gate_types_ref, controls_ref, angles_ref, layer_mask_ref,
        state_re, state_im, n_qubits, n_layers, init_ref,
    )
    prod = (state_re[:] * state_re[:] + state_im[:] * state_im[:]) * table_ref[:]
    out_ref[0, :, :] = jnp.sum(prod.reshape(rows // 8, 8, LANES), axis=0)


def _genome_in_specs(n_layers: int, n_qubits: int) -> list[pl.BlockSpec]:
    """Per-program SMEM blocks for the genome tensors."""
    return [
        pl.BlockSpec((1, n_layers, n_qubits), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n_layers, n_qubits), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n_layers, n_qubits, 3), lambda p: (p, 0, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n_layers, 1), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
    ]


@partial(jax.jit, static_argnames=("n_qubits", "interpret"))
def pallas_population_probs(
    gate_types: jax.Array,
    controls: jax.Array,
    angles: jax.Array,
    layer_mask: jax.Array,
    n_qubits: int,
    interpret: bool = False,
    initial: jax.Array | None = None,
) -> jax.Array:
    """Measurement probabilities [P, 2^n] via the fused VMEM kernel.

    The state never touches HBM; only the final probability planes are
    DMA'd out (4 MB per individual at n=20, vs ~1.6 GB of intermediate
    state traffic on the jnp path).

    :param interpret: run in the Pallas interpreter (CPU testing)
    :param initial: optional per-individual start states [P, 2, 2^n]
        (e.g. the cached layer-prefix states of the batched optimizers)
    """
    if n_qubits < LANE_BITS:
        raise ValueError("the fused kernel requires n_qubits >= 7")
    pop, n_layers = gate_types.shape[0], gate_types.shape[1]
    rows = 1 << (n_qubits - LANE_BITS)
    has_init = initial is not None

    kernel = partial(
        _population_probs_kernel, n_qubits=n_qubits, n_layers=n_layers, has_init=has_init
    )
    in_specs = _genome_in_specs(n_layers, n_qubits)
    operands = [
        gate_types,
        controls,
        angles,
        layer_mask.astype(jnp.int32)[:, :, None],
    ]
    if has_init:
        in_specs.append(pl.BlockSpec((1, 2, rows, LANES), lambda p: (p, 0, 0, 0)))
        operands.append(initial.reshape(pop, 2, rows, LANES))
    out = pl.pallas_call(
        kernel,
        grid=(pop,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((pop, rows, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        # the default 16 MB scoped-vmem budget cannot hold the state planes
        # plus the roll temporaries at n=20; raise it toward the physical
        # VMEM capacity
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out.reshape(pop, rows * LANES)


@partial(jax.jit, static_argnames=("n_qubits", "interpret"))
def pallas_population_states(
    gate_types: jax.Array,
    controls: jax.Array,
    angles: jax.Array,
    layer_mask: jax.Array,
    n_qubits: int,
    interpret: bool = False,
) -> jax.Array:
    """Statevector re/im planes [P, 2, 2^n] via the fused VMEM kernel
    (same contract as ``simulate_circuits``): used to compute the frozen
    layer-prefix states once per optimizer parameter sweep."""
    if n_qubits < LANE_BITS:
        raise ValueError("the fused kernel requires n_qubits >= 7")
    pop, n_layers = gate_types.shape[0], gate_types.shape[1]
    rows = 1 << (n_qubits - LANE_BITS)

    kernel = partial(_population_states_kernel, n_qubits=n_qubits, n_layers=n_layers)
    out = pl.pallas_call(
        kernel,
        grid=(pop,),
        in_specs=_genome_in_specs(n_layers, n_qubits),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((pop, 2, rows, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        gate_types,
        controls,
        angles,
        layer_mask.astype(jnp.int32)[:, :, None],
    )
    return out.reshape(pop, 2, rows * LANES)


@partial(jax.jit, static_argnames=("n_qubits", "interpret"))
def pallas_energies_exact(
    gate_types: jax.Array,
    controls: jax.Array,
    angles: jax.Array,
    layer_mask: jax.Array,
    table: jax.Array,
    n_qubits: int,
    interpret: bool = False,
    initial: jax.Array | None = None,
) -> jax.Array:
    """Exact diagonal-table energies [P], fully fused in VMEM: the state
    never touches HBM AND the diagonal contraction happens in-kernel —
    only 128 lane-partial sums per individual are shipped out (512 B,
    vs the 4 MB probability plane + a 128 MB HBM-side dot per batch of
    the unfused formulation).

    Same contract as ``_energies_exact`` (evaluators.py) for n_qubits >= 7
    and diagonal operators; ``initial`` optionally provides per-individual
    start states [P, 2, 2^n] (the optimizer layer-prefix cache).
    """
    if n_qubits < LANE_BITS:
        raise ValueError("the fused kernel requires n_qubits >= 7")
    pop, n_layers = gate_types.shape[0], gate_types.shape[1]
    rows = 1 << (n_qubits - LANE_BITS)
    if rows < 8:
        # below 10 qubits the (8, 128) partial-sum tile cannot be formed;
        # the probability plane is tiny there anyway — ship it and dot
        probs = pallas_population_probs(
            gate_types, controls, angles, layer_mask, n_qubits,
            interpret=interpret, initial=initial,
        )
        return jnp.dot(probs, table.reshape(-1), preferred_element_type=jnp.float32)

    has_init = initial is not None
    kernel = partial(
        _population_energies_kernel, n_qubits=n_qubits, n_layers=n_layers, has_init=has_init
    )
    in_specs = _genome_in_specs(n_layers, n_qubits)
    # the table block is the same for every program — the pipeline
    # fetches it once and keeps it VMEM-resident
    in_specs.append(pl.BlockSpec((rows, LANES), lambda p: (0, 0)))
    operands = [
        gate_types,
        controls,
        angles,
        layer_mask.astype(jnp.int32)[:, :, None],
        table.reshape(rows, LANES),
    ]
    if has_init:
        in_specs.append(pl.BlockSpec((1, 2, rows, LANES), lambda p: (p, 0, 0, 0)))
        operands.append(initial.reshape(pop, 2, rows, LANES))
    partials = pl.pallas_call(
        kernel,
        grid=(pop,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, LANES), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((pop, 8, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return jnp.sum(partials, axis=(-2, -1))


def _population_sampled_energies_kernel(
    gate_types_ref,  # SMEM [1, L, n] int32
    controls_ref,    # SMEM [1, L, n] int32
    angles_ref,      # SMEM [1, L, n, 3] f32
    layer_mask_ref,  # SMEM [1, L, 1] int32
    frac_ref,        # VMEM [1, S, 1] f32 uniform draws in [0, 1)
    *rest,           # [init_ref?], out_ref, state_re, state_im
    n_qubits: int,
    n_layers: int,
    shots: int,
    has_init: bool,
):
    """Fused simulate + measure: the whole inverse-CDF shot sampler runs
    in-kernel against the VMEM-resident probabilities, so only the [S]
    sampled ENERGIES leave the chip (2 KB at 512 shots) instead of the
    4 MB probability plane plus an XLA-side cumsum/searchsorted/gather
    cascade (measured ~7 ms of the round-2 sampler path's cost at
    n=20/pop-32).

    The uniform draws come IN (host-keyed threefry, the same stream as
    ``sample_indices``); ``u = frac * total`` reproduces that path's
    draw values exactly, so the sampled multiset matches up to
    summation-tree rounding on rare boundary draws.

    The CDF is hierarchical — (64 blocks) x (128 rows) x (128 lanes) —
    with each level resolved for ALL shots at once, in EXACT f32
    arithmetic: Mosaic lowers f32 matmuls to bf16 passes at every
    precision setting (measured: 0% shot agreement with the flat stream
    at default precision, 98.4% at HIGHEST — the last bf16 limb is
    dropped), so (a) one-hot gathers run as THREE default-precision
    matmuls against a bf16-exact three-way split of the value matrix
    (each pass multiplies a 0/1 one-hot with a bf16-exact limb and
    accumulates in f32 — exact), and (b) prefix sums run as log-step
    roll-scans on the VPU (exact f32 adds), never on the MXU.  No
    scalar loops, no cross-tile shape casts (the block/row summaries
    come from selector-matrix gathers instead of reshapes).
    """
    if has_init:
        init_ref, out_ref, state_re, state_im = rest
    else:
        out_ref, state_re, state_im = rest
        init_ref = None
    _run_circuit_in_vmem(
        gate_types_ref, controls_ref, angles_ref, layer_mask_ref,
        state_re, state_im, n_qubits, n_layers, init_ref,
    )
    _sample_shots_in_vmem(state_re, state_im, frac_ref, out_ref, n_qubits, shots)


def _sample_shots_in_vmem(state_re, state_im, frac_ref, out_ref, n_qubits, shots):
    """Shared epilogue of the fused simulate+measure kernels: run the
    hierarchical inverse-CDF sampler against the VMEM-resident state and
    store the [S] sampled STATE INDICES as int32 (docstring above).

    Returning indices instead of energies (round 4) halves the level-C
    matmul cost — the energy gather moves OUTSIDE the kernel, where an
    XLA take of S indices against the HBM table is both exact and
    nearly free — and removes the energy table from VMEM entirely
    (which is what lets the one-launch grouped sampler hold any number
    of measurement groups).  Sampled indices are bit-identical to the
    energy-emitting round-3 epilogue's selections."""
    probs = state_re[:] * state_re[:] + state_im[:] * state_im[:]
    _sample_shots_from_probs(
        probs, frac_ref, out_ref, n_qubits, shots,
        recompute=lambda: state_re[:] * state_re[:] + state_im[:] * state_im[:],
    )


def _sample_shots_from_probs(probs, frac_ref, out_ref, n_qubits, shots, recompute=None):
    """The hierarchical inverse-CDF sampler on a probability VALUE
    (round 5 split: the one-launch grouped kernel stages each group's
    probabilities into a stacked scratch plane and resolves all groups
    from there, detaching the epilogues from the state planes — see
    pallas_fold_kernels._grouped_sampled_folded_kernel).  ``recompute``
    optionally rebuilds the probability plane cheaply (from the state
    planes) for the per-chunk limb path at n>=22, where holding the
    limbs would cost 3 extra full planes."""
    rows = 1 << (n_qubits - LANE_BITS)
    n_blocks = rows // LANES

    def split3(v):
        """f32 -> three bf16-exact f32 limbs with v == l1 + l2 + l3."""
        l1 = v.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = v - l1
        l2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
        l3 = r1 - l2
        return l1, l2, l3

    def gather_dot(onehot, value, dims=(((1,), (0,)), ((), ()))):
        """Exact one-hot gather: sum of three default-precision passes."""
        return sum(
            jax.lax.dot_general(onehot, limb, dims, preferred_element_type=jnp.float32)
            for limb in split3(value)
        )

    def lane_scan(x, width):
        """Inclusive prefix sum along lanes (exact f32 roll-adds)."""
        lane_pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        d = 1
        while d < width:
            x = x + jnp.where(lane_pos >= d, pltpu.roll(x, d, 1), 0.0)
            d *= 2
        return x

    def sublane_scan(x, height):
        """Inclusive prefix sum along sublanes (exact f32 roll-adds)."""
        sub_pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        d = 1
        while d < height:
            x = x + jnp.where(sub_pos >= d, pltpu.roll(x, d, 0), 0.0)
            d *= 2
        return x

    # per-row masses [rows, 1] (VPU reduction — exact)
    row_tot = jnp.sum(probs, axis=1, keepdims=True)
    # selector gathers replace the (unsupported) [rows,1]->[B,R] reshape:
    # Bsel[g, b] = 1 iff row g lies in block b; Rsel[j, g] = 1 iff row g
    # is the j-th row of its block — exactly one g satisfies both, so
    # r2t[j, b] = row_tot[b*128 + j] (a pure gather).  Past 128 blocks
    # (n=22) the Bsel gather runs in 128-block half-passes so no single
    # selector plane exceeds one state plane's footprint.
    row_ids_col = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    sub128 = jax.lax.broadcasted_iota(jnp.int32, (LANES, rows), 0)
    lane_rows_wide = jax.lax.broadcasted_iota(jnp.int32, (LANES, rows), 1)
    rsel = ((lane_rows_wide % LANES) == sub128).astype(jnp.float32)  # [128, rows]
    r2t_parts = []
    for b0 in range(0, n_blocks, LANES):
        width = min(LANES, n_blocks - b0)
        blk_lanes = b0 + jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
        bsel = ((row_ids_col // LANES) == blk_lanes).astype(jnp.float32)
        r2t_parts.append(gather_dot(rsel, bsel * row_tot))
    r2t = (
        r2t_parts[0] if len(r2t_parts) == 1 else jnp.concatenate(r2t_parts, axis=1)
    )  # [128, B]
    # in-block inclusive row prefix (exact)
    row_prefix_t = sublane_scan(r2t, LANES)  # [128, B]
    # block totals = the prefix's last row; taken as a max-reduction
    # (probabilities are nonnegative, so the prefix is nondecreasing)
    # because a [127:128, :] slice carries a sublane offset that the
    # concatenate below cannot lower ("offset mismatch on non-concat
    # dimension")
    block_tot = jnp.max(row_prefix_t, axis=0, keepdims=True)  # [1, B]
    # inclusive block prefix: pad the block totals onto a full lane tile
    # and roll-scan (exact); positions past n_blocks hold garbage partial
    # sums and are never read
    if n_blocks < LANES:
        padded = jnp.concatenate(
            [block_tot, jnp.zeros((1, LANES - n_blocks), jnp.float32)], axis=1
        )
        cb = lane_scan(padded, n_blocks)[:, :n_blocks]  # [1, B]
    elif n_blocks == LANES:
        cb = lane_scan(block_tot, n_blocks)
    else:
        # > 128 blocks (n=22): scan each 128-lane tile independently,
        # then chain the tile carries (exact f32 adds, tile-aligned
        # slices only)
        tiles = [
            lane_scan(block_tot[:, t : t + LANES], LANES)
            for t in range(0, n_blocks, LANES)
        ]
        chained = [tiles[0]]
        for tile in tiles[1:]:
            carry = jnp.max(chained[-1], axis=1, keepdims=True)  # last entry
            chained.append(tile + carry)
        cb = jnp.concatenate(chained, axis=1)  # [1, B]
    total = jnp.sum(block_tot)

    u = frac_ref[0] * total  # [S, 1] — identical values to sample_indices' draws

    # level A: block index = count of inclusive block-prefix values <= u
    # (searchsorted-right semantics, matching sim/sampling.py)
    cmp_a = cb <= u  # [S, B]
    block = jnp.minimum(
        jnp.sum(cmp_a.astype(jnp.int32), axis=1, keepdims=True), n_blocks - 1
    )
    base_a = jnp.max(jnp.where(cmp_a, cb, 0.0), axis=1, keepdims=True)
    u1 = u - base_a

    lane_blocks = jax.lax.broadcasted_iota(jnp.int32, (shots, n_blocks), 1)
    oh_block = (lane_blocks == block).astype(jnp.float32)  # [S, B]
    # the shot's block's row-prefix vector: contract the one-hot with
    # row_prefix_t over the BLOCK axis -> [S, 128] (exact gather)
    row_prefix = gather_dot(oh_block, row_prefix_t, (((1,), (1,)), ((), ())))
    cmp_b = row_prefix <= u1
    row = jnp.minimum(
        jnp.sum(cmp_b.astype(jnp.int32), axis=1, keepdims=True), LANES - 1
    )
    base_b = jnp.max(jnp.where(cmp_b, row_prefix, 0.0), axis=1, keepdims=True)
    u2 = u1 - base_b

    # level C: one-hot row gather of the probability AND energy planes,
    # processed in 128-shot chunks that STORE their energies immediately
    # — each chunk's [128, rows] one-hot is dead at its store, so the
    # scheduler can reuse the buffers (a monolithic [S, rows] one-hot
    # blows the scoped VMEM budget at n=20 / 512 shots)
    global_row = block * LANES + row  # [S, 1]
    # n <= 21: hold the three bf16-exact probability limbs across the
    # chunk loop (fewer full-plane passes).  n = 22: a held limb set is
    # 3 x 16 MB on top of the states — recompute probs/limbs inside each
    # chunk instead, so only one limb plane is live per dot (identical
    # values: split3 of the identical probs expression)
    hold_limbs = n_qubits < 22 or recompute is None
    if hold_limbs:
        probs_limbs = split3(probs)
    chunk_bounds = list(range(0, shots, LANES)) + [shots]
    for c0, c1 in zip(chunk_bounds[:-1], chunk_bounds[1:]):
        size = c1 - c0
        lane_rows = jax.lax.broadcasted_iota(jnp.int32, (size, rows), 1)
        oh_row = (lane_rows == global_row[c0:c1, :]).astype(jnp.float32)
        dims = (((1,), (0,)), ((), ()))
        chunk_limbs = probs_limbs if hold_limbs else split3(recompute())
        p_row = sum(
            jax.lax.dot_general(oh_row, limb, dims, preferred_element_type=jnp.float32)
            for limb in chunk_limbs
        )  # [size, 128]
        lane_prefix = lane_scan(p_row, LANES)
        lane = jnp.minimum(
            jnp.sum(
                (lane_prefix <= u2[c0:c1, :]).astype(jnp.int32), axis=1, keepdims=True
            ),
            LANES - 1,
        )
        out_ref[0, c0:c1, :] = global_row[c0:c1, :] * LANES + lane


@partial(jax.jit, static_argnames=("n_qubits", "shots", "interpret"))
def pallas_sampled_shot_energies(
    gate_types: jax.Array,   # [P, L, n]
    controls: jax.Array,     # [P, L, n]
    angles: jax.Array,       # [P, L, n, 3]
    layer_mask: jax.Array,   # [P, L]
    table: jax.Array,        # [2^n] diagonal energy table
    u_frac: jax.Array,       # [P, shots] uniform draws in [0, 1)
    n_qubits: int,
    shots: int,
    interpret: bool = False,
    initial: jax.Array | None = None,
) -> jax.Array:
    """Sampled shot energies [P, shots] with simulation AND measurement
    sampling fused in one kernel (in-VMEM hierarchical inverse CDF) —
    the sampler-path analog of ``pallas_energies_exact``.

    ``u_frac`` carries the per-shot uniforms (2 KB per individual at 512
    shots — the only sampling input), drawn from the same threefry keys
    as ``sample_indices`` so the stream is shared with the non-fused
    fast path (boundary draws may flip bins at the summation-tree
    rounding level).  ``initial`` optionally provides per-individual
    start states [P, 2, 2^n] (the optimizer layer-prefix cache).
    Requires ``n_qubits >= 14`` (the block hierarchy needs >= 128 rows).
    """
    if n_qubits < LANE_BITS + LANE_BITS:
        raise ValueError("the in-kernel sampler requires n_qubits >= 14")
    pop, n_layers = gate_types.shape[0], gate_types.shape[1]
    rows = 1 << (n_qubits - LANE_BITS)
    has_init = initial is not None

    kernel = partial(
        _population_sampled_energies_kernel,
        n_qubits=n_qubits, n_layers=n_layers, shots=shots, has_init=has_init,
    )
    in_specs = _genome_in_specs(n_layers, n_qubits)
    in_specs.append(pl.BlockSpec((1, shots, 1), lambda p: (p, 0, 0)))
    operands = [
        jnp.asarray(gate_types, jnp.int32),
        jnp.asarray(controls, jnp.int32),
        jnp.asarray(angles, jnp.float32),
        jnp.asarray(layer_mask, jnp.int32)[:, :, None],
        jnp.asarray(u_frac, jnp.float32).reshape(pop, shots, 1),
    ]
    if has_init:
        in_specs.append(pl.BlockSpec((1, 2, rows, LANES), lambda p: (p, 0, 0, 0)))
        operands.append(initial.reshape(pop, 2, rows, LANES))
    out = pl.pallas_call(
        kernel,
        grid=(pop,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, shots, 1), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((pop, shots, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    # exact energy gather OUTSIDE the kernel: S indices against the HBM
    # table (the kernel emits sampled state indices — see the epilogue)
    return jnp.asarray(table, jnp.float32).reshape(-1)[out.reshape(pop, shots)]


def _kernel_atan2(y, x):
    """Polynomial atan2 (Mosaic has no atan/atan2 lowering): odd minimax
    polynomial on [0, 1] + octant/quadrant reduction; max error ~2e-6 vs
    np.arctan2 (validated on hardware)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    big = jnp.maximum(ax, ay)
    small = jnp.minimum(ax, ay)
    t = small / jnp.maximum(big, jnp.float32(1e-30))
    t2 = t * t
    p = jnp.float32(-0.0117212)
    for c in (0.05265332, -0.11643287, 0.19354346, -0.33262348, 0.99997726):
        p = p * t2 + jnp.float32(c)
    r = p * t
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _nft_layer_sweep_kernel(
    gate_types_ref,  # SMEM [1, 1, n] int32 (the optimized layer's slots)
    controls_ref,    # SMEM [1, 1, n] int32
    angles_ref,      # SMEM [1, n, 3] f32 (the layer's starting angles)
    coords_ref,      # SMEM [1, K, 2] int32 (qubit, angle) per free coord
    meta_ref,        # SMEM [1, 1, 2] int32 (n_free, active)
    prefix_ref,      # ANY [P, 2, R, 128] cached prefix states
    table_ref,       # VMEM [R, 128] diagonal energy table (shared block)
    out_angles_ref,  # SMEM out [1, n, 3]
    out_z_ref,       # SMEM out [1, 1]
    angles_s,        # SMEM scratch (n, 3) current angles
    z_s,             # SMEM scratch (1,) recycled z0
    prefix_re, prefix_im,  # VMEM scratch planes (resident prefix)
    work_re, work_im,      # VMEM scratch planes (probe state)
    sem_re, sem_im,
    *,
    n_qubits: int,
    maxiter: int,
    reset_interval: int,
):
    """The ENTIRE last-layer NFT sweep for one individual in one kernel
    program: the cached prefix state is DMA'd into VMEM once and stays
    resident; every probe copies it into the working planes, applies the
    optimized layer from the mutable SMEM angle scratch, and contracts
    against the resident table; the 3-point sinusoid update (polynomial
    atan2) runs on the scalar core.  Replaces 2*maxiter+1 kernel
    launches — each re-reading the prefix from HBM — with one.
    """
    rows = 1 << (n_qubits - LANE_BITS)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    p = pl.program_id(0)

    copy_re = pltpu.make_async_copy(prefix_ref.at[p, 0], prefix_re, sem_re)
    copy_im = pltpu.make_async_copy(prefix_ref.at[p, 1], prefix_im, sem_im)
    copy_re.start()
    copy_im.start()
    for q in range(n_qubits):
        for a_i in range(3):
            angles_s[q, a_i] = angles_ref[0, q, a_i]
    copy_re.wait()
    copy_im.wait()

    def eval_energy():
        work_re[:] = prefix_re[:]
        work_im[:] = prefix_im[:]
        for q in range(n_qubits):
            _apply_u3_slot(
                work_re, work_im, row_ids, lane_ids, rows, q,
                gate_types_ref[0, 0, q], controls_ref[0, 0, q],
                angles_s[q, 0], angles_s[q, 1], angles_s[q, 2],
            )
        prod = (work_re[:] * work_re[:] + work_im[:] * work_im[:]) * table_ref[:]
        return jnp.sum(prod)

    z_s[0] = eval_energy()

    n_free = meta_ref[0, 0, 0]
    apply_updates = jnp.logical_and(meta_ref[0, 0, 1] != 0, n_free > 0)

    def step(k, carry):
        @pl.when(jnp.logical_and(k % reset_interval == 0, k > 0))
        def _():
            z_s[0] = eval_energy()

        idx = k % jnp.maximum(n_free, 1)
        q = coords_ref[0, idx, 0]
        a_i = coords_ref[0, idx, 1]
        theta = angles_s[q, a_i]

        angles_s[q, a_i] = theta + jnp.float32(np.pi / 2)
        z1 = eval_energy()
        angles_s[q, a_i] = theta - jnp.float32(np.pi / 2)
        z3 = eval_energy()

        z0 = z_s[0]
        mid = (z1 + z3) * jnp.float32(0.5)
        half_diff = (z1 - z3) * jnp.float32(0.5)
        shift = _kernel_atan2(half_diff, z0 - mid)
        minimum_value = mid - jnp.sqrt((z0 - mid) * (z0 - mid) + half_diff * half_diff)

        new_theta = theta + shift + jnp.float32(np.pi)
        angles_s[q, a_i] = jnp.where(apply_updates, new_theta, theta)
        z_s[0] = jnp.where(apply_updates, minimum_value, z_s[0])
        return carry

    jax.lax.fori_loop(0, maxiter, step, 0)

    for q in range(n_qubits):
        for a_i in range(3):
            out_angles_ref[0, q, a_i] = angles_s[q, a_i]
    out_z_ref[0, 0, 0] = z_s[0]


@partial(jax.jit, static_argnames=("n_qubits", "maxiter", "reset_interval", "interpret"))
def pallas_nft_layer_sweep(
    gate_types: jax.Array,   # [P, n] the optimized layer's slots
    controls: jax.Array,     # [P, n]
    angles: jax.Array,       # [P, n, 3]
    coords: jax.Array,       # [P, K, 2] (qubit, angle) free coordinates
    n_free: jax.Array,       # [P]
    active: jax.Array,       # [P]
    prefix: jax.Array,       # [P, 2, 2^n] cached prefix states
    table: jax.Array,        # [2^n] diagonal energy table
    n_qubits: int,
    maxiter: int,
    reset_interval: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Whole-population last-layer NFT sweep fully inside the fused
    kernel (one launch): returns (updated layer angles [P, n, 3], final
    recycled energies [P]).  Exact diagonal objectives only; identical
    update math to ``optim/nft._nft_scan`` (atan2 via a ~2e-6 polynomial).
    """
    if n_qubits < LANE_BITS:
        raise ValueError("the fused kernel requires n_qubits >= 7")
    pop = gate_types.shape[0]
    k_max = coords.shape[1]
    rows = 1 << (n_qubits - LANE_BITS)

    kernel = partial(
        _nft_layer_sweep_kernel,
        n_qubits=n_qubits, maxiter=maxiter, reset_interval=reset_interval,
    )
    meta = jnp.stack(
        [jnp.asarray(n_free, jnp.int32), jnp.asarray(active, jnp.int32)], axis=1
    )[:, None, :]
    out_angles, out_z = pl.pallas_call(
        kernel,
        grid=(pop,),
        in_specs=[
            pl.BlockSpec((1, 1, n_qubits), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_qubits), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_qubits, 3), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k_max, 2), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rows, LANES), lambda p: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_qubits, 3), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pop, n_qubits, 3), jnp.float32),
            jax.ShapeDtypeStruct((pop, 1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.SMEM((n_qubits, 3), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        jnp.asarray(gate_types, jnp.int32)[:, None, :],
        jnp.asarray(controls, jnp.int32)[:, None, :],
        jnp.asarray(angles, jnp.float32),
        jnp.asarray(coords, jnp.int32),
        meta,
        jnp.asarray(prefix, jnp.float32).reshape(pop, 2, rows, LANES),
        jnp.asarray(table, jnp.float32).reshape(rows, LANES),
    )
    return out_angles, out_z[:, 0, 0]


def pallas_supported(n_qubits: int, platform: str) -> bool:
    """True when the fused kernel path applies (TPU, state fits VMEM)."""
    return platform == "tpu" and LANE_BITS <= n_qubits <= 20
