"""Pallas TPU kernels for the kron-fold (MXU) circuit formulation.

Consumes the tensors of :mod:`queasars_tpu.sim.fold_pipeline`: the
circuit is L+1 kron layers of per-qubit 2x2 factors plus L controlled-
diagonal phase passes.  Each kron layer applies as ONE complex matmul
per 7-qubit axis group on the MXU:

- lane group (qubits 0-6): ``state @ U^T`` contracting the lane axis —
  one [R, 128] x [128, 128] matmul pair;
- row group (qubits 7-13): ``U @ block`` per 128-row block (the group's
  bits are the low row bits);
- top group (qubits >= 14): the block-index contraction
  ``new[b] = sum_b' U[b, b'] x[b']`` on the [B, 128, 128] row split,
  one 3D ``dot_general``.

The [S, S] group matrices are built IN-KERNEL from the per-qubit 2x2
SMEM factors — kron entry [i, j] = prod_q A_q[bit_q(i), bit_q(j)] — at
~1 us per group (elementwise over [128, 128]), so only ~160 KB of 2x2
factors ship to the chip instead of prebuilt fold matrices.

Numerical policy (measured, experiments/exp_mxu_fold2.py): Mosaic's
default-precision f32 matmul is a single bf16 pass (~1e-3/matmul —
outside the engine gates); ``Precision.HIGHEST`` matches the VPU path
to ~1e-5 over a full circuit.  The complex product uses the Gauss
3-multiplication form (t1=ar@br, t2=ai@bi, t3=(ar+ai)@(br+bi)), 15%
faster than the naive 4-matmul form at HIGHEST.  ``precision="default"``
is available for statistical paths where ~1e-3 state error is far below
shot noise.

Diagonal passes run on the VPU: per controlled rotation, the phase
(selected by the dynamic target bit) multiplies the state where the
dynamic control bit is 1 — ~10 elementwise ops, no partner exchange.

The public wrappers mirror pallas_kernels.py's contracts
(probs / exact energies / sampled shot energies, optional per-individual
initial states) and reuse its sampler epilogue.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from queasars_tpu.sim.fold_pipeline import FoldPipeline, n_axis_groups
from queasars_tpu.sim.pallas_kernels import LANE_BITS, LANES, _sample_shots_in_vmem

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    # Mosaic lowers only DEFAULT and HIGHEST dot precisions; "high" is
    # emulated in _gauss_mm as the same bf16x3 scheme Precision.HIGH
    # compiles to (split both operands into bf16 limbs, drop lo@lo) —
    # half the MXU passes of HIGHEST.
    "high": "bf16x3",
    "default": None,
}

# Past this many state rows, whole-state group matmuls would overflow
# VMEM with their Gauss temporaries (3 full planes); the kernels switch
# to chunk-bounded application.  Tests shrink these to exercise the
# chunked paths in interpret mode at small n.
_WHOLE_STATE_MAX_ROWS = 1 << 14
_LANE_CHUNK_ROWS = 1 << 12
_TOP_SUB_CHUNK_ROWS = 1 << 9


def _mm_bf16x3(a, b, dims):
    """Three-pass bf16 matmul (the scheme ``Precision.HIGH`` lowers to):
    split both operands into bf16 limbs, accumulate hi@hi + hi@lo +
    lo@hi in f32, drop lo@lo (~2^-16 relative)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    mm = lambda x, y: jax.lax.dot_general(x, y, dims, preferred_element_type=jnp.float32)
    return mm(a_hi, b_hi) + mm(a_hi, b_lo) + mm(a_lo, b_hi)


def _gauss_mm(ar, ai, br, bi, dims, precision):
    """Complex matmul via Gauss's 3-multiplication trick."""
    if precision == "bf16x3":
        mm = lambda a, b: _mm_bf16x3(a, b, dims)
    else:
        mm = lambda a, b: jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32, precision=precision
        )
    t1 = mm(ar, br)
    t2 = mm(ai, bi)
    t3 = mm(ar + ai, br + bi)
    return t1 - t2, t3 - t1 - t2


def _build_group_fold(factors_ref, k, q0, m):
    """Expand the [2^m, 2^m] group matrix from SMEM 2x2 factors.

    kron entry [i, j] = prod over local qubits jq of A_{q0+jq}[bi, bj]
    with bi/bj = bit jq of i/j (little-endian).  Returns (re, im)
    [2^m, 2^m] arrays.
    """
    size = 1 << m
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    acc_re = acc_im = None
    for jq in range(m):
        q = q0 + jq
        a = [
            [
                (factors_ref[0, k, q, 0, bi, bj], factors_ref[0, k, q, 1, bi, bj])
                for bj in range(2)
            ]
            for bi in range(2)
        ]
        bi = (i_ids >> jq) & 1
        bj = (j_ids >> jq) & 1
        f_re = jnp.where(
            bi == 0,
            jnp.where(bj == 0, a[0][0][0], a[0][1][0]),
            jnp.where(bj == 0, a[1][0][0], a[1][1][0]),
        )
        f_im = jnp.where(
            bi == 0,
            jnp.where(bj == 0, a[0][0][1], a[0][1][1]),
            jnp.where(bj == 0, a[1][0][1], a[1][1][1]),
        )
        if acc_re is None:
            acc_re, acc_im = f_re, f_im
        else:
            acc_re, acc_im = (
                acc_re * f_re - acc_im * f_im,
                acc_re * f_im + acc_im * f_re,
            )
    return acc_re, acc_im


def _apply_kron_layer(
    state_re, state_im, factors_ref, group_active_ref, k, n_qubits, precision
):
    """Apply kron layer ``k``: one (predicated) group matmul per axis group."""
    rows = 1 << (n_qubits - LANE_BITS)
    n_groups = n_axis_groups(n_qubits)

    # lane group: contract the lane axis, state @ U^T.  Past n=21 the
    # whole-state Gauss temporaries (3 full planes) overflow VMEM, so the
    # matmul runs over row chunks (each output row depends only on the
    # same input rows — chunked in-place application is exact)
    @pl.when(group_active_ref[0, k, 0] != 0)
    def _():
        u_re, u_im = _build_group_fold(factors_ref, k, 0, LANE_BITS)
        dims = (((1,), (1,)), ((), ()))
        if rows <= _WHOLE_STATE_MAX_ROWS:
            re, im = _gauss_mm(state_re[:], state_im[:], u_re, u_im, dims, precision)
            state_re[:] = re
            state_im[:] = im
        else:
            chunk = min(_LANE_CHUNK_ROWS, rows)
            for h in range(rows // chunk):
                sl = slice(h * chunk, (h + 1) * chunk)
                re, im = _gauss_mm(state_re[sl, :], state_im[sl, :], u_re, u_im, dims, precision)
                state_re[sl, :] = re
                state_im[sl, :] = im

    if n_groups >= 2:
        m1 = min(LANE_BITS, n_qubits - LANE_BITS)
        s1 = 1 << m1

        @pl.when(group_active_ref[0, k, 1] != 0)
        def _():
            u_re, u_im = _build_group_fold(factors_ref, k, LANE_BITS, m1)
            dims = (((1,), (0,)), ((), ()))
            for h in range(rows // s1):
                sl = slice(h * s1, (h + 1) * s1)
                re, im = _gauss_mm(u_re, u_im, state_re[sl, :], state_im[sl, :], dims, precision)
                state_re[sl, :] = re
                state_im[sl, :] = im

    if n_groups >= 3:
        m2 = n_qubits - 2 * LANE_BITS
        blocks = 1 << m2
        dims = (((1,), (0,)), ((), ()))

        if blocks * LANES <= _WHOLE_STATE_MAX_ROWS:

            @pl.when(group_active_ref[0, k, 2] != 0)
            def _():
                u_re, u_im = _build_group_fold(factors_ref, k, 2 * LANE_BITS, m2)
                xr = state_re[:].reshape(blocks, LANES, LANES)
                xi = state_im[:].reshape(blocks, LANES, LANES)
                re, im = _gauss_mm(u_re, u_im, xr, xi, dims, precision)
                state_re[:] = re.reshape(rows, LANES)
                state_im[:] = im.reshape(rows, LANES)

        else:
            # n=22: the single [2^m2, 2^m2] block contraction spills VMEM
            # (3 full-plane Gauss temporaries).  The group matrix is itself
            # a kron product, so split it into two sub-kron contractions —
            # low block bits (contiguous [sA, 128, 128] chunks) then high
            # block bits (strided chunks stacked per hi value) — each with
            # chunk-bounded temporaries.
            m2a = m2 // 2
            m2b = m2 - m2a
            s_a, s_b = 1 << m2a, 1 << m2b
            inner = s_a * LANES  # rows per high-bits value

            @pl.when(group_active_ref[0, k, 2] != 0)
            def _():
                ua_re, ua_im = _build_group_fold(factors_ref, k, 2 * LANE_BITS, m2a)
                for h in range(s_b):
                    sl = slice(h * inner, (h + 1) * inner)
                    xr = state_re[sl, :].reshape(s_a, LANES, LANES)
                    xi = state_im[sl, :].reshape(s_a, LANES, LANES)
                    re, im = _gauss_mm(ua_re, ua_im, xr, xi, dims, precision)
                    state_re[sl, :] = re.reshape(inner, LANES)
                    state_im[sl, :] = im.reshape(inner, LANES)
                ub_re, ub_im = _build_group_fold(
                    factors_ref, k, 2 * LANE_BITS + m2a, m2b
                )
                chunk = min(_TOP_SUB_CHUNK_ROWS, inner)
                for c in range(inner // chunk):
                    sls = [
                        slice(h * inner + c * chunk, h * inner + (c + 1) * chunk)
                        for h in range(s_b)
                    ]
                    xr = jnp.stack([state_re[sl, :] for sl in sls])
                    xi = jnp.stack([state_im[sl, :] for sl in sls])
                    re, im = _gauss_mm(ub_re, ub_im, xr, xi, dims, precision)
                    for h, sl in enumerate(sls):
                        state_re[sl, :] = re[h]
                        state_im[sl, :] = im[h]


def _apply_diag_pass(
    state_re, state_im, row_ids, lane_ids,
    diag_ctrl_ref, diag_tgt_ref, diag_phase_ref, count, k, d_slots,
):
    """Apply layer ``k``'s controlled-diagonal phases: for each slot the
    phase (chosen by the dynamic target bit) multiplies the state where
    the dynamic control bit is 1."""

    def qubit_bit(q, rids):
        q_lane = jnp.clip(q, 0, LANE_BITS - 1)
        q_row = jnp.clip(q - LANE_BITS, 0, 31)
        lane_bit = (lane_ids >> q_lane) & 1
        row_bit = (rids >> q_row) & 1
        return jnp.where(q < LANE_BITS, lane_bit, row_bit)

    rows = row_ids.shape[0]
    if rows <= _WHOLE_STATE_MAX_ROWS:
        chunks = [slice(0, rows)]
    else:
        # bound the elementwise temporaries (4 full planes otherwise)
        step = _LANE_CHUNK_ROWS
        chunks = [slice(h * step, (h + 1) * step) for h in range(rows // step)]

    for j in range(d_slots):
        @pl.when(j < count)
        def _():
            c = diag_ctrl_ref[0, k, j]
            t = diag_tgt_ref[0, k, j]
            p0r = diag_phase_ref[0, k, j, 0, 0]
            p0i = diag_phase_ref[0, k, j, 0, 1]
            p1r = diag_phase_ref[0, k, j, 1, 0]
            p1i = diag_phase_ref[0, k, j, 1, 1]
            for sl in chunks:
                cbit = qubit_bit(c, row_ids[sl])
                tbit = qubit_bit(t, row_ids[sl])
                pr = jnp.where(tbit == 1, p1r, p0r)
                pi = jnp.where(tbit == 1, p1i, p0i)
                re = state_re[sl, :]
                im = state_im[sl, :]
                new_re = pr * re - pi * im
                new_im = pr * im + pi * re
                active = cbit == 1
                state_re[sl, :] = jnp.where(active, new_re, re)
                state_im[sl, :] = jnp.where(active, new_im, im)


def _run_circuit_folded(
    factors_ref,       # SMEM [1, K, n, 2, 2, 2] f32 (K = n_layers + 1)
    diag_ctrl_ref,     # SMEM [1, L, D] int32
    diag_tgt_ref,      # SMEM [1, L, D] int32
    diag_phase_ref,    # SMEM [1, L, D, 2, 2] f32
    diag_count_ref,    # SMEM [1, L, 1] int32 (trailing 1 for SMEM shape)
    group_active_ref,  # SMEM [1, K, G] int32
    state_re, state_im,
    n_qubits: int,
    n_kron: int,
    d_slots: int,
    precision,
    init_ref=None,
):
    """Initialize the state planes and run the whole folded circuit."""
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

    for k in range(n_kron):
        _apply_kron_layer(
            state_re, state_im, factors_ref, group_active_ref, k, n_qubits, precision
        )
        if k < n_kron - 1:
            count = diag_count_ref[0, k, 0]

            @pl.when(count > 0)
            def _():
                _apply_diag_pass(
                    state_re, state_im, row_ids, lane_ids,
                    diag_ctrl_ref, diag_tgt_ref, diag_phase_ref,
                    count, k, d_slots,
                )


def _probs_folded_kernel(
    factors_ref, diag_ctrl_ref, diag_tgt_ref, diag_phase_ref,
    diag_count_ref, group_active_ref,
    *rest,
    n_qubits: int, n_kron: int, d_slots: int, precision, has_init: bool,
):
    if has_init:
        init_ref, out_ref, state_re, state_im, dma_sem = rest
    else:
        out_ref, state_re, state_im, dma_sem = rest
        init_ref = None
    _run_circuit_folded(
        factors_ref, diag_ctrl_ref, diag_tgt_ref, diag_phase_ref,
        diag_count_ref, group_active_ref, state_re, state_im,
        n_qubits, n_kron, d_slots, precision, init_ref,
    )
    rows = 1 << (n_qubits - LANE_BITS)
    if rows <= _WHOLE_STATE_MAX_ROWS:
        state_re[:] = state_re[:] * state_re[:] + state_im[:] * state_im[:]
    else:
        step = _LANE_CHUNK_ROWS
        for h in range(rows // step):
            sl = slice(h * step, (h + 1) * step)
            state_re[sl, :] = (
                state_re[sl, :] * state_re[sl, :] + state_im[sl, :] * state_im[sl, :]
            )
    copy = pltpu.make_async_copy(state_re, out_ref.at[pl.program_id(0)], dma_sem)
    copy.start()
    copy.wait()


def _energies_folded_kernel(
    factors_ref, diag_ctrl_ref, diag_tgt_ref, diag_phase_ref,
    diag_count_ref, group_active_ref, table_ref,
    *rest,
    n_qubits: int, n_kron: int, d_slots: int, precision, has_init: bool,
):
    if has_init:
        init_ref, out_ref, state_re, state_im = rest
    else:
        out_ref, state_re, state_im = rest
        init_ref = None
    rows = 1 << (n_qubits - LANE_BITS)
    _run_circuit_folded(
        factors_ref, diag_ctrl_ref, diag_tgt_ref, diag_phase_ref,
        diag_count_ref, group_active_ref, state_re, state_im,
        n_qubits, n_kron, d_slots, precision, init_ref,
    )
    if rows <= _WHOLE_STATE_MAX_ROWS:
        prod = (state_re[:] * state_re[:] + state_im[:] * state_im[:]) * table_ref[:]
        out_ref[0, :, :] = jnp.sum(prod.reshape(rows // 8, 8, LANES), axis=0)
    else:
        step = _LANE_CHUNK_ROWS
        acc = jnp.zeros((8, LANES), jnp.float32)
        for h in range(rows // step):
            sl = slice(h * step, (h + 1) * step)
            prod = (
                state_re[sl, :] * state_re[sl, :] + state_im[sl, :] * state_im[sl, :]
            ) * table_ref[sl, :]
            acc = acc + jnp.sum(prod.reshape(step // 8, 8, LANES), axis=0)
        out_ref[0, :, :] = acc


def _sampled_folded_kernel(
    factors_ref, diag_ctrl_ref, diag_tgt_ref, diag_phase_ref,
    diag_count_ref, group_active_ref, frac_ref, table_ref,
    *rest,
    n_qubits: int, n_kron: int, d_slots: int, shots: int, precision, has_init: bool,
):
    if has_init:
        init_ref, out_ref, state_re, state_im = rest
    else:
        out_ref, state_re, state_im = rest
        init_ref = None
    _run_circuit_folded(
        factors_ref, diag_ctrl_ref, diag_tgt_ref, diag_phase_ref,
        diag_count_ref, group_active_ref, state_re, state_im,
        n_qubits, n_kron, d_slots, precision, init_ref,
    )
    _sample_shots_in_vmem(state_re, state_im, frac_ref, table_ref, out_ref, n_qubits, shots)


def _pipeline_specs(pipeline: FoldPipeline):
    """(in_specs, operands) for the pipeline SMEM blocks."""
    pop, n_kron, n = pipeline.factors.shape[:3]
    n_layers = n_kron - 1
    d_slots = pipeline.diag_ctrl.shape[2]
    n_groups = pipeline.group_active.shape[2]
    smem = pltpu.SMEM
    in_specs = [
        pl.BlockSpec((1, n_kron, n, 2, 2, 2), lambda p: (p, 0, 0, 0, 0, 0), memory_space=smem),
        pl.BlockSpec((1, n_layers, d_slots), lambda p: (p, 0, 0), memory_space=smem),
        pl.BlockSpec((1, n_layers, d_slots), lambda p: (p, 0, 0), memory_space=smem),
        pl.BlockSpec((1, n_layers, d_slots, 2, 2), lambda p: (p, 0, 0, 0, 0), memory_space=smem),
        pl.BlockSpec((1, n_layers, 1), lambda p: (p, 0, 0), memory_space=smem),
        pl.BlockSpec((1, n_kron, n_groups), lambda p: (p, 0, 0), memory_space=smem),
    ]
    operands = [
        pipeline.factors,
        pipeline.diag_ctrl,
        pipeline.diag_tgt,
        pipeline.diag_phase,
        pipeline.diag_count[:, :, None],
        pipeline.group_active,
    ]
    return in_specs, operands, n_kron, d_slots


def fold_supported(n_qubits: int, platform: str, path: str = "exact") -> bool:
    """True when the folded MXU path applies (TPU, state fits VMEM, at
    least one full lane group).

    The exact/probs kernels reach n=22 — two qubits past the slot
    kernel's cap.  n=21 runs the plain whole-state group matmuls (probs
    match the engine to 2e-8); n=22 would spill ~144 MB of Gauss
    temporaries around the full-state matmuls, so its lane group runs
    row-chunked and its 8-bit top group splits into two sub-kron
    contractions with chunk-bounded temporaries (see _apply_kron_layer;
    measured in experiments/exp_fold_n22.py).  The in-VMEM sampler
    epilogue needs extra CDF scratch and keeps the 20-qubit cap
    (``path="sampler"``).
    """
    cap = 20 if path == "sampler" else 22
    return platform == "tpu" and LANE_BITS <= n_qubits <= cap


@partial(jax.jit, static_argnames=("n_qubits", "precision", "interpret"))
def pallas_population_probs_folded(
    pipeline: FoldPipeline,
    n_qubits: int,
    precision: str = "highest",
    interpret: bool = False,
    initial: jax.Array | None = None,
) -> jax.Array:
    """Measurement probabilities [P, 2^n] via the folded MXU kernel.

    Same contract as ``pallas_population_probs`` but driven by a
    :class:`FoldPipeline` (build with ``build_fold_pipeline``).
    """
    if n_qubits < LANE_BITS:
        raise ValueError("the folded kernel requires n_qubits >= 7")
    pop = pipeline.factors.shape[0]
    rows = 1 << (n_qubits - LANE_BITS)
    has_init = initial is not None
    in_specs, operands, n_kron, d_slots = _pipeline_specs(pipeline)
    if has_init:
        in_specs.append(pl.BlockSpec((1, 2, rows, LANES), lambda p: (p, 0, 0, 0)))
        operands.append(initial.reshape(pop, 2, rows, LANES))
    kernel = partial(
        _probs_folded_kernel,
        n_qubits=n_qubits, n_kron=n_kron, d_slots=d_slots,
        precision=_PRECISIONS[precision], has_init=has_init,
    )
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out.reshape(pop, rows * LANES)


@partial(jax.jit, static_argnames=("n_qubits", "precision", "interpret"))
def pallas_energies_exact_folded(
    pipeline: FoldPipeline,
    table: jax.Array,
    n_qubits: int,
    precision: str = "highest",
    interpret: bool = False,
    initial: jax.Array | None = None,
) -> jax.Array:
    """Exact diagonal-table energies [P] via the folded MXU kernel
    (contract of ``pallas_energies_exact``)."""
    if n_qubits < LANE_BITS:
        raise ValueError("the folded kernel requires n_qubits >= 7")
    pop = pipeline.factors.shape[0]
    rows = 1 << (n_qubits - LANE_BITS)
    if rows < 8:
        probs = pallas_population_probs_folded(
            pipeline, n_qubits, precision=precision, interpret=interpret,
            initial=initial,
        )
        return jnp.dot(
            probs, table.reshape(-1), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    has_init = initial is not None
    in_specs, operands, n_kron, d_slots = _pipeline_specs(pipeline)
    in_specs.append(pl.BlockSpec((rows, LANES), lambda p: (0, 0)))
    operands.append(table.reshape(rows, LANES))
    if has_init:
        in_specs.append(pl.BlockSpec((1, 2, rows, LANES), lambda p: (p, 0, 0, 0)))
        operands.append(initial.reshape(pop, 2, rows, LANES))
    kernel = partial(
        _energies_folded_kernel,
        n_qubits=n_qubits, n_kron=n_kron, d_slots=d_slots,
        precision=_PRECISIONS[precision], has_init=has_init,
    )
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


@partial(jax.jit, static_argnames=("n_qubits", "shots", "precision", "interpret"))
def pallas_sampled_shot_energies_folded(
    pipeline: FoldPipeline,
    table: jax.Array,
    u_frac: jax.Array,
    n_qubits: int,
    shots: int,
    precision: str = "highest",
    interpret: bool = False,
    initial: jax.Array | None = None,
) -> jax.Array:
    """Sampled shot energies [P, shots] via the folded MXU kernel plus
    the in-VMEM hierarchical inverse-CDF sampler (contract of
    ``pallas_sampled_shot_energies``)."""
    if n_qubits < LANE_BITS + LANE_BITS:
        raise ValueError("the in-kernel sampler requires n_qubits >= 14")
    pop = pipeline.factors.shape[0]
    rows = 1 << (n_qubits - LANE_BITS)
    has_init = initial is not None
    in_specs, operands, n_kron, d_slots = _pipeline_specs(pipeline)
    in_specs.append(pl.BlockSpec((1, shots, 1), lambda p: (p, 0, 0)))
    in_specs.append(pl.BlockSpec((rows, LANES), lambda p: (0, 0)))
    operands.append(jnp.asarray(u_frac, jnp.float32).reshape(pop, shots, 1))
    operands.append(jnp.asarray(table, jnp.float32).reshape(rows, LANES))
    if has_init:
        in_specs.append(pl.BlockSpec((1, 2, rows, LANES), lambda p: (p, 0, 0, 0)))
        operands.append(initial.reshape(pop, 2, rows, LANES))
    kernel = partial(
        _sampled_folded_kernel,
        n_qubits=n_qubits, n_kron=n_kron, d_slots=d_slots, shots=shots,
        precision=_PRECISIONS[precision], has_init=has_init,
    )
    out = pl.pallas_call(
        kernel,
        grid=(pop,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, shots, 1), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((pop, shots, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.float32),
            pltpu.VMEM((rows, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out.reshape(pop, shots)
