"""Kron-fold circuit transform: the MXU formulation of genome circuits.

The VPU slot kernel (pallas_kernels.py) applies each gate as roll-based
partner exchanges at ~11-20 us per gate — measured to be at the VPU
roofline for that access pattern (docs/performance.md "Kernel variants").
The MXU path measured 1.5-4x per-gate headroom (experiments/
exp_mxu_fold*.py), but a naive per-group fold founders on two costs:
controlled rotations whose control sits in a different 7-qubit axis
group cannot fold into a [128, 128] group matrix, and any residual
per-slot VPU work pays ~7 us per *skipped* slot (Mosaic if-converts
fine-grained predication).

This module removes both obstacles with an exact algebraic transform of
the whole circuit:

1. every controlled rotation CU3(c, t) is eigendecomposed as

       CU3 = (I_c x V_t) . CDiag(c, t) . (I_c x Vdag_t)

   where ``V`` diagonalizes the target U3 (a 2x2 eigenproblem in closed
   form) and ``CDiag`` applies pure *phases* on the |c=1, t=0/1> basis
   states — a cheap elementwise pass with NO partner exchange, however
   the control and target are placed;
2. the single-qubit factors (U3s of rotation gates, the V / Vdag of
   controlled rotations, identities elsewhere) of *adjacent* layers
   merge: since each circuit layer touches every qubit at most once,
   the layer's non-diagonal part is a pure tensor product, and
   ``(x_q A_q)(x_q B_q) = x_q (A_q B_q)`` collapses layer k's Vdag
   factors into layer k-1's main factors by plain 2x2 multiplication.

The circuit over L layers becomes exactly

    [x_q F_{L,q}] . D_L . [x_q F_{L-1,q}] . ... . D_1 . [x_q F_{0,q}]

— L+1 "kron layers" of per-qubit 2x2 matrices and L diagonal-phase
passes.  Each kron layer applies as ONE matmul per 7-qubit axis group
on the MXU (the per-qubit 2x2s expand to the group matrix inside the
kernel at ~1 us); each diagonal pass is a few VPU ops per controlled
gate.  No per-slot work remains at all.

This module builds the pipeline tensors in XLA (jit/vmap-friendly,
REAL arithmetic only — this TPU has no complex dtypes) and provides a
pure-jnp complex reference applier used by the CPU oracle tests; the
Pallas kernels consume the same tensors (pallas_kernels.py).

Reference parity: the transform is exact (up to f32 rounding in the
2x2 eigendecomposition), so results match the direct slot application
of qiskit-convention U3/CU3 gates (reference applies ``circuit.u`` /
``CU3Gate`` at queasars/minimum_eigensolvers/evqe/quantum_circuit/
quantum_gate.py:96-165).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from queasars_tpu.sim.statevector import GATE_CROT, GATE_ROT

LANE_BITS = 7


class FoldPipeline(NamedTuple):
    """Tensor form of the kron-fold transform (all leading axes [P, ...]).

    - ``factors`` [P, L+1, n, 2, 2, 2] f32: per kron-layer, per qubit, a
      complex 2x2 (axis 3 = re/im).  Kron layer 0 is layer 0's Vdag
      factors; kron layer k (1 <= k <= L-1) is layer k's Vdag merged
      onto layer k-1's main factors; kron layer L is layer L-1's main
      factors.
    - ``diag_ctrl`` / ``diag_tgt`` [P, L, D] int32: control / target
      qubits of each controlled rotation, compacted to the front
      (D = max(n // 2, 1); unused slots hold -1).
    - ``diag_phase`` [P, L, D, 2, 2] f32: per slot, the applied phase
      for target bit 0 / 1 (axis 3) as (re, im) pairs (axis 4);
      identity (1, 0) in unused slots.
    - ``diag_count`` [P, L] int32: used slots per layer.
    - ``group_active`` [P, L+1, G] int32: 1 where the kron layer's
      group fold differs from identity (G = axis groups: lane q<7,
      row 7<=q<14, top q>=14).
    - ``abs_ctrl`` / ``abs_tgt`` / ``abs_phase`` / ``abs_count``: same
      layout as the diag slots, holding the controlled-diagonal phases
      ABSORBED into kron layer ``l``'s group matmul instead of running
      as full-state passes (``build_fold_pipeline(absorb_diag=True)``):
      a CDiag whose control and target share one axis group is diagonal
      within that group's space, so it row-scales the [2^m, 2^m] group
      matrix (~2^2m elements) instead of multiplying the whole state
      (~2^n elements).  All slots empty when ``absorb_diag`` is off.
    """

    factors: jax.Array
    diag_ctrl: jax.Array
    diag_tgt: jax.Array
    diag_phase: jax.Array
    diag_count: jax.Array
    group_active: jax.Array
    abs_ctrl: jax.Array
    abs_tgt: jax.Array
    abs_phase: jax.Array
    abs_count: jax.Array


def n_axis_groups(n_qubits: int) -> int:
    """Number of kernel axis groups: lane (q<7), row (7<=q<14), top."""
    return min((n_qubits + LANE_BITS - 1) // LANE_BITS, 3)


def _slot_factors(gate_type, angles):
    """Per-slot factor matrices and CDiag phases, real arithmetic.

    Returns ``(main_re, main_im, vdag_re, vdag_im, ph)`` where main/vdag
    are [2, 2] and ``ph`` is [2, 2] = (target bit, re/im).  main is U3
    for ROT, V for CROT, I otherwise; vdag is V^dagger for CROT, I
    otherwise; ph is (phase0, phase1) for CROT, (1, 1) otherwise.
    """
    theta, phi, lam = angles[0], angles[1], angles[2]
    s = (phi + lam) * 0.5
    a = (phi - lam) * 0.5
    half = theta * 0.5
    cos_half, sin_half = jnp.cos(half), jnp.sin(half)
    cos_s, sin_s = jnp.cos(s), jnp.sin(s)

    # U3 entries (qiskit convention)
    u3_re = jnp.stack(
        [
            jnp.stack([cos_half, -jnp.cos(lam) * sin_half]),
            jnp.stack([jnp.cos(phi) * sin_half, jnp.cos(phi + lam) * cos_half]),
        ]
    )
    u3_im = jnp.stack(
        [
            jnp.stack([jnp.zeros_like(cos_half), -jnp.sin(lam) * sin_half]),
            jnp.stack([jnp.sin(phi) * sin_half, jnp.sin(phi + lam) * cos_half]),
        ]
    )

    # eigendecomposition U3 = V diag(e^{i(s-d/2)}, e^{i(s+d/2)}) V^dag:
    # W = e^{-is} U3 = cos(d/2) I - i sin(d/2) (n.sigma), m = sin(d/2) n
    cos_d2 = cos_half * cos_s
    mz = cos_half * sin_s
    my = sin_half * jnp.cos(a)
    mx = -sin_half * jnp.sin(a)
    # the sqrt/arctan2 chain is guarded for reverse-mode AD (the
    # adjoint-gradient optimizer differentiates through the fold): at
    # degenerate angles — e.g. a freshly grown CROT with theta=0 — the
    # radicands are exact zeros whose sqrt/arctan2 cotangents are
    # 0/0 = NaN, and jnp.where alone does not stop NaNs from the dead
    # branch.  Every guarded expression evaluates FORWARD to the exact
    # same float as the unguarded one (sqrt(0) = 0, arctan2(0, 1) =
    # arctan2(0, 0) = 0), so fold outputs stay bit-identical.
    xy_sq = mx * mx + my * my
    xy_zero = xy_sq == 0.0
    nxy = jnp.where(xy_zero, 0.0, jnp.sqrt(jnp.where(xy_zero, 1.0, xy_sq)))
    s_sq = nxy * nxy + mz * mz
    s_zero = s_sq == 0.0
    sin_d2 = jnp.where(s_zero, 0.0, jnp.sqrt(jnp.where(s_zero, 1.0, s_sq)))
    d_half = jnp.arctan2(sin_d2, cos_d2)

    ph0_ang = s - d_half
    ph1_ang = s + d_half
    ph = jnp.stack(
        [
            jnp.stack([jnp.cos(ph0_ang), jnp.sin(ph0_ang)]),
            jnp.stack([jnp.cos(ph1_ang), jnp.sin(ph1_ang)]),
        ]
    )  # [2 (tbit), 2 (re/im)]

    # V rotates z onto n: V = [[cos(b/2), -sin(b/2) e^{-ic}],
    #                          [sin(b/2) e^{ic}, cos(b/2)]]
    mz_b = jnp.where(jnp.logical_and(xy_zero, mz == 0.0), 1.0, mz)
    b_half = jnp.arctan2(nxy, mz_b) * 0.5  # atan2 is scale-invariant in m
    c = jnp.arctan2(
        jnp.where(xy_zero, 0.0, my), jnp.where(xy_zero, 1.0, mx)
    )
    cos_b, sin_b = jnp.cos(b_half), jnp.sin(b_half)
    cos_c, sin_c = jnp.cos(c), jnp.sin(c)
    zero = jnp.zeros_like(cos_b)
    v_re = jnp.stack(
        [jnp.stack([cos_b, -sin_b * cos_c]), jnp.stack([sin_b * cos_c, cos_b])]
    )
    v_im = jnp.stack(
        [jnp.stack([zero, sin_b * sin_c]), jnp.stack([sin_b * sin_c, zero])]
    )
    eye = jnp.eye(2, dtype=jnp.float32)
    zmat = jnp.zeros((2, 2), jnp.float32)
    degenerate = sin_d2 < 1e-7
    v_re = jnp.where(degenerate, eye, v_re)
    v_im = jnp.where(degenerate, zmat, v_im)

    is_rot = gate_type == GATE_ROT
    is_crot = gate_type == GATE_CROT
    main_re = jnp.where(is_rot, u3_re, jnp.where(is_crot, v_re, eye))
    main_im = jnp.where(is_rot, u3_im, jnp.where(is_crot, v_im, zmat))
    vdag_re = jnp.where(is_crot, v_re.T, eye)
    vdag_im = jnp.where(is_crot, -v_im.T, zmat)
    ident_ph = jnp.stack([jnp.stack([1.0, 0.0]), jnp.stack([1.0, 0.0])]).astype(
        jnp.float32
    )
    ph = jnp.where(is_crot, ph, ident_ph)
    return main_re, main_im, vdag_re, vdag_im, ph


@partial(jax.jit, static_argnames=("n_qubits", "absorb_diag"))
def build_fold_pipeline(
    gate_types: jax.Array,  # [P, L, n] int32
    controls: jax.Array,    # [P, L, n] int32
    angles: jax.Array,      # [P, L, n, 3] f32
    layer_mask: jax.Array,  # [P, L] bool/int
    n_qubits: int,
    absorb_diag: bool = False,
) -> FoldPipeline:
    """Build the kron-fold pipeline tensors from a packed genome batch.

    ``absorb_diag`` moves every controlled-diagonal phase whose control
    and target share one axis group — and whose kron layer is already
    active in that group — out of the full-state diag pass and into the
    ``abs_*`` slots, where the kernels row-scale the group matrix
    instead (same algebra: the CDiag is diagonal within the group's
    space, and it applies right after that kron layer).  The transform
    stays exact; only the float path changes (the scaled matrix goes
    through the matmul's precision instead of an exact f32 elementwise
    pass).  Off by default so the sharded/jnp consumers and committed
    fixtures are untouched.
    """
    pop, n_layers, n = gate_types.shape
    if n != n_qubits:
        raise ValueError("gate_types last axis must equal n_qubits")
    mask = jnp.asarray(layer_mask).astype(jnp.bool_)  # [P, L]
    angles = jnp.asarray(angles, jnp.float32)

    def per_slot(gt, ang, m):
        return _slot_factors(jnp.where(m, gt, 0), ang)

    f = jax.vmap(
        jax.vmap(jax.vmap(per_slot, in_axes=(0, 0, None)), in_axes=(0, 0, 0)),
        in_axes=(0, 0, 0),
    )
    main_re, main_im, vdag_re, vdag_im, ph = f(gate_types, angles, mask)
    # main/vdag: [P, L, n, 2, 2]; ph: [P, L, n, 2, 2]

    # kron layers: K[0] = vdag[0]; K[k] = vdag[k] @ main[k-1]; K[L] = main[L-1]
    eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), main_re[:, :1].shape)
    zmat = jnp.zeros_like(eye)
    m_re = jnp.concatenate([eye, main_re], axis=1)   # [P, L+1, n, 2, 2]
    m_im = jnp.concatenate([zmat, main_im], axis=1)
    d_re = jnp.concatenate([vdag_re, eye], axis=1)
    d_im = jnp.concatenate([vdag_im, zmat], axis=1)
    # HIGHEST is load-bearing: on TPU this einsum lowers to MXU matmuls
    # whose default precision is a single bf16 pass (~1e-3 per entry —
    # measured 8e-3 on circuit probabilities before pinning)
    mm = partial(
        jnp.einsum, "plqab,plqbc->plqac", precision=jax.lax.Precision.HIGHEST
    )
    k_re = mm(d_re, m_re) - mm(d_im, m_im)
    k_im = mm(d_re, m_im) + mm(d_im, m_re)
    factors = jnp.stack([k_re, k_im], axis=3)        # [P, L+1, n, 2, 2, 2]

    # group activity: fold differs from identity iff any slot factor does
    n_groups = n_axis_groups(n_qubits)
    eye_b = jnp.eye(2, dtype=jnp.float32)
    dev = (k_re - eye_b) ** 2 + k_im**2
    slot_active = jnp.max(dev, axis=(-2, -1)) > 1e-14  # [P, L+1, n]
    actives = []
    for g in range(n_groups):
        lo = g * LANE_BITS
        hi = n_qubits if g == n_groups - 1 else (g + 1) * LANE_BITS
        actives.append(jnp.any(slot_active[:, :, lo:hi], axis=2))
    group_active = jnp.stack(actives, axis=2).astype(jnp.int32)

    # diagonal slots: compact CROT positions to the front of D slots
    d_slots = max(n_qubits // 2, 1)
    is_crot = jnp.logical_and(gate_types == GATE_CROT, mask[:, :, None])  # [P,L,n]
    ident_ph = jnp.broadcast_to(
        jnp.array([[1.0, 0.0], [1.0, 0.0]], jnp.float32), ph.shape
    )

    def _compact(flags):
        order = jnp.argsort(~flags, axis=2, stable=True)
        sorted_f = jnp.take_along_axis(flags, order, axis=2)
        tgt = jnp.where(sorted_f, order, -1)[:, :, :d_slots]
        ctrl = jnp.where(
            sorted_f, jnp.take_along_axis(controls, order, axis=2), -1
        )[:, :, :d_slots]
        ph_sorted = jnp.take_along_axis(
            jnp.where(flags[..., None, None], ph, ident_ph),
            order[..., None, None],
            axis=2,
        )[:, :, :d_slots]                             # [P, L, D, 2, 2]
        count = jnp.sum(flags.astype(jnp.int32), axis=2)
        return ctrl.astype(jnp.int32), tgt.astype(jnp.int32), ph_sorted, count

    if absorb_diag:
        tgt_q = jax.lax.broadcasted_iota(jnp.int32, is_crot.shape, 2)
        g_t = jnp.minimum(tgt_q // LANE_BITS, 2)
        g_c = jnp.minimum(jnp.maximum(controls, 0) // LANE_BITS, 2)
        # the top group absorbs only while its matmul applies whole-state:
        # the n=22 kernels split it into two sub-kron contractions whose
        # per-sub row-scale cannot represent a cross-sub diagonal
        top_ok = n_qubits <= 2 * LANE_BITS + LANE_BITS
        group_ok = jnp.logical_or(g_t < 2, jnp.bool_(top_ok))
        # only into an already-active group: scaling an identity fold
        # would force a skippable group matmul (~12 us/individual) to
        # save one ~7 us state pass
        kron_act = jnp.take_along_axis(
            group_active[:, :n_layers].astype(jnp.bool_), g_t, axis=2
        )
        absorbed = jnp.logical_and(
            is_crot,
            jnp.logical_and(g_t == g_c, jnp.logical_and(group_ok, kron_act)),
        )
    else:
        absorbed = jnp.zeros_like(is_crot)
    ctrl, tgt, ph_sorted, count = _compact(jnp.logical_and(is_crot, ~absorbed))
    a_ctrl, a_tgt, a_ph, a_count = _compact(absorbed)

    return FoldPipeline(
        factors=factors,
        diag_ctrl=ctrl,
        diag_tgt=tgt,
        diag_phase=ph_sorted,
        diag_count=count,
        group_active=group_active,
        abs_ctrl=a_ctrl,
        abs_tgt=a_tgt,
        abs_phase=a_ph,
        abs_count=a_count,
    )


@partial(jax.jit, static_argnames=("n_qubits",))
def extend_fold_pipeline_with_rotation(
    pipe: FoldPipeline,
    rot_type: jax.Array,   # [n] int32 (ID / ROT slots only)
    rot_angle: jax.Array,  # [n, 3] f32
    n_qubits: int,
) -> FoldPipeline:
    """Append one measurement basis-rotation layer to a BUILT pipeline.

    The grouped sampler measures the same circuit in G rotated bases
    (grouped_sampling.py); rebuilding the whole fold per group repeats
    the eigendecompositions and factor merges of the shared circuit
    prefix G times (VERDICT r3 weak #3).  A rotation layer is pure
    single-qubit U3s, so in the fold algebra its Vdag factors are exact
    identities: every existing kron layer K[0..L] of the base pipeline
    is UNCHANGED (the old per-group build computed K[L] = I @ main[L-1]
    with an exact identity multiply), the appended kron layer K[L+1] is
    just the rotation's own U3 factors, and its diag pass is empty (no
    controlled slots).  This function therefore extends the base tensors
    by one layer in O(pop * n) — bit-identical to the full rebuild
    (pinned in tests/test_fold_pipeline.py) at ~zero marginal build
    cost per group.
    """
    pop = pipe.factors.shape[0]
    d_slots = pipe.diag_ctrl.shape[2]
    main_re, main_im, _vdag_re, _vdag_im, _ph = jax.vmap(_slot_factors)(
        jnp.asarray(rot_type, jnp.int32), jnp.asarray(rot_angle, jnp.float32)
    )  # [n, 2, 2] each

    new_factors = jnp.broadcast_to(
        jnp.stack([main_re, main_im], axis=1)[None, None],
        (pop, 1, n_qubits, 2, 2, 2),
    )

    n_groups = n_axis_groups(n_qubits)
    eye_b = jnp.eye(2, dtype=jnp.float32)
    dev = (main_re - eye_b) ** 2 + main_im**2
    slot_active = jnp.max(dev, axis=(-2, -1)) > 1e-14  # [n]
    actives = []
    for g in range(n_groups):
        lo = g * LANE_BITS
        hi = n_qubits if g == n_groups - 1 else (g + 1) * LANE_BITS
        actives.append(jnp.any(slot_active[lo:hi]))
    new_active = jnp.broadcast_to(
        jnp.stack(actives).astype(jnp.int32)[None, None], (pop, 1, n_groups)
    )

    empty_idx = jnp.full((pop, 1, d_slots), -1, jnp.int32)
    empty_phase = jnp.broadcast_to(
        jnp.array([[1.0, 0.0], [1.0, 0.0]], jnp.float32),
        (pop, 1, d_slots, 2, 2),
    )
    empty_count = jnp.zeros((pop, 1), jnp.int32)

    return FoldPipeline(
        factors=jnp.concatenate([pipe.factors, new_factors], axis=1),
        diag_ctrl=jnp.concatenate([pipe.diag_ctrl, empty_idx], axis=1),
        diag_tgt=jnp.concatenate([pipe.diag_tgt, empty_idx], axis=1),
        diag_phase=jnp.concatenate([pipe.diag_phase, empty_phase], axis=1),
        diag_count=jnp.concatenate([pipe.diag_count, empty_count], axis=1),
        group_active=jnp.concatenate([pipe.group_active, new_active], axis=1),
        abs_ctrl=jnp.concatenate([pipe.abs_ctrl, empty_idx], axis=1),
        abs_tgt=jnp.concatenate([pipe.abs_tgt, empty_idx], axis=1),
        abs_phase=jnp.concatenate([pipe.abs_phase, empty_phase], axis=1),
        abs_count=jnp.concatenate([pipe.abs_count, empty_count], axis=1),
    )


@partial(jax.jit, static_argnames=("n_qubits",))
def rotation_layer_factors(rot_types, rot_angles, n_qubits: int):
    """Kron-layer form of measurement basis-rotation layers.

    :param rot_types: [G, n] int32 (ID / ROT slots)
    :param rot_angles: [G, n, 3] f32
    :return: ``(factors [G, n, 2, 2, 2] f32 with re/im at axis 2,
        activity [G, n_axis_groups] f32 0/1)`` — the per-group extra
        kron layer the one-launch grouped sampler applies in VMEM
        (``pallas_fold_kernels.pallas_grouped_shot_energies_folded``).
    """
    main_re, main_im, _vr, _vi, _ph = jax.vmap(jax.vmap(_slot_factors))(
        jnp.asarray(rot_types, jnp.int32), jnp.asarray(rot_angles, jnp.float32)
    )  # [G, n, 2, 2]
    factors = jnp.stack([main_re, main_im], axis=2)  # [G, n, 2, 2, 2]
    eye_b = jnp.eye(2, dtype=jnp.float32)
    dev = (main_re - eye_b) ** 2 + main_im**2
    slot_active = jnp.max(dev, axis=(-2, -1)) > 1e-14  # [G, n]
    n_groups = n_axis_groups(n_qubits)
    actives = []
    for g in range(n_groups):
        lo = g * LANE_BITS
        hi = n_qubits if g == n_groups - 1 else (g + 1) * LANE_BITS
        actives.append(jnp.any(slot_active[:, lo:hi], axis=1))
    activity = jnp.stack(actives, axis=1).astype(jnp.float32)  # [G, n_groups]
    return factors, activity


def cu3_slot_factors_reference(theta, phi, lam):
    """Complex (V, phase0, phase1) of the eigendecomposition — test
    convenience wrapper over the real-arithmetic :func:`_slot_factors`."""
    import numpy as np

    main_re, main_im, _, _, ph = _slot_factors(
        jnp.int32(GATE_CROT), jnp.asarray([theta, phi, lam], jnp.float32)
    )
    v = np.asarray(main_re) + 1j * np.asarray(main_im)
    ph = np.asarray(ph)
    return v, complex(ph[0, 0], ph[0, 1]), complex(ph[1, 0], ph[1, 1])


@partial(jax.jit, static_argnames=("n_qubits", "folded_bits"))
def simulate_circuits_folded(
    gate_types: jax.Array,
    controls: jax.Array,
    angles: jax.Array,
    layer_mask: jax.Array,
    n_qubits: int,
    initial_state: jax.Array | None = None,
    folded_bits: int | None = None,
) -> jax.Array:
    """Population-batched folded simulation on one device: [B, L, n]
    genome tensors -> [B, 2, 2^n] states through the kron-fold transform
    (dense group matmuls at HIGHEST precision + diagonal phase passes)
    instead of the per-slot engine.

    Differentiable end-to-end — built for the adjoint-gradient optimizer
    (optim/gradient.py): the matmul formulation gives the forward AND the
    reverse pass MXU shape (the VJP of a group matmul is a group matmul
    with the transposed factors), and per-kron-layer rematerialization
    bounds the residual memory exactly like ``apply_circuit_real``.
    Forward floats match the sharded folded engine's single-shard case
    (same ``_apply_kron_layer_sharded`` expressions) and the jnp slot
    engine to the fold transform's f32 rounding (~1e-6).
    """
    from queasars_tpu.sim.sharded_fold import (
        _apply_diag_pass_sharded,
        _apply_kron_layer_sharded,
    )

    if folded_bits is None:
        folded_bits = min(2 * LANE_BITS, n_qubits)
    if not LANE_BITS <= folded_bits <= n_qubits:
        raise ValueError(
            f"folded_bits must lie in [{LANE_BITS}, n_qubits]; the folded "
            f"applier needs at least the 7 lane qubits (got n_qubits="
            f"{n_qubits}, folded_bits={folded_bits})"
        )
    pipe = build_fold_pipeline(gate_types, controls, angles, layer_mask, n_qubits)
    device_id = jnp.int32(0)

    def one(factors, d_ctrl, d_tgt, d_phase, init):
        if init is None:
            local = jnp.zeros((2, 1 << n_qubits), jnp.float32).at[0, 0].set(1.0)
        else:
            local = init.astype(jnp.float32)

        def step(carry, xs):
            f_k, c_k, t_k, p_k = xs
            new = _apply_kron_layer_sharded(
                carry, f_k, device_id, n_qubits, 1, n_qubits, folded_bits
            )
            new = _apply_diag_pass_sharded(new, c_k, t_k, p_k, device_id, n_qubits)
            return new, None

        local, _ = jax.lax.scan(
            jax.checkpoint(step),
            local,
            (factors[:-1], d_ctrl, d_tgt, d_phase),
        )
        return _apply_kron_layer_sharded(
            local, factors[-1], device_id, n_qubits, 1, n_qubits, folded_bits
        )

    if initial_state is not None and initial_state.ndim == 3:
        return jax.vmap(one)(
            pipe.factors, pipe.diag_ctrl, pipe.diag_tgt, pipe.diag_phase,
            initial_state.astype(jnp.float32),
        )
    shared = initial_state
    return jax.vmap(lambda f, c, t, p: one(f, c, t, p, shared))(
        pipe.factors, pipe.diag_ctrl, pipe.diag_tgt, pipe.diag_phase
    )


# ---------------------------------------------------------------------------
# pure-jnp reference applier (oracle tests; CPU only — uses complex dtypes)
# ---------------------------------------------------------------------------


def _kron_chain(mats):
    """complex [m, 2, 2] -> [2^m, 2^m] with qubit j = bit j (little-endian)."""
    out = mats[0]
    for j in range(1, mats.shape[0]):
        out = jnp.kron(mats[j], out)
    return out


def apply_fold_pipeline_reference(
    pipeline: FoldPipeline, n_qubits: int, initial: jax.Array | None = None
) -> jax.Array:
    """Apply the pipeline with plain dense kron matrices (oracle).

    Returns statevectors [P, 2, 2^n] in the engine's stacked re/im
    layout.  O(4^n) per kron layer — test sizes only.
    """
    import numpy as np

    factors = np.asarray(pipeline.factors)
    fac = factors[:, :, :, 0] + 1j * factors[:, :, :, 1]  # [P, L+1, n, 2, 2]
    phases_ri = np.asarray(pipeline.diag_phase)           # [P, L, D, 2, 2]
    phases = phases_ri[..., 0] + 1j * phases_ri[..., 1]   # [P, L, D, 2]
    ctrl = np.asarray(pipeline.diag_ctrl)
    tgt = np.asarray(pipeline.diag_tgt)
    abs_ri = np.asarray(pipeline.abs_phase)
    abs_phases = abs_ri[..., 0] + 1j * abs_ri[..., 1]
    abs_ctrl = np.asarray(pipeline.abs_ctrl)
    abs_tgt = np.asarray(pipeline.abs_tgt)

    pop, n_kron = fac.shape[0], fac.shape[1]
    n_layers = n_kron - 1
    dim = 1 << n_qubits
    basis = np.arange(dim)

    out = np.zeros((pop, 2, dim), np.float32)
    for p in range(pop):
        if initial is None:
            state = np.zeros(dim, np.complex128)
            state[0] = 1.0
        else:
            state = np.asarray(initial[p, 0], np.complex128) + 1j * np.asarray(
                initial[p, 1], np.complex128
            )
        for k in range(n_kron):
            u = np.asarray(_kron_chain(jnp.asarray(fac[p, k])))
            state = u @ state
            if k < n_layers:
                w = np.ones(dim, np.complex128)
                for cc, tt, pp in ((ctrl, tgt, phases), (abs_ctrl, abs_tgt, abs_phases)):
                    for j in range(cc.shape[2]):
                        c, t = int(cc[p, k, j]), int(tt[p, k, j])
                        if c < 0:
                            continue
                        cbit = (basis >> c) & 1
                        tbit = (basis >> t) & 1
                        phase = np.where(tbit == 1, pp[p, k, j, 1], pp[p, k, j, 0])
                        w = w * np.where(cbit == 1, phase, 1.0)
                state = state * w
        out[p, 0] = state.real.astype(np.float32)
        out[p, 1] = state.imag.astype(np.float32)
    return jnp.asarray(out)
