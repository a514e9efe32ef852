"""Kron-fold application for the amplitude-sharded engine.

The per-gate sharded engine (sharded_statevector.py) pays one barriered
elementwise pass per genome SLOT — ~n passes per layer — because the
cross-factorization bit-identity contract forbids letting XLA fuse
neighboring gates differently for different mesh widths.  The kron-fold
transform (fold_pipeline.py) reduces a whole circuit to L+1 tensor-
product "kron layers" plus L controlled-diagonal phase passes, which
shard as:

- **folded qubits** (q < ``folded_bits``): entirely inside every shard,
  applied as ONE dense group matmul per 7-qubit axis group —
  [128, 128] expanded in-graph from the per-qubit 2x2 factors, contracted
  at ``Precision.HIGHEST`` on the MXU (TPU) or as a plain dot (CPU
  tests).  Each 128-wide tile transforms independently, so the float
  result per amplitude does not depend on how many tiles a shard holds
  — i.e. not on the amp-axis width;
- **high qubits** (q >= ``folded_bits``): one 2x2 pair-combine per
  qubit through the SAME `_partner_combine` expression as the slot
  engine (local axis-reverse or cross-shard ``ppermute``), barriered per
  step — the machinery whose width-invariance test_pop_amp_mesh pins;
- **diagonal phase passes**: pure elementwise multiplies selected by
  dynamic control/target bits (local index bits or device-id bits).

``folded_bits`` must be a factorization-INDEPENDENT constant (the mesh
bit-identity invariant): the default is ``min(14, n_qubits - 3)`` —
fold everything that stays local up to 8 amplitude shards.  Wider amp
axes must pass an explicit ``folded_bits`` (a documented trajectory-
affecting choice) such that ``local_bits >= folded_bits`` still holds.

Cost per kron layer at n=22 (folded_bits=14): 2 group matmuls + 8
pair-combines + 1 phase pass, vs ~22 barriered slot passes per genome
layer in the per-gate engine.

Reference parity: an exact algebraic transform of the same circuits
(fold_pipeline.py); the reference delegates all simulation to Aer
(circuit_evaluation.py:54,210) and has no sharded-state capability at
all (SURVEY.md §2.3 P4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from queasars_tpu.sim.fold_pipeline import build_fold_pipeline
from queasars_tpu.sim.sharded_statevector import (
    AMP_AXIS,
    _blockwise_energy,
    _mesh_bits,
    _partner_combine,
    _pop_spec,
)

LANE_BITS = 7

_HIGHEST = jax.lax.Precision.HIGHEST


def default_folded_bits(n_qubits: int) -> int:
    """The factorization-independent fold boundary: every qubit that is
    shard-local for amp widths up to 8 devices, capped at the two dense
    axis groups the fold kernels use (14 qubits)."""
    return max(LANE_BITS, min(2 * LANE_BITS, n_qubits - 3))


def _group_fold_dense(factors_k: jax.Array, q0: int, m: int):
    """[2^m, 2^m] (re, im) group matrix from per-qubit complex 2x2s.

    kron entry [i, j] = prod over local qubits jq of A_{q0+jq}[bit_jq(i),
    bit_jq(j)] (little-endian), matching the in-kernel builder
    (pallas_fold_kernels._build_group_fold).
    """
    size = 1 << m
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    acc_re = acc_im = None
    for jq in range(m):
        f = factors_k[q0 + jq]  # [2 (re/im), 2, 2]
        bi = (i_ids >> jq) & 1
        bj = (j_ids >> jq) & 1
        f_re = f[0][bi, bj]
        f_im = f[1][bi, bj]
        if acc_re is None:
            acc_re, acc_im = f_re, f_im
        else:
            acc_re, acc_im = (
                acc_re * f_re - acc_im * f_im,
                acc_re * f_im + acc_im * f_re,
            )
    return acc_re, acc_im


def _complex_dot(xr, xi, ur, ui, dims):
    """(x @ u) with complex parts as separate f32 planes, HIGHEST
    precision (the TPU default f32 matmul is a single bf16 pass)."""
    mm = lambda a, b: jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32, precision=_HIGHEST
    )
    return mm(xr, ur) - mm(xi, ui), mm(xr, ui) + mm(xi, ur)


def _apply_kron_layer_sharded(
    local, factors_k, device_id, local_bits, n_devices, n_qubits, folded_bits
):
    """Apply one kron layer to this device's [2, 2^local_bits] shard."""
    local_len = local.shape[1]

    # lane group: contract the low-7 axis, tiles of 128 amplitudes
    # (out[b, k] = sum_l x[b, l] U[k, l])
    u_re, u_im = _group_fold_dense(factors_k, 0, LANE_BITS)
    lanes = 1 << LANE_BITS
    tiles = local_len // lanes
    x = local.reshape(2, tiles, lanes)
    if tiles == 1:
        # keep the contraction a genuine gemm: a 1-row operand lowers to
        # a gemv whose accumulation order differs from the gemm rows the
        # wider factorizations use, breaking cross-width bit-identity
        x = jnp.concatenate([x, jnp.zeros_like(x)], axis=1)
    re, im = _complex_dot(x[0], x[1], u_re, u_im, (((1,), (1,)), ((), ())))
    if tiles == 1:
        re, im = re[:1], im[:1]
    local = jnp.stack([re, im]).reshape(2, local_len)
    local = jax.lax.optimization_barrier(local)

    # row group: contract bits 7..13, per 128x128 tile
    # (out[b, r', l] = sum_r U[r', r] x[b, r, l])
    if folded_bits > LANE_BITS:
        m1 = folded_bits - LANE_BITS
        s1 = 1 << m1
        u_re, u_im = _group_fold_dense(factors_k, LANE_BITS, m1)
        x = local.reshape(2, local_len // (s1 * lanes), s1, lanes)
        # contract x's r axis (1) with U^T's leading axis: result [b, l, r']
        re, im = _complex_dot(
            x[0], x[1], u_re.T, u_im.T, (((1,), (0,)), ((), ()))
        )
        re = jnp.moveaxis(re, -1, 1)
        im = jnp.moveaxis(im, -1, 1)
        local = jnp.stack([re, im]).reshape(2, local_len)
        local = jax.lax.optimization_barrier(local)

    # high qubits: per-qubit 2x2 pair-combines (identical float
    # expression to the slot engine — width-invariant by construction)
    local_idx = jax.lax.broadcasted_iota(jnp.uint32, (1, local_len), 1)[0]
    for q in range(folded_bits, n_qubits):
        f = factors_k[q]  # [2, 2, 2]
        u_re, u_im = f[0], f[1]
        if q < local_bits:
            high = local_len >> (q + 1)
            low = 1 << q
            partner = local.reshape(2, high, 2, low)[:, :, ::-1, :].reshape(2, local_len)
            my_bit = (local_idx >> q) & 1
        else:
            bit_pos = q - local_bits
            perm = [(i, i ^ (1 << bit_pos)) for i in range(n_devices)]
            partner = jax.lax.ppermute(local, AMP_AXIS, perm)
            my_bit = jnp.broadcast_to(
                ((device_id >> bit_pos) & 1).astype(jnp.uint32), (local_len,)
            )
        local = _partner_combine(local, partner, my_bit, u_re, u_im, True)
        local = jax.lax.optimization_barrier(local)
    return local


def _apply_diag_pass_sharded(
    local, ctrl_k, tgt_k, phase_k, device_id, local_bits
):
    """Apply one layer's controlled-diagonal phase slots to the shard.

    ``ctrl_k``/``tgt_k`` [D] int32 (-1 = unused), ``phase_k`` [D, 2, 2]
    (target bit, re/im).  Pure elementwise work; control/target bits
    split into local index bits and device-id bits like the slot engine.
    """
    local_len = local.shape[1]
    local_idx = jax.lax.broadcasted_iota(jnp.uint32, (1, local_len), 1)[0]

    def qubit_bit(q):
        qu = jnp.maximum(q, 0).astype(jnp.uint32)
        local_bit = (local_idx >> jnp.minimum(qu, jnp.uint32(local_bits - 1))) & 1
        dev_bit = ((device_id >> jnp.maximum(qu - local_bits, 0)) & 1).astype(jnp.uint32)
        return jnp.where(q < local_bits, local_bit, dev_bit)

    d_slots = ctrl_k.shape[0]
    for j in range(d_slots):
        c = ctrl_k[j]
        t = tgt_k[j]
        valid = c >= 0
        cbit = qubit_bit(c)
        tbit = qubit_bit(t)
        pr = jnp.where(tbit == 1, phase_k[j, 1, 0], phase_k[j, 0, 0])
        pi = jnp.where(tbit == 1, phase_k[j, 1, 1], phase_k[j, 0, 1])
        re, im = local[0], local[1]
        new_re = pr * re - pi * im
        new_im = pr * im + pi * re
        active = jnp.logical_and(valid, cbit == 1)
        local = jnp.stack(
            [jnp.where(active, new_re, re), jnp.where(active, new_im, im)]
        )
        local = jax.lax.optimization_barrier(local)
    return local


def _simulate_local_folded(
    factors, diag_ctrl, diag_tgt, diag_phase,
    device_id, local_bits, n_devices, n_qubits, folded_bits,
    initial_local=None,
):
    """Run one individual's folded circuit on this device's shard.

    ``factors`` [K, n, 2, 2, 2] (K = n_layers + 1), diag args [L, ...].
    Masked genome layers carry identity factors and empty diag slots
    (build_fold_pipeline), so no layer mask is needed here.
    """
    if initial_local is not None:
        local = initial_local
    else:
        local = jnp.zeros((2, 1 << local_bits), jnp.float32)
        amp0 = jnp.logical_and(
            device_id == 0,
            jax.lax.broadcasted_iota(jnp.int32, (1, 1 << local_bits), 1)[0] == 0,
        )
        local = local.at[0].set(jnp.where(amp0, 1.0, 0.0))

    n_kron = factors.shape[0]

    def step(carry, xs):
        f_k, c_k, t_k, p_k = xs
        new = _apply_kron_layer_sharded(
            carry, f_k, device_id, local_bits, n_devices, n_qubits, folded_bits
        )
        new = _apply_diag_pass_sharded(new, c_k, t_k, p_k, device_id, local_bits)
        return new, None

    local, _ = jax.lax.scan(
        step, local, (factors[: n_kron - 1], diag_ctrl, diag_tgt, diag_phase)
    )
    return _apply_kron_layer_sharded(
        local, factors[n_kron - 1], device_id, local_bits, n_devices, n_qubits,
        folded_bits,
    )


def check_folded_bits(mesh: Mesh, n_qubits: int, folded_bits: int) -> None:
    """Raise unless every folded qubit is shard-local on this mesh."""
    _, local_bits = _mesh_bits(mesh, n_qubits)
    if folded_bits > local_bits:
        raise ValueError(
            f"folded_bits={folded_bits} exceeds the shard-local qubit count "
            f"{local_bits} for this mesh; pass a smaller folded_bits "
            f"(trajectories then differ from the default fold boundary)"
        )
    if folded_bits < LANE_BITS:
        raise ValueError("folded_bits must cover at least the 7 lane qubits")


def make_folded_population_energies_fn(
    mesh: Mesh, n_qubits: int, folded_bits: int | None = None,
    with_initial: bool = False,
):
    """Jitted ``([P,L,n] genome tensors, table_local) -> energies [P]``
    through the folded application: the fold pipeline builds inside the
    mesh on each device's population block, states shard over the amp
    axis, energies reduce blockwise (same fixed-tree contract as the
    per-gate engine, so results are bit-identical across (pop, amp)
    factorizations — pinned in tests/test_sharded_fold.py)."""
    if folded_bits is None:
        folded_bits = default_folded_bits(n_qubits)
    check_folded_bits(mesh, n_qubits, folded_bits)
    n_devices, local_bits = _mesh_bits(mesh, n_qubits)
    pop_spec = _pop_spec(mesh)

    def body(gate_types, controls, angles, layer_mask, table_local, initial_local=None):
        device_id = jax.lax.axis_index(AMP_AXIS)
        pipe = build_fold_pipeline(gate_types, controls, angles, layer_mask, n_qubits)

        def one(args):
            factors, d_ctrl, d_tgt, d_phase = args
            state = _simulate_local_folded(
                factors, d_ctrl, d_tgt, d_phase,
                device_id, local_bits, n_devices, n_qubits, folded_bits,
                initial_local=initial_local,
            )
            probs = state[0] ** 2 + state[1] ** 2
            return _blockwise_energy(probs, table_local, n_devices, n_qubits)

        # factors [P, K, n, 2(ri), 2, 2] — per-individual slices index
        # [K][q] -> [2(ri), 2, 2] exactly as _group_fold_dense expects
        return jax.lax.map(
            one, (pipe.factors, pipe.diag_ctrl, pipe.diag_tgt, pipe.diag_phase)
        )

    in_specs = (pop_spec,) * 4 + (P(AMP_AXIS),) + ((P(None, AMP_AXIS),) if with_initial else ())
    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=pop_spec,
        check_vma=False,
    )
    return jax.jit(mapped)
