"""Amplitude-sharded statevector engine: one state across many chips.

Capability the reference does not have (SURVEY.md §2.3 P4): its only
scale axis is task-farming whole circuits; a single statevector larger
than one Aer process's memory is unreachable.  Here the 2^n amplitudes
are sharded across a mesh axis — each device holds a contiguous block of
``2^n / D`` amplitudes — and gates lower to:

- **local qubits** (q < n - log2 D): pure on-shard VPU work, the same
  pairing arithmetic as the single-chip engine;
- **global qubits** (q >= n - log2 D): the pair partner lives on the
  device whose index differs in bit (q - local_bits) — one
  ``jax.lax.ppermute`` shard exchange over ICI, then an elementwise
  combine.  No all-to-alls, no resharding: exactly one pairwise exchange
  per global-qubit gate.

Control bits split the same way: local controls mask within the shard,
global controls reduce to a per-device scalar ((device_id >> k) & 1).

Everything is expressed with ``shard_map`` over a named mesh axis, so the
same code runs on the virtual CPU mesh (tests) and TPU slices.
"""

from __future__ import annotations


import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from queasars_tpu.sim.statevector import u3_matrix_real

AMP_AXIS = "amp"


def _apply_local_slot(state, target, gate_type, control, angles, local_bits, device_id, n_devices):
    """One genome slot on a locally-held qubit (target < local_bits).

    Mirrors statevector._apply_slot with the control-bit logic extended to
    global controls (scalar per device).
    """
    is_rot = gate_type == 1
    is_crot = gate_type == 3
    has_gate = jnp.logical_or(is_rot, is_crot)

    eye = jnp.eye(2, dtype=jnp.float32)
    u3_re, u3_im = u3_matrix_real(angles)
    u_re = jnp.where(has_gate, u3_re, eye)
    u_im = jnp.where(has_gate, u3_im, jnp.zeros((2, 2), jnp.float32))

    high = 1 << (local_bits - 1 - target)
    low = 1 << target
    s = state.reshape(2, high, 2, low)
    s0_re, s0_im = s[0, :, 0, :], s[1, :, 0, :]
    s1_re, s1_im = s[0, :, 1, :], s[1, :, 1, :]

    new0_re = u_re[0, 0] * s0_re - u_im[0, 0] * s0_im + u_re[0, 1] * s1_re - u_im[0, 1] * s1_im
    new0_im = u_re[0, 0] * s0_im + u_im[0, 0] * s0_re + u_re[0, 1] * s1_im + u_im[0, 1] * s1_re
    new1_re = u_re[1, 0] * s0_re - u_im[1, 0] * s0_im + u_re[1, 1] * s1_re - u_im[1, 1] * s1_im
    new1_im = u_re[1, 0] * s0_im + u_im[1, 0] * s0_re + u_re[1, 1] * s1_im + u_im[1, 1] * s1_re

    # control mask: local controls from the in-shard index, global controls
    # from the device id (scalar)
    high_idx = jax.lax.broadcasted_iota(jnp.uint32, (high, low), 0)
    low_idx = jax.lax.broadcasted_iota(jnp.uint32, (high, low), 1)
    local_idx = (high_idx << (target + 1)) | low_idx
    c = jnp.maximum(control, 0).astype(jnp.uint32)
    local_ctrl_bit = (local_idx >> jnp.minimum(c, local_bits - 1)) & 1
    global_ctrl_bit = (device_id >> jnp.maximum(c - local_bits, 0)) & 1
    is_global_ctrl = control >= local_bits
    ctrl_bit = jnp.where(is_global_ctrl, global_ctrl_bit.astype(jnp.uint32), local_ctrl_bit)
    active = jnp.where(is_crot, ctrl_bit == 1, True)

    out0_re = jnp.where(active, new0_re, s0_re)
    out0_im = jnp.where(active, new0_im, s0_im)
    out1_re = jnp.where(active, new1_re, s1_re)
    out1_im = jnp.where(active, new1_im, s1_im)
    out = jnp.stack(
        [jnp.stack([out0_re, out1_re], axis=1), jnp.stack([out0_im, out1_im], axis=1)]
    )
    return out.reshape(state.shape)


def _apply_global_slot(state, target, gate_type, control, angles, local_bits, device_id, n_devices):
    """One genome slot on a globally-sharded qubit (target >= local_bits).

    The pair partner shard lives on device ``id XOR 2^(target-local_bits)``:
    one ppermute exchange, then a per-device row of the 2x2 matrix.
    """
    is_rot = gate_type == 1
    is_crot = gate_type == 3
    has_gate = jnp.logical_or(is_rot, is_crot)

    eye = jnp.eye(2, dtype=jnp.float32)
    u3_re, u3_im = u3_matrix_real(angles)
    u_re = jnp.where(has_gate, u3_re, eye)
    u_im = jnp.where(has_gate, u3_im, jnp.zeros((2, 2), jnp.float32))

    bit_pos = target - local_bits
    partner_perm = [(i, i ^ (1 << bit_pos)) for i in range(n_devices)]
    partner = jax.lax.ppermute(state, AMP_AXIS, partner_perm)

    my_bit = (device_id >> bit_pos) & 1  # 0: this shard holds |0>_q side
    # row of U for this side: bit=0 -> (u00, u01) on (self, partner);
    #                          bit=1 -> (u11, u10) on (self, partner)
    a_re = jnp.where(my_bit == 0, u_re[0, 0], u_re[1, 1])
    a_im = jnp.where(my_bit == 0, u_im[0, 0], u_im[1, 1])
    b_re = jnp.where(my_bit == 0, u_re[0, 1], u_re[1, 0])
    b_im = jnp.where(my_bit == 0, u_im[0, 1], u_im[1, 0])

    re, im = state[0], state[1]
    p_re, p_im = partner[0], partner[1]
    new_re = a_re * re - a_im * im + b_re * p_re - b_im * p_im
    new_im = a_re * im + a_im * re + b_re * p_im + b_im * p_re

    # control mask (local or global control, as above)
    local_len = state.shape[1]
    local_idx = jax.lax.broadcasted_iota(jnp.uint32, (1, local_len), 1)[0]
    c = jnp.maximum(control, 0).astype(jnp.uint32)
    local_ctrl_bit = (local_idx >> jnp.minimum(c, local_bits - 1)) & 1
    global_ctrl_bit = ((device_id >> jnp.maximum(c - local_bits, 0)) & 1).astype(jnp.uint32)
    is_global_ctrl = control >= local_bits
    ctrl_bit = jnp.where(is_global_ctrl, global_ctrl_bit, local_ctrl_bit)
    active = jnp.where(is_crot, ctrl_bit == 1, True)

    out_re = jnp.where(active, new_re, re)
    out_im = jnp.where(active, new_im, im)
    return jnp.stack([out_re, out_im])


def _simulate_local(
    gate_types, controls, angles, layer_mask, device_id, local_bits, n_devices, n_qubits,
    initial_local=None,
):
    """Run one genome's circuit on this device's amplitude shard
    ([2, 2^local_bits]); global-qubit gates exchange shards via ppermute.

    ``initial_local`` optionally provides this shard's start state (the
    optimizers' layer-prefix cache re-enters cached states here)."""
    if initial_local is not None:
        local = initial_local
    else:
        local = jnp.zeros((2, 1 << local_bits), jnp.float32)
        amp0 = jnp.logical_and(
            device_id == 0,
            jax.lax.broadcasted_iota(jnp.int32, (1, 1 << local_bits), 1)[0] == 0,
        )
        local = local.at[0].set(jnp.where(amp0, 1.0, 0.0))

    def layer_step(carry, layer):
        types_l, controls_l, angles_l, mask_l = layer
        new = carry
        for q in range(n_qubits):
            fn = _apply_local_slot if q < local_bits else _apply_global_slot
            new = fn(
                new, q, types_l[q], controls_l[q],
                angles_l[q], local_bits, device_id, n_devices,
            )
        return jnp.where(mask_l, new, carry), None

    local, _ = jax.lax.scan(layer_step, local, (gate_types, controls, angles, layer_mask))
    return local


def _mesh_bits(mesh: Mesh, n_qubits: int) -> tuple[int, int]:
    n_devices = mesh.shape[AMP_AXIS]
    device_bits = int(np.log2(n_devices))
    assert 1 << device_bits == n_devices, "device count must be a power of two"
    local_bits = n_qubits - device_bits
    assert local_bits >= 1, "state too small for this many devices"
    return n_devices, local_bits


def make_sharded_circuit_fn(mesh: Mesh, n_qubits: int):
    """Build a jitted ``(gate_types [L,n], controls, angles, layer_mask) ->
    state [2, 2^n]`` function with the state sharded over the mesh's
    ``amp`` axis.

    The output keeps its NamedSharding; downstream expectation/sampling
    ops run sharded too.
    """
    n_devices, local_bits = _mesh_bits(mesh, n_qubits)

    def sharded_body(gate_types, controls, angles, layer_mask):
        device_id = jax.lax.axis_index(AMP_AXIS)
        return _simulate_local(
            gate_types, controls, angles, layer_mask,
            device_id, local_bits, n_devices, n_qubits,
        )

    mapped = shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(None, AMP_AXIS),
    )
    return jax.jit(mapped)


def make_sharded_population_probs_fn(mesh: Mesh, n_qubits: int):
    """Build a jitted ``([P,L,n] genome tensors) -> probs [P, 2^n]``
    function, amplitudes sharded over the ``amp`` axis.

    Individuals run sequentially per device (``lax.map``) so peak memory
    stays at one state shard; the population axis is the replicated loop
    axis here — the opposite factorization of parallel/mesh.py, chosen
    when one state no longer fits a chip (SURVEY.md §2.3 P4).
    """
    n_devices, local_bits = _mesh_bits(mesh, n_qubits)

    def sharded_body(gate_types, controls, angles, layer_mask):
        device_id = jax.lax.axis_index(AMP_AXIS)

        def one(args):
            gt, ctrl, ang, lm = args
            state = _simulate_local(
                gt, ctrl, ang, lm, device_id, local_bits, n_devices, n_qubits
            )
            return state[0] ** 2 + state[1] ** 2

        return jax.lax.map(one, (gate_types, controls, angles, layer_mask))

    mapped = shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(None, AMP_AXIS),
    )
    return jax.jit(mapped)


def make_population_energies_body(mesh: Mesh, n_qubits: int):
    """The per-device energies computation for use INSIDE a ``shard_map``
    over the amp axis: ``(genome tensors [P,L,n] (replicated),
    table_local [2^n / D]) -> energies [P] (replicated via psum)``.

    Exposed separately so optimizer scans can close over it and run whole
    parameter sweeps on device (one compiled program, collectives
    included) instead of paying a host dispatch per probe."""
    n_devices, local_bits = _mesh_bits(mesh, n_qubits)

    def body(gate_types, controls, angles, layer_mask, table_local):
        device_id = jax.lax.axis_index(AMP_AXIS)

        def one(args):
            gt, ctrl, ang, lm = args
            state = _simulate_local(
                gt, ctrl, ang, lm, device_id, local_bits, n_devices, n_qubits
            )
            probs = state[0] ** 2 + state[1] ** 2
            return jnp.dot(probs, table_local, preferred_element_type=jnp.float32)

        partials = jax.lax.map(one, (gate_types, controls, angles, layer_mask))
        return jax.lax.psum(partials, AMP_AXIS)

    return body


def make_sharded_population_energies_fn(mesh: Mesh, n_qubits: int):
    """Build a jitted ``([P,L,n] genome tensors, table [2^n]) ->
    energies [P]`` function: amplitude-sharded simulation, local diagonal
    contraction, one psum over the amp axis — only P scalars leave the
    mesh."""
    body = make_population_energies_body(mesh, n_qubits)
    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(AMP_AXIS)),
        out_specs=P(),
    )
    return jax.jit(mapped)


def sharded_expectation(mesh: Mesh, state: jax.Array, table: jax.Array) -> jax.Array:
    """<E> of an amplitude-sharded state against a (co-sharded) energy
    table: local dot + psum over the amp axis."""

    def body(state_local, table_local):
        probs = state_local[0] ** 2 + state_local[1] ** 2
        return jax.lax.psum(jnp.dot(probs, table_local, preferred_element_type=jnp.float32), AMP_AXIS)

    fn = shard_map(
        body, mesh=mesh, in_specs=(P(None, AMP_AXIS), P(AMP_AXIS)), out_specs=P()
    )
    return jax.jit(fn)(state, table)
