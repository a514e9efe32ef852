"""Batched statevector engine over tensor-encoded circuit genomes.

The genome tensor encoding (replacing the reference's
``EVQEIndividual``/``EVQECircuitLayer``/``EVQEGate`` object graph,
queasars/minimum_eigensolvers/evqe/quantum_circuit/quantum_gate.py:12-165):

- ``gate_types[L, n]`` int32 — one slot per qubit per layer, values
  GATE_ID=0 / GATE_ROT=1 / GATE_CTRL=2 / GATE_CROT=3 (same alphabet as the
  reference's EVQEGateType enum, quantum_gate.py:12-20),
- ``controls[L, n]`` int32 — for a GATE_CROT slot, the index of its control
  qubit; ignored (set -1) elsewhere,
- ``angles[L, n, 3]`` float32 — (theta, phi, lambda) of the U3/CU3 rotation
  placed at that slot; ignored for ID/CTRL slots,
- ``layer_mask[L]`` bool — True for real layers, False for padding (the
  population is padded to a common L_max).

Gate semantics match qiskit's ``u``/``cu3`` exactly (reference applies
``circuit.u`` at quantum_gate.py:96-102 and ``CU3Gate`` at :157-165):

  U3(t, p, l) = [[cos(t/2),            -e^{il} sin(t/2)],
                 [e^{ip} sin(t/2),  e^{i(p+l)} cos(t/2)]]

Bit convention: basis state integer ``i`` has qubit ``q`` in bit ``q``
(little-endian, matching the reference/qiskit convention used by the
encoder tests).

TPU representation: the statevector is a stacked float32 array
``state[2, 2^n]`` (axis 0 = real/imaginary).  Complex dtypes are NOT used
on the hot path — the TPU backend here has no complex support, and
separate planes are what the VPU/Pallas kernels want anyway.  A thin
complex64 wrapper (:func:`apply_circuit`) exists for host-side
convenience and oracle tests.

Everything is pure-functional and jit/vmap-friendly: the layer loop is a
``lax.scan``, the qubit loop is a static unroll, control indices are traced
data (per-individual dynamic), shapes are static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

GATE_ID = 0
GATE_ROT = 1
GATE_CTRL = 2
GATE_CROT = 3


def init_state_real(n_qubits: int) -> jax.Array:
    """|0...0> as stacked real/imag planes [2, 2^n] float32."""
    state = jnp.zeros((2, 1 << n_qubits), dtype=jnp.float32)
    return state.at[0, 0].set(1.0)


def u3_matrix_real(angles: jax.Array) -> tuple[jax.Array, jax.Array]:
    """qiskit-convention U3 from (theta, phi, lambda).

    Returns (re, im), each [2, 2] float32.
    """
    theta, phi, lam = angles[0], angles[1], angles[2]
    cos = jnp.cos(theta / 2)
    sin = jnp.sin(theta / 2)
    re = jnp.stack(
        [
            jnp.stack([cos, -jnp.cos(lam) * sin]),
            jnp.stack([jnp.cos(phi) * sin, jnp.cos(phi + lam) * cos]),
        ]
    )
    im = jnp.stack(
        [
            jnp.stack([jnp.zeros_like(cos), -jnp.sin(lam) * sin]),
            jnp.stack([jnp.sin(phi) * sin, jnp.sin(phi + lam) * cos]),
        ]
    )
    return re, im


def _apply_slot(
    state: jax.Array,
    target: int,
    gate_type: jax.Array,
    control: jax.Array,
    angles: jax.Array,
    n_qubits: int,
) -> jax.Array:
    """Apply one genome slot (possibly a no-op) on static target qubit.

    ID/CTRL slots apply the identity; ROT applies U3 unconditionally; CROT
    applies U3 where the (dynamic) control qubit's bit is 1.
    """
    is_rot = gate_type == GATE_ROT
    is_crot = gate_type == GATE_CROT
    has_gate = jnp.logical_or(is_rot, is_crot)

    eye = jnp.eye(2, dtype=jnp.float32)
    u3_re, u3_im = u3_matrix_real(angles)
    u_re = jnp.where(has_gate, u3_re, eye)
    u_im = jnp.where(has_gate, u3_im, jnp.zeros((2, 2), jnp.float32))

    high = 1 << (n_qubits - 1 - target)
    low = 1 << target
    s = state.reshape(2, high, 2, low)
    s0_re, s0_im = s[0, :, 0, :], s[1, :, 0, :]
    s1_re, s1_im = s[0, :, 1, :], s[1, :, 1, :]

    # complex 2x2 action with explicit re/im arithmetic
    new0_re = u_re[0, 0] * s0_re - u_im[0, 0] * s0_im + u_re[0, 1] * s1_re - u_im[0, 1] * s1_im
    new0_im = u_re[0, 0] * s0_im + u_im[0, 0] * s0_re + u_re[0, 1] * s1_im + u_im[0, 1] * s1_re
    new1_re = u_re[1, 0] * s0_re - u_im[1, 0] * s0_im + u_re[1, 1] * s1_re - u_im[1, 1] * s1_im
    new1_im = u_re[1, 0] * s0_im + u_im[1, 0] * s0_re + u_re[1, 1] * s1_im + u_im[1, 1] * s1_re

    # control-bit mask over the (high, low) index grid; the target bit does
    # not participate (a CROT control is never its own target, genome
    # validity guarantees it)
    high_idx = jax.lax.broadcasted_iota(jnp.uint32, (high, low), 0)
    low_idx = jax.lax.broadcasted_iota(jnp.uint32, (high, low), 1)
    full_idx = (high_idx << (target + 1)) | low_idx
    c = jnp.maximum(control, 0).astype(jnp.uint32)
    ctrl_bit = (full_idx >> c) & 1
    active = jnp.where(is_crot, ctrl_bit == 1, True)

    out0_re = jnp.where(active, new0_re, s0_re)
    out0_im = jnp.where(active, new0_im, s0_im)
    out1_re = jnp.where(active, new1_re, s1_re)
    out1_im = jnp.where(active, new1_im, s1_im)
    out = jnp.stack(
        [
            jnp.stack([out0_re, out1_re], axis=1),
            jnp.stack([out0_im, out1_im], axis=1),
        ]
    )
    return out.reshape(state.shape)


@partial(jax.jit, static_argnames=("n_qubits",))
def apply_circuit_real(
    gate_types: jax.Array,
    controls: jax.Array,
    angles: jax.Array,
    layer_mask: jax.Array,
    n_qubits: int,
    initial_state: jax.Array | None = None,
) -> jax.Array:
    """Run one genome's circuit: scan over layers, static unroll over qubits.

    :param gate_types: [L, n] int32
    :param controls: [L, n] int32
    :param angles: [L, n, 3] float32
    :param layer_mask: [L] bool — padded layers leave the state untouched
    :param initial_state: optional [2, 2^n] start state (re/im planes;
        reference feature: initial_state_circuit prepend,
        circuit_evaluation.py:148-149)
    :return: [2, 2^n] float32 statevector (re/im planes)
    """
    state = init_state_real(n_qubits) if initial_state is None else initial_state.astype(jnp.float32)

    def layer_step(carry, layer):
        types_l, controls_l, angles_l, mask_l = layer
        new = carry
        for q in range(n_qubits):
            new = _apply_slot(new, q, types_l[q], controls_l[q], angles_l[q], n_qubits)
        return jnp.where(mask_l, new, carry), None

    # rematerialize per layer under reverse-mode AD (the adjoint-gradient
    # optimizer): only layer-boundary states are saved for backward, the
    # n per-slot intermediates inside a layer are recomputed — without
    # this, one 20-qubit pop-32 gradient wants ~30 GB of residuals.
    # Forward-only execution is unaffected (checkpoint is an AD construct).
    state, _ = jax.lax.scan(
        jax.checkpoint(layer_step), state, (gate_types, controls, angles, layer_mask)
    )
    return state


@partial(jax.jit, static_argnames=("n_qubits",))
def simulate_circuits(
    gate_types: jax.Array,
    controls: jax.Array,
    angles: jax.Array,
    layer_mask: jax.Array,
    n_qubits: int,
    initial_state: jax.Array | None = None,
) -> jax.Array:
    """Population-batched simulation: [B, L, n] genome tensors -> [B, 2, 2^n].

    This is the TPU replacement for the reference's per-circuit
    ``executor.submit`` fan-out (selection.py:75-84): one vmapped program
    instead of B racing RPCs.

    ``initial_state`` may be a shared ``[2, 2^n]`` start state or a
    per-individual ``[B, 2, 2^n]`` batch (the layer-prefix cache of the
    batched optimizers hands every individual its own cached prefix).
    """
    if initial_state is not None and initial_state.ndim == 3:
        fn = lambda t, c, a, m, s: apply_circuit_real(t, c, a, m, n_qubits, s)
        return jax.vmap(fn)(gate_types, controls, angles, layer_mask, initial_state)
    fn = lambda t, c, a, m: apply_circuit_real(t, c, a, m, n_qubits, initial_state)
    return jax.vmap(fn)(gate_types, controls, angles, layer_mask)


@partial(jax.jit, static_argnames=("n_qubits",))
def probabilities(
    gate_types: jax.Array,
    controls: jax.Array,
    angles: jax.Array,
    layer_mask: jax.Array,
    n_qubits: int,
    initial_state: jax.Array | None = None,
) -> jax.Array:
    """Measurement probabilities |psi|^2 for a population: [B, 2^n]."""
    states = simulate_circuits(gate_types, controls, angles, layer_mask, n_qubits, initial_state)
    return states[:, 0, :] ** 2 + states[:, 1, :] ** 2


# ---------------------------------------------------------------------------
# complex convenience wrappers (host/CPU only — the TPU backend used here
# has no complex dtype support)
# ---------------------------------------------------------------------------


def init_state(n_qubits: int, dtype=jnp.complex64) -> jax.Array:
    """|0...0> statevector of shape [2^n] (complex convenience form)."""
    state = jnp.zeros(1 << n_qubits, dtype=dtype)
    return state.at[0].set(1.0)


def apply_circuit(
    gate_types: jax.Array,
    controls: jax.Array,
    angles: jax.Array,
    layer_mask: jax.Array,
    n_qubits: int,
    initial_state: jax.Array | None = None,
) -> jax.Array:
    """Complex64 wrapper around :func:`apply_circuit_real`."""
    init = None
    if initial_state is not None:
        init = jnp.stack([jnp.real(initial_state), jnp.imag(initial_state)]).astype(jnp.float32)
    state = apply_circuit_real(gate_types, controls, angles, layer_mask, n_qubits, init)
    return state[0] + 1j * state[1]
