"""Exact QAOA simulation for diagonal cost Hamiltonians.

A capability beyond the reference (DLR-RB/QUEASARS ships only
evolving-ansatz eigensolvers): QAOA (arXiv:1411.4028) alternates a cost
phase-separator ``exp(-i gamma H)`` with a transverse-field mixer
``exp(-i beta X)`` per qubit.  It drops into this framework naturally
because every problem encoder here (JSSP domain-wall, QUBO, TSP, graph
coloring, MaxCut — ``problems/``) emits a DIAGONAL :class:`PauliSum`,
and for a diagonal ``H`` the cost layer is an exact elementwise phase by
the diagonal energy table (``paulis/diagonal.py``) — no gate
decomposition, no Trotter error, no matrix exponential.

TPU-first shape: the state is the engine-standard stacked ``[2, 2^n]``
re/im float32 planes (no complex dtypes on this TPU), the layer loop is
a ``lax.scan`` over the ``(gamma, beta)`` schedule, and the mixer is a
static per-qubit unroll of pairwise plane combines — all elementwise VPU
work that XLA fuses into a handful of loops.  The whole simulation is a
differentiable pure function of the angle schedule, so the solver
optimizes it with batched multi-start Adam under one jit
(``solver/qaoa.py``).

Conventions match the rest of the engine: little-endian basis indices
(bit ``q`` of the index = qubit ``q``), energies from the same table the
evaluators use, so QAOA results are directly comparable with EVQE solves
of the same operator.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def plus_state_real(n_qubits: int) -> jax.Array:
    """|+>^n as stacked re/im planes [2, 2^n] float32."""
    dim = 1 << n_qubits
    amp = 1.0 / jnp.sqrt(jnp.float32(dim))
    state = jnp.zeros((2, dim), dtype=jnp.float32)
    return state.at[0].set(amp)


def apply_cost_phase(state: jax.Array, table: jax.Array, gamma: jax.Array) -> jax.Array:
    """Elementwise ``exp(-i gamma E_z)`` on the stacked planes.

    ``(re + i im) * (cos - i sin) = (re cos + im sin) + i (im cos - re sin)``.
    """
    angle = gamma * table
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    re, im = state[0], state[1]
    return jnp.stack([re * c + im * s, im * c - re * s])


def apply_mixer(state: jax.Array, beta: jax.Array, n_qubits: int) -> jax.Array:
    """``exp(-i beta X_q)`` on every qubit.

    Per qubit: ``a' = cos(beta) a - i sin(beta) b`` and symmetrically for
    ``b`` — four fused multiply-adds per amplitude pair on the re/im
    planes.  The qubit loop is a static unroll (n_qubits is static).
    """
    c = jnp.cos(beta)
    s = jnp.sin(beta)
    for q in range(n_qubits):
        shaped = state.reshape(2, -1, 2, 1 << q)
        re_a, im_a = shaped[0, :, 0, :], shaped[1, :, 0, :]
        re_b, im_b = shaped[0, :, 1, :], shaped[1, :, 1, :]
        re = jnp.stack([c * re_a + s * im_b, s * im_a + c * re_b], axis=1)
        im = jnp.stack([c * im_a - s * re_b, c * im_b - s * re_a], axis=1)
        state = jnp.stack([re, im]).reshape(2, -1)
    return state


@partial(jax.jit, static_argnames=("n_qubits",))
def qaoa_state(
    table: jax.Array, gammas: jax.Array, betas: jax.Array, n_qubits: int
) -> jax.Array:
    """Simulate a depth-p QAOA circuit; returns stacked planes [2, 2^n].

    :param table: diagonal energy table [2^n] (``diagonal_energy_table_device``)
    :param gammas: cost angles [p]
    :param betas: mixer angles [p]

    The layer loop is a static unroll (p is small): a ``lax.scan`` here
    nests a loop (and, under AD, its transposed reverse loop) inside the
    optimizer's own scan, which the TPU compile service handles orders
    of magnitude more slowly than the equivalent straight-line program.
    """
    state = plus_state_real(n_qubits)
    for layer in range(gammas.shape[0]):
        state = apply_cost_phase(state, table, gammas[layer])
        state = apply_mixer(state, betas[layer], n_qubits)
    return state


@partial(jax.jit, static_argnames=("n_qubits",))
def qaoa_probabilities(
    table: jax.Array, gammas: jax.Array, betas: jax.Array, n_qubits: int
) -> jax.Array:
    state = qaoa_state(table, gammas, betas, n_qubits)
    return state[0] * state[0] + state[1] * state[1]


@partial(jax.jit, static_argnames=("n_qubits",))
def qaoa_energy(
    table: jax.Array, gammas: jax.Array, betas: jax.Array, n_qubits: int
) -> jax.Array:
    """Exact expectation <psi(gamma, beta)| H |psi(gamma, beta)>."""
    probs = qaoa_probabilities(table, gammas, betas, n_qubits)
    return jnp.sum(probs * table)


@partial(jax.jit, static_argnames=("n_qubits",))
def qaoa_energies_batch(
    table: jax.Array, gammas: jax.Array, betas: jax.Array, n_qubits: int
) -> jax.Array:
    """Energies for a batch of schedules; gammas/betas are [batch, p]."""
    return jax.vmap(lambda g, b: qaoa_energy(table, g, b, n_qubits))(gammas, betas)


# --- amplitude-sharded QAOA -------------------------------------------------
#
# One state across a mesh axis (sim/sharded_statevector.py conventions):
# the cost phase is shard-local by construction (elementwise against the
# shard's slice of the energy table), and the RX mixer follows the
# engine's shared-combine recipe — every qubit, local or global, lands in
# the SAME traced float expression with a partner array (axis reverse
# within the shard, or one ppermute pair exchange), which keeps energies
# bit-identical across amplitude-axis factorizations.  Because RX is
# symmetric (equal off-diagonals), the combine does not even depend on
# the side bit: new = cos(beta) * self - i sin(beta) * partner.

from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from queasars_tpu.sim.sharded_statevector import (
    AMP_AXIS,
    _block_counts,
    _mesh_bits,
    _tree_reduce_last,
    blocked_shot_positions,
)


def _mixer_combine(state: jax.Array, partner: jax.Array, c, s) -> jax.Array:
    """``exp(-i beta X)`` pair update on [..., 2, L] planes given the
    partner amplitudes: side-independent because RX is symmetric."""
    re = state[..., 0, :]
    im = state[..., 1, :]
    p_re = partner[..., 0, :]
    p_im = partner[..., 1, :]
    return jnp.stack([c * re + s * p_im, c * im - s * p_re], axis=-2)


def _batch_blockwise_energy(
    probs: jax.Array, table_local: jax.Array, n_amp: int, n_qubits: int
) -> jax.Array:
    """[S, local] per-shard probabilities -> [S] global energies with the
    factorization-independent fixed-tree order of
    ``sharded_statevector._blockwise_sum`` (per-block partial sums in a
    fixed binary tree, device-major block order)."""
    total, blocks_local = _block_counts(n_amp, n_qubits)
    values = jax.lax.optimization_barrier(probs * table_local)
    blocks = values.reshape(values.shape[0], blocks_local, -1)
    partials = _tree_reduce_last(blocks)  # [S, blocks_local]
    gathered = jax.lax.all_gather(partials, AMP_AXIS)  # [n_amp, S, blocks_local]
    arranged = jnp.moveaxis(gathered, 0, 1).reshape(values.shape[0], total)
    return _tree_reduce_last(arranged)


def _sharded_qaoa_state(
    table_local: jax.Array, gammas: jax.Array, betas: jax.Array, n_qubits: int, local_bits: int, n_amp: int
) -> jax.Array:
    """Per-shard [S, 2, 2^local_bits] planes for S schedules [S, p]."""
    n_starts = gammas.shape[0]
    local_len = 1 << local_bits
    amp = 1.0 / jnp.sqrt(jnp.float32(1 << n_qubits))
    state = jnp.zeros((n_starts, 2, local_len), jnp.float32).at[:, 0, :].set(amp)
    for layer in range(gammas.shape[1]):
        angle = gammas[:, layer][:, None] * table_local[None, :]
        c = jnp.cos(angle)
        s = jnp.sin(angle)
        re, im = state[:, 0, :], state[:, 1, :]
        state = jnp.stack([re * c + im * s, im * c - re * s], axis=1)
        cb = jnp.cos(betas[:, layer])[:, None]
        sb = jnp.sin(betas[:, layer])[:, None]
        for q in range(n_qubits):
            if q < local_bits:
                high = local_len >> (q + 1)
                partner = state.reshape(n_starts, 2, high, 2, 1 << q)[
                    :, :, :, ::-1, :
                ].reshape(n_starts, 2, local_len)
            else:
                bit_pos = q - local_bits
                perm = [(i, i ^ (1 << bit_pos)) for i in range(n_amp)]
                partner = jax.lax.ppermute(state, AMP_AXIS, perm)
            state = _mixer_combine(state, partner, cb, sb)
    return state


def make_sharded_qaoa_energies_fn(mesh: Mesh, n_qubits: int):
    """Compiled ``(table_sharded, gammas [S, p], betas [S, p]) -> [S]``
    exact energies over an amplitude mesh; differentiable (the Adam loop
    runs ``jax.grad`` straight through the shard_map)."""
    n_amp, local_bits = _mesh_bits(mesh, n_qubits)

    def body(table_local, gammas, betas):
        state = _sharded_qaoa_state(table_local, gammas, betas, n_qubits, local_bits, n_amp)
        probs = state[:, 0, :] ** 2 + state[:, 1, :] ** 2
        return _batch_blockwise_energy(probs, table_local, n_amp, n_qubits)

    return jax.jit(
        shard_map(
            body,
            mesh=mesh,
            in_specs=(P(AMP_AXIS), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )


def make_sharded_qaoa_finalize_fn(mesh: Mesh, n_qubits: int, shots: int, top_k: int = 16):
    """Compiled final measurement for ONE optimized schedule: returns
    ``(top_indices [D*k], top_probs [D*k], samples [shots])`` — per-shard
    top-k of the probability mass (global basis indices) and, when
    ``shots > 0``, hierarchical inverse-CDF shot draws (the distributed
    sampling recipe of ``sharded_evaluator._sampled_energies_fn``); no
    2^n array ever leaves the mesh."""
    n_amp, local_bits = _mesh_bits(mesh, n_qubits)
    k = min(top_k, 1 << local_bits)

    def body(table_local, gammas, betas, key):
        state = _sharded_qaoa_state(
            table_local, gammas[None, :], betas[None, :], n_qubits, local_bits, n_amp
        )
        probs = (state[:, 0, :] ** 2 + state[:, 1, :] ** 2)[0]
        device_id = jax.lax.axis_index(AMP_AXIS)
        base = (device_id.astype(jnp.uint32) << local_bits)

        top_p, top_i = jax.lax.top_k(probs, k)
        all_p = jax.lax.all_gather(top_p, AMP_AXIS).reshape(-1)
        all_i = jax.lax.all_gather(
            top_i.astype(jnp.uint32) | base, AMP_AXIS
        ).reshape(-1)

        if shots > 0:
            # width-invariant blocked inverse-CDF: the sampled bitstrings
            # are bit-identical across mesh factorizations, like the
            # exact-energies path (ADVICE r3: the previous per-shard
            # running-offset draws depended on the shard width)
            pos, in_shard = blocked_shot_positions(probs, key, shots, device_id, n_amp)
            samples = jax.lax.psum(
                jnp.where(in_shard, pos.astype(jnp.uint32) | base, 0).astype(jnp.uint32),
                AMP_AXIS,
            )
        else:
            samples = jnp.zeros((0,), jnp.uint32)
        return all_i, all_p, samples

    return jax.jit(
        shard_map(
            body,
            mesh=mesh,
            in_specs=(P(AMP_AXIS), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )
