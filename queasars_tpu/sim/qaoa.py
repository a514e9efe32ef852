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
