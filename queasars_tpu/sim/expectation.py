"""Expectation values: diagonal-table, CVaR-tail and general Pauli sums.

Replaces queasars/circuit_evaluation/expectation_calculation.py:14-103.  The
CVaR semantics match the reference's ``_get_expectation`` exactly: sort
states ascending by energy, accumulate probability mass up to ``alpha``
(the boundary state contributes only the remaining mass), divide by
``alpha`` (CVaR per https://quantum-journal.org/papers/q-2020-04-20-256/).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def expectation_from_probs(probs: jax.Array, energy_table: jax.Array) -> jax.Array:
    """Plain expectation  <E> = sum_i p_i e_i  (alpha=1 fast path,
    reference: expectation_calculation.py:59-61)."""
    # precision=HIGHEST: the TPU default lowers f32 matmuls to ONE bf16
    # pass (~4e-3 relative), which is far outside the 1e-5 engine-parity
    # gates; full-f32 passes keep this memory-bound contraction exact
    return jnp.dot(
        probs, energy_table, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@jax.jit
def cvar_expectation_from_probs(
    probs: jax.Array,
    sorted_energies: jax.Array,
    energy_order: jax.Array,
    alpha: jax.Array,
) -> jax.Array:
    """CVaR over the lower-alpha tail of the distribution.

    :param probs: [2^n] probabilities (or batched [..., 2^n])
    :param sorted_energies: energy table pre-sorted ascending (host-side
        ``argsort`` once per Hamiltonian)
    :param energy_order: the argsort permutation into the unsorted table
    :param alpha: tail mass in (0, 1]

    Vectorized form of the reference's sequential accumulation
    (expectation_calculation.py:14-32): with cum_prev the exclusive prefix
    sum of sorted probabilities, each state contributes
    ``clip(alpha - cum_prev, 0, p)`` of its probability mass.
    """
    p_sorted = probs[..., energy_order]
    cum = jnp.cumsum(p_sorted, axis=-1)
    cum_prev = cum - p_sorted
    weights = jnp.clip(alpha - cum_prev, 0.0, p_sorted)
    return jnp.sum(weights * sorted_energies, axis=-1) / alpha


@jax.jit
def cvar_expectation_from_shot_energies(energies: jax.Array, alpha: jax.Array) -> jax.Array:
    """CVaR lower-alpha tail of an empirical shot multiset.

    :param energies: [..., shots] the sampled states' energies
    :param alpha: tail mass in (0, 1]

    Mathematically identical to :func:`cvar_expectation_from_probs` over
    the counts distribution of the same samples (states with equal
    energy merge; the boundary sample contributes only the remaining
    mass) — but O(shots log shots) instead of O(2^n): sort the sampled
    energies, weight each sample's 1/shots mass against the alpha
    cutoff.  Float summation order differs from the counts path at the
    rounding level.
    """
    shots = energies.shape[-1]
    sorted_e = jnp.sort(energies, axis=-1)
    mass = jnp.float32(1.0 / shots)
    cum_prev = jnp.arange(shots, dtype=jnp.float32) * mass
    weights = jnp.clip(alpha - cum_prev, 0.0, mass)
    return jnp.sum(weights * sorted_e, axis=-1) / alpha


@jax.jit
def general_pauli_expectation_real(
    state: jax.Array,
    coeffs_re: jax.Array,
    coeffs_im: jax.Array,
    z_masks: jax.Array,
    x_masks: jax.Array,
) -> jax.Array:
    """<psi|H|psi> for an arbitrary Pauli sum, matrix-free, on re/im planes.

    TPU-safe variant of :func:`general_pauli_expectation` (no complex
    dtypes).  Per term t_k = sum_i conj(psi_i) sign_i psi_{i^x}; the result
    is sum_k Re(c_k t_k) = sum_k cr_k Re(t_k) - ci_k Im(t_k).

    :param state: [2, 2^n] float32 (re/im planes)
    """
    dim = state.shape[-1]
    idx = jnp.arange(dim, dtype=jnp.uint32)
    re, im = state[0], state[1]

    def term(acc, inputs):
        cr, ci, z, x = inputs
        signs = 1.0 - 2.0 * (jax.lax.population_count(idx & z) & 1).astype(jnp.float32)
        flip = idx ^ x
        fr, fi = re[flip], im[flip]
        t_re = jnp.sum(signs * (re * fr + im * fi))
        t_im = jnp.sum(signs * (re * fi - im * fr))
        return acc + cr * t_re - ci * t_im, None

    acc, _ = jax.lax.scan(
        term, jnp.float32(0.0), (coeffs_re, coeffs_im, z_masks, x_masks)
    )
    return acc


def general_pauli_expectation(
    state: jax.Array,
    coeffs: jax.Array,
    z_masks: jax.Array,
    x_masks: jax.Array,
) -> jax.Array:
    """<psi|H|psi> for an arbitrary Pauli sum, matrix-free.

    Per term:  (P psi)[i] = (-1)^{|z & i|} psi[i ^ x],  accumulated with a
    scan over terms (O(2^n) live memory).  Replaces the reference estimator
    path for non-diagonal operators (OperatorCircuitEvaluator,
    circuit_evaluation.py:164-219).

    :param state: [2^n] complex statevector
    :param coeffs: [K] complex coefficients
    :param z_masks: [K] uint32 Z masks
    :param x_masks: [K] uint32 X masks
    :return: scalar real expectation
    """
    dim = state.shape[-1]
    idx = jnp.arange(dim, dtype=jnp.uint32)

    def term(acc, inputs):
        c, z, x = inputs
        signs = 1.0 - 2.0 * (jax.lax.population_count(idx & z) & 1).astype(jnp.float32)
        flipped = state[idx ^ x]
        # vdot conjugates its first argument: sum_i conj(psi_i) sign_i psi_{i^x}
        return acc + c * jnp.vdot(state * signs, flipped), None

    acc, _ = jax.lax.scan(term, jnp.complex64(0.0), (coeffs, z_masks, x_masks))
    return jnp.real(acc)
