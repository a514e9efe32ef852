"""Measurement shot sampling.

Replaces the reference's sampler primitive round trip
(``measure_quasi_distributions``, queasars/circuit_evaluation/
circuit_evaluation.py:29-59): probabilities come straight from the
statevector and shots are drawn with ``jax.random.categorical`` on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("shots",))
def sample_indices(key: jax.Array, probs: jax.Array, shots: int) -> jax.Array:
    """Draw ``shots`` basis-state indices from ``probs`` [2^n].

    Inverse-CDF sampling: O(shots * log 2^n) memory/time.  (The obvious
    ``jax.random.categorical`` draws Gumbel noise of shape [shots, 2^n] —
    16 GB at 20 qubits x 4000 shots.)
    """
    cdf = jnp.cumsum(probs)
    u = jax.random.uniform(key, (shots,), dtype=jnp.float32, maxval=cdf[-1])
    samples = jnp.searchsorted(cdf, u, side="right")
    return jnp.clip(samples, 0, probs.shape[-1] - 1)


@partial(jax.jit, static_argnames=("shots",))
def sample_counts(key: jax.Array, probs: jax.Array, shots: int) -> jax.Array:
    """Draw ``shots`` basis states from ``probs`` [2^n]; return integer
    counts [2^n] (an empirical multinomial, like a sampler's counts dict).
    Same random stream as :func:`sample_indices`."""
    samples = sample_indices(key, probs, shots)
    return jnp.zeros(probs.shape[-1], dtype=jnp.int32).at[samples].add(1)


@partial(jax.jit, static_argnames=("shots",))
def empirical_probs(key: jax.Array, probs: jax.Array, shots: int) -> jax.Array:
    """Shot-noise distribution: counts / shots as float32 [2^n]."""
    return sample_counts(key, probs, shots).astype(jnp.float32) / shots


def quasi_distribution(probs: np.ndarray, atol: float = 1e-12) -> dict[int, float]:
    """Dense probabilities -> sparse {basis_state: probability} dict
    (the reference's QuasiDistribution result surface,
    circuit_evaluation.py:52-59)."""
    probs = np.asarray(probs)
    (nonzero,) = np.nonzero(probs > atol)
    return {int(i): float(probs[i]) for i in nonzero}
