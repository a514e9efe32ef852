"""Diagonal (Z/I-only) Pauli-sum evaluation: energy tables.

The JSSP encoder emits a purely diagonal Hamiltonian (reference:
queasars/job_shop_scheduling/domain_wall_hamiltonian_encoder.py builds only
Z/I strings), so every circuit-evaluation expectation reduces to
``sum_i |psi_i|^2 * e_i`` against a per-basis-state energy table
``e_i = sum_k c_k * (-1)^popcount(z_k & i)``.

Two implementations:

- :func:`diagonal_energy_table` — numpy host oracle (float64; the reference
  accumulates coefficients in f64 which matters for the exponential makespan
  weights, see domain_wall_hamiltonian_encoder.py:335).
- :func:`diagonal_energy_table_device` — jitted TPU version formulated as two
  MXU matmuls: parity(z_k & i) = (bits(i) @ bits(z_k)) mod 2, so the sign
  matrix is ``1 - 2*((I_bits @ Z_bits^T) mod 2)`` and the table is one more
  matmul against the coefficient vector.

The native C++ oracle (csrc/) provides a third implementation for large-n
host-side validation; see queasars_tpu.utils.native.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from queasars_tpu.paulis.pauli_sum import PauliSum


def diagonal_terms(op: PauliSum) -> tuple[np.ndarray, np.ndarray]:
    """Extract (coeffs_f64, z_masks_u64) from a diagonal PauliSum (n<=64)."""
    if not op.is_diagonal:
        raise ValueError("operator is not diagonal (contains X/Y terms)")
    if op.n_qubits > 64:
        raise NotImplementedError("diagonal tables limited to n<=64 qubits")
    coeffs = op.coeffs
    if np.abs(coeffs.imag).max(initial=0.0) > 1e-12:
        raise ValueError("diagonal operator must have real coefficients")
    return coeffs.real.astype(np.float64), op.z_masks_lo64()


def diagonal_energy_table(op: PauliSum, dtype=np.float64) -> np.ndarray:
    """Host oracle: dense [2^n] energy table in float64 (cast on return).

    Uses the native C++ kernel (csrc/diag_table.cpp via
    queasars_tpu.utils.native) when available; numpy otherwise.
    """
    coeffs, z_masks = diagonal_terms(op)
    n = op.n_qubits

    from queasars_tpu.utils.native import native_diagonal_energy_table

    native = native_diagonal_energy_table(coeffs, z_masks, n)
    if native is not None:
        return native.astype(dtype)

    idx = np.arange(1 << n, dtype=np.uint64)
    table = np.zeros(1 << n, dtype=np.float64)
    for c, z in zip(coeffs, z_masks):
        parity = np.bitwise_count(idx & z).astype(np.int64) & 1
        table += c * (1.0 - 2.0 * parity)
    return table.astype(dtype)


from functools import partial


@partial(jax.jit, static_argnames=("n_qubits",))
def _energy_table_scan(z_masks: jax.Array, coeffs: jax.Array, n_qubits: int) -> jax.Array:
    """Scan over terms with a [2^n] accumulator — O(2^n) live memory.

    parity(z & i) via ``lax.population_count`` on the VPU; no [2^n, K]
    intermediate ever materializes, so this scales to n=20+ with thousands
    of terms.
    """
    idx = jnp.arange(1 << n_qubits, dtype=jnp.uint32)

    def step(acc, term):
        z, c = term
        parity = (jax.lax.population_count(idx & z) & 1).astype(jnp.float32)
        return acc + c * (1.0 - 2.0 * parity), None

    init = jnp.zeros(1 << n_qubits, dtype=jnp.float32)
    table, _ = jax.lax.scan(step, init, (z_masks, coeffs))
    return table


def diagonal_energy_table_device(op: PauliSum) -> jax.Array:
    """Device energy table [2^n] float32.

    The exact exponential makespan coefficients can exceed float32 precision
    for larger instances; when 1e-8-level fidelity is required, build the
    table on host in f64 (:func:`diagonal_energy_table`) and ship it.
    """
    coeffs, z_masks = diagonal_terms(op)
    if op.n_qubits > 32:
        raise NotImplementedError("device tables limited to n<=32 qubits")
    return _energy_table_scan(
        jnp.asarray(z_masks.astype(np.uint32)),
        jnp.asarray(coeffs, dtype=jnp.float32),
        op.n_qubits,
    )
