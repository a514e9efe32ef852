"""QAOA solver for the diagonal problem Hamiltonians of this framework.

A capability beyond the reference (DLR-RB/QUEASARS implements only the
evolving-ansatz eigensolver family): the Quantum Approximate Optimization
Algorithm (arXiv:1411.4028) with the standard transverse-field mixer.
Every encoder in ``problems/`` (JSSP domain-wall, QUBO, TSP, graph
coloring, MaxCut, integer programs) emits a diagonal operator, which is
exactly the class QAOA targets — so this solver shares the problem
library, the diagonal energy table, the sampling machinery, and the
result/plot conventions with the EVQE/QNEAT/ADAPT solvers and provides a
fixed-ansatz baseline to compare evolving-ansatz solves against.

TPU-first shape: the simulation (``sim/qaoa.py``) is a differentiable
pure function of the ``(gamma, beta)`` schedule, so optimization is
batched multi-start Adam — ``n_starts`` independent schedules descend in
lock-step inside ONE jitted ``lax.scan`` (``vmap`` over starts, adjoint
through the scan of elementwise layers).  There is no per-start Python
loop and no host round trip inside the optimization: one dispatch per
solve.  The reference could not host this algorithm any more than the
gradient family — its simulator is an opaque primitive RPC
(reference queasars/minimum_eigensolvers/evqe/evolutionary_algorithm/
mutation.py:77-81), while here the whole objective is an XLA program.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from queasars_tpu.paulis import PauliSum
from queasars_tpu.paulis.diagonal import diagonal_energy_table_device
from queasars_tpu.sim.qaoa import (
    make_sharded_qaoa_energies_fn,
    make_sharded_qaoa_finalize_fn,
    qaoa_energies_batch,
    qaoa_state,
)
from queasars_tpu.sim.sampling import sample_indices

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class QAOAConfiguration:
    """Hyperparameters of a QAOA solve.

    :param reps: circuit depth p (number of (cost, mixer) layer pairs)
    :param n_starts: independent random schedules optimized in one
        batched program; the best final energy wins
    :param maxiter: Adam iterations per start
    :param learning_rate: Adam step size
    :param beta1: Adam first-moment decay
    :param beta2: Adam second-moment decay
    :param eps: Adam denominator floor
    :param shots: if set, the final state is measured this many times and
        the lowest-energy sampled bitstring is reported; ``None`` keeps
        the exact distribution and reports the most probable bitstring
    :param seed: seeds the start initialization and the final measurement
    :param mesh: amplitude-shard the state over this mesh's devices
        (``sim/sharded_statevector.py``) — the energy table is built
        shard-locally, the mixer's global qubits exchange via one
        ppermute each, and no 2^n array ever leaves the mesh, so QAOA
        scales past the single-chip qubit ceiling like the VQE family
    :param n_devices: shorthand for ``mesh``: build an amplitude mesh
        over the first ``n_devices`` visible devices
    :param eigenstate_top_k: exact-measurement paths truncate the
        reported ``QAOAResult.eigenstate`` to this many
        highest-probability basis states (per shard when amplitude
        sharded) — the dict need not sum to 1 for broad distributions
    """

    reps: int = 2
    n_starts: int = 8
    maxiter: int = 150
    learning_rate: float = 0.05
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    shots: Optional[int] = None
    seed: int = 0
    mesh: Optional[object] = None
    n_devices: Optional[int] = None
    eigenstate_top_k: int = 64

    def __post_init__(self) -> None:
        if self.eigenstate_top_k < 1:
            raise ValueError("eigenstate_top_k must be positive!")
        if self.reps < 1:
            raise ValueError("QAOA needs at least one (cost, mixer) layer pair!")
        if self.n_starts < 1:
            raise ValueError("n_starts must be at least 1!")
        if self.maxiter < 0:
            raise ValueError("maxiter may not be negative!")
        if self.shots is not None and self.shots < 1:
            raise ValueError("shots, when given, must be positive!")


class QAOAResult:
    """Result of a QAOA solve."""

    def __init__(self) -> None:
        self.eigenvalue: Optional[float] = None
        self.best_bitstring: Optional[int] = None
        self.best_bitstring_energy: Optional[float] = None
        self.optimal_gammas: Optional[tuple[float, ...]] = None
        self.optimal_betas: Optional[tuple[float, ...]] = None
        self.eigenstate: Optional[dict[int, float]] = None
        """Measured/most-probable bitstring distribution.  With
        ``shots`` set this is the exact empirical shot histogram (sums
        to 1).  On the EXACT path it is a TRUNCATED view of the
        eigenstate — the ``eigenstate_top_k`` highest-probability basis
        states (per shard under amplitude sharding, concatenated across
        shards) — so for broad distributions the values need NOT sum
        to 1; raise ``QAOAConfiguration.eigenstate_top_k`` for more
        mass."""
        self.start_energies: Optional[tuple[float, ...]] = None
        self.circuit_evaluations: Optional[int] = None
        self.optimal_state: Optional[np.ndarray] = None
        """The optimized |psi(gamma*, beta*)> as stacked [2, 2^n] re/im
        planes — directly usable as the ``initial_state`` of every VQE
        solver here (warm-started evolving-ansatz refinement via
        ``compute_minimum_eigenvalue_with_initial_state``).  ``None``
        under amplitude sharding: the full state never leaves the mesh
        (re-simulate from ``optimal_gammas``/``optimal_betas``)."""

    def __repr__(self) -> str:
        return (
            f"QAOAResult(eigenvalue={self.eigenvalue}, "
            f"best_bitstring={self.best_bitstring}, "
            f"best_bitstring_energy={self.best_bitstring_energy})"
        )


def _multi_start_adam(
    energies_batch,
    gammas0: jax.Array,
    betas0: jax.Array,
    lr: float,
    b1: float,
    b2: float,
    eps: float,
    maxiter: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Adam over [n_starts, 2p] schedules in one scan; returns
    (final gammas, final betas, final energies per start).

    ``energies_batch`` maps [n_starts, 2p] packed (gammas | betas)
    parameters to [n_starts] energies — the single-chip table closure or
    the amplitude-sharded shard_map program.  The starts are independent,
    so the gradient of their sum IS the per-start gradient stack."""

    p = gammas0.shape[1]
    grad_fn = jax.grad(lambda params: jnp.sum(energies_batch(params)))

    @jax.jit
    def run(params0):
        def step(carry, k):
            params, m, v = carry
            g = grad_fn(params)
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            t = (k + 1).astype(jnp.float32)
            m_hat = m / (1.0 - jnp.power(b1, t))
            v_hat = v / (1.0 - jnp.power(b2, t))
            params = params - lr * m_hat / (jnp.sqrt(v_hat) + eps)
            return (params, m, v), None

        zeros = jnp.zeros_like(params0)
        (params, _, _), _ = jax.lax.scan(step, (params0, zeros, zeros), jnp.arange(maxiter))
        return params, energies_batch(params)

    params, energies = run(jnp.concatenate([gammas0, betas0], axis=1))
    return params[:, :p], params[:, p:], energies


def _host_state_energies(
    coeffs: np.ndarray, z_masks: np.ndarray, states: np.ndarray
) -> np.ndarray:
    """Exact diagonal energies of a few basis states from the O(K) term
    data (float64 on host) — avoids touching any 2^n table."""
    states = np.asarray(states, dtype=np.uint64).reshape(-1, 1)
    masks = np.asarray(z_masks, dtype=np.uint64).reshape(1, -1)
    parity = (np.bitwise_count(states & masks) & 1).astype(np.float64)
    return (1.0 - 2.0 * parity) @ np.asarray(coeffs, dtype=np.float64)


class QAOAMinimumEigensolver:
    """Fixed-ansatz QAOA baseline over the framework's problem encoders.

    Accepts any diagonal :class:`PauliSum` (all ``problems/`` encoders);
    a non-diagonal operator raises — the standard QAOA cost layer is the
    time evolution of a classical objective, and this framework's
    non-diagonal Hamiltonians are served by the VQE family instead.
    """

    def __init__(self, configuration: QAOAConfiguration) -> None:
        self.configuration = configuration

    def _resolve_mesh(self):
        config = self.configuration
        if config.mesh is not None:
            from queasars_tpu.sim.sharded_evaluator import as_amplitude_mesh

            return as_amplitude_mesh(config.mesh)
        if config.n_devices is not None and config.n_devices > 1:
            from queasars_tpu.sim.sharded_evaluator import amplitude_mesh

            return amplitude_mesh(config.n_devices)
        return None

    def compute_minimum_eigenvalue(self, operator: PauliSum) -> QAOAResult:
        config = self.configuration
        if not operator.is_diagonal:
            raise ValueError(
                "QAOA's cost layer requires a diagonal operator; use the VQE "
                "solvers for Hamiltonians with X/Y terms."
            )
        n_qubits = operator.n_qubits
        mesh = self._resolve_mesh()
        p = config.reps

        if mesh is not None:
            from queasars_tpu.paulis.diagonal import diagonal_terms
            from queasars_tpu.sim.sharded_statevector import build_device_table

            coeffs, z_masks = diagonal_terms(operator)
            table = build_device_table(mesh, coeffs, z_masks, n_qubits)
            energies_fn = make_sharded_qaoa_energies_fn(mesh, n_qubits)

            def energies_batch(params):
                return energies_fn(table, params[:, :p], params[:, p:])

        else:
            table = diagonal_energy_table_device(operator)

            def energies_batch(params):
                return qaoa_energies_batch(table, params[:, :p], params[:, p:], n_qubits)

        key = jax.random.PRNGKey(config.seed)
        key_init, key_measure = jax.random.split(key)
        key_g, key_b = jax.random.split(key_init)
        # small random cost angles (the table sets the energy scale, so a
        # unit gamma can wrap many times); mixer angles over a half period
        scale = jnp.maximum(jnp.max(jnp.abs(table)), 1e-6)
        gammas0 = (
            jax.random.uniform(key_g, (config.n_starts, config.reps), minval=0.0, maxval=1.0)
            / scale
        )
        betas0 = jax.random.uniform(
            key_b, (config.n_starts, config.reps), minval=0.0, maxval=float(np.pi) / 2.0
        )

        gammas, betas, energies = _multi_start_adam(
            energies_batch,
            gammas0.astype(jnp.float32),
            betas0.astype(jnp.float32),
            config.learning_rate,
            config.beta1,
            config.beta2,
            config.eps,
            config.maxiter,
        )
        energies_host = np.asarray(energies)
        best = int(np.argmin(energies_host))
        best_gammas = gammas[best]
        best_betas = betas[best]

        result = QAOAResult()
        if mesh is not None:
            finalize = make_sharded_qaoa_finalize_fn(
                mesh, n_qubits, config.shots if config.shots is not None else 0,
                top_k=config.eigenstate_top_k,
            )
            top_i, top_p, samples = finalize(table, best_gammas, best_betas, key_measure)
            top_i = np.asarray(top_i)
            top_p = np.asarray(top_p, dtype=np.float64)
            if config.shots is not None:
                samples = np.asarray(samples)
                sampled_energies = _host_state_energies(coeffs, z_masks, samples)
                best_state = int(samples[int(np.argmin(sampled_energies))])
                unique, counts = np.unique(samples, return_counts=True)
                distribution = {
                    int(s): float(c) / config.shots for s, c in zip(unique, counts)
                }
            else:
                best_state = int(top_i[int(np.argmax(top_p))])
                order = np.argsort(top_p)[::-1]
                order = order[top_p[order] > 1e-9]
                distribution = {int(top_i[i]): float(top_p[i]) for i in order}
            result.best_bitstring_energy = float(
                _host_state_energies(coeffs, z_masks, np.asarray([best_state]))[0]
            )
            # the full 2^n state never leaves the mesh; warm-starting a
            # sharded VQE solve re-simulates from the schedule instead
            result.optimal_state = None
        else:
            final_state = qaoa_state(table, best_gammas, best_betas, n_qubits)
            probs = final_state[0] * final_state[0] + final_state[1] * final_state[1]
            table_host = np.asarray(table, dtype=np.float64)
            if config.shots is not None:
                samples = sample_indices(key_measure, probs, config.shots)
                sampled_energies = table[samples]
                hit = int(np.argmin(np.asarray(sampled_energies)))
                best_state = int(np.asarray(samples)[hit])
                unique, counts = np.unique(np.asarray(samples), return_counts=True)
                distribution = {
                    int(s): float(c) / config.shots for s, c in zip(unique, counts)
                }
            else:
                probs_host = np.asarray(probs, dtype=np.float64)
                best_state = int(np.argmax(probs_host))
                top = np.argsort(probs_host)[::-1]
                top = top[probs_host[top] > 1e-9][: config.eigenstate_top_k]
                distribution = {int(s): float(probs_host[s]) for s in top}
            result.best_bitstring_energy = float(table_host[best_state])
            result.optimal_state = np.asarray(final_state)

        result.eigenvalue = float(energies_host[best])
        result.best_bitstring = best_state
        result.optimal_gammas = tuple(float(g) for g in np.asarray(best_gammas))
        result.optimal_betas = tuple(float(b) for b in np.asarray(best_betas))
        result.eigenstate = distribution
        result.start_energies = tuple(float(e) for e in energies_host)
        # ledger convention: each Adam step charges 2 reference-equivalent
        # evaluations (forward + adjoint), matching the gradient family
        # (optim/gradient.py GradientDescentConfig.n_circuit_evaluations),
        # plus the final forward pass that reads the converged energies
        result.circuit_evaluations = config.n_starts * (2 * config.maxiter + 1)
        logger.info(
            "QAOA p=%d: best of %d starts reached <H> = %.6f",
            config.reps,
            config.n_starts,
            result.eigenvalue,
        )
        return result
