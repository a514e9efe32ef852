"""ADAPT-VQE: gradient-screened adaptive ansatz growth (arXiv:1812.11173).

A capability beyond the reference (which implements only the
genetic-algorithm E-VQE and names MoG-VQE/QNEAT as future work —
README.md:3): ADAPT-VQE grows a single ansatz one gate at a time,
selecting at each step the operator-pool candidate with the largest
energy-gradient magnitude at zero angle, then re-optimizing every
placed parameter.  It is the most widely used adaptive-ansatz VQE and
drops into this framework naturally because the simulator is a
differentiable pure function (the same property that hosts
:class:`~queasars_tpu.optim.gradient.BatchedGradientDescent` — the
reference cannot host either, its simulator being an opaque RPC
endpoint, mutation.py:77-81).

TPU-first shape: the ansatz lives as the standard packed genome tensors
(``gate_types[L,n]`` / ``controls[L,n]`` / ``angles[L,n,3]`` /
``layer_mask[L]``) padded to a static ``max_depth``, so the WHOLE solve
compiles exactly two programs — one vmapped pool-gradient screen (every
candidate's d⟨H⟩/dθ at θ=0 in a single batched forward+adjoint pass)
and one Adam re-optimization scan — re-invoked with new tensor
*contents* as the ansatz grows, never retraced.  Growth appends one
single-gate layer per iteration; the result converts to a standard
:class:`~queasars_tpu.genome.individual.EVQEIndividual` (QASM export,
evaluators, serialization all apply).

The candidate pool stays inside the genome's U3/CU3 gate alphabet so
every grown ansatz is a valid genome:

- ``RY(q)``   = U3(theta, 0, 0)        — real rotation
- ``RZ(q)``   = U3(0, 0, theta)        — phase rotation (diag(1, e^{i theta}))
- ``CRY(c,t)``= CU3(theta, 0, 0)
- ``CP(c,t)`` = CU3(0, 0, theta)       — controlled phase

For a diagonal Hamiltonian the diagonal candidates (RZ/CP) commute with
H when appended last, so their screen gradient is exactly zero and the
selection is driven by RY/CRY — no special-casing needed.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from queasars_tpu.genome.circuit_layer import EVQECircuitLayer
from queasars_tpu.genome.gates import (
    ControlGate,
    ControlledRotationGate,
    IdentityGate,
    RotationGate,
)
from queasars_tpu.genome.individual import EVQEIndividual
from queasars_tpu.paulis import PauliSum
from queasars_tpu.paulis.diagonal import diagonal_energy_table
from queasars_tpu.sim.evaluators import _prepare_initial_state
from queasars_tpu.sim.expectation import general_pauli_expectation_real
from queasars_tpu.sim.statevector import (
    GATE_CROT,
    GATE_CTRL,
    GATE_ROT,
    _apply_slot,
    apply_circuit_real,
)

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class AdaptVQEConfiguration:
    """Hyperparameters of the ADAPT-VQE growth loop.

    :param max_depth: ansatz growth budget — also the STATIC layer
        capacity of the compiled programs (one gate per grown layer)
    :param gradient_tolerance: stop growing when the largest pool
        gradient magnitude falls below this (the arXiv:1812.11173
        convergence criterion)
    :param energy_tolerance: optional additional stop — end the loop
        when a growth iteration improves the energy by less than this
    :param pool: candidate pool — ``"full"`` (RY/RZ per qubit + CRY/CP
        on every ordered qubit pair), ``"linear"`` (pairs restricted to
        nearest neighbours, both directions), or ``"single"``
        (single-qubit rotations only)
    :param optimizer_maxiter: Adam steps of the full re-optimization
        after each growth step (every placed parameter free, as in the
        original algorithm)
    :param learning_rate / b1 / b2 / eps: Adam hyperparameters
    :param start: reference state when no ``initial_state`` is given —
        ``"plus"`` (uniform superposition, the default) or ``"zero"``.
        Every pool gradient is the expectation of a commutator,
        identically zero when the current state is an H eigenstate; for
        a DIAGONAL Hamiltonian every basis state is one, so starting
        from |0...0> would converge at depth 0 with nothing grown — the
        superposition start is the ADAPT-QAOA convention for diagonal
        objectives and is harmless for general operators
    :param initial_state: optional start state — a statevector or an
        :class:`EVQEIndividual` whose circuit prepares it (same
        contract as the evaluators); overrides ``start``
    :param mesh: shard the pool-gradient screen over this device mesh —
        the candidate axis (O(n²) candidates for the ``"full"`` pool) is
        ADAPT-VQE's natural parallel dimension, each device screening
        its block of the pool against the replicated state; per-device
        results agree with the single-device screen to float exactness
    :param n_devices: shorthand for ``mesh``: screen over the first
        ``n_devices`` visible devices
    """

    max_depth: int = 20
    gradient_tolerance: float = 1e-3
    energy_tolerance: Optional[float] = None
    pool: str = "full"
    optimizer_maxiter: int = 100
    learning_rate: float = 0.1
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    start: str = "plus"
    initial_state: Optional[Union[np.ndarray, EVQEIndividual]] = None
    mesh: Optional[object] = None
    n_devices: Optional[int] = None

    def __post_init__(self):
        if self.max_depth < 1:
            raise ValueError("max_depth must be at least 1")
        if self.gradient_tolerance < 0:
            raise ValueError("gradient_tolerance must be non-negative")
        if self.energy_tolerance is not None and self.energy_tolerance < 0:
            raise ValueError("energy_tolerance must be non-negative")
        if self.pool not in ("full", "linear", "single"):
            raise ValueError(f"pool must be 'full', 'linear' or 'single', got {self.pool!r}")
        if self.optimizer_maxiter < 1:
            raise ValueError("optimizer_maxiter must be at least 1")
        if self.learning_rate <= 0:
            raise ValueError("learning_rate must be positive")
        if self.start not in ("plus", "zero"):
            raise ValueError(f"start must be 'plus' or 'zero', got {self.start!r}")


@dataclass(frozen=True)
class AdaptVQEIterationRecord:
    """One growth iteration: what was screened, picked and reached."""

    candidate: str
    gradient: float
    energy: float


@dataclass(frozen=True)
class AdaptVQEResult:
    """Outcome of an ADAPT-VQE solve.

    ``n_circuit_evaluations`` counts one evaluation per screened pool
    gradient and two per Adam step (forward + adjoint), matching the
    accounting of :class:`GradientDescentConfig.n_circuit_evaluations`.
    """

    eigenvalue: float
    optimal_individual: EVQEIndividual
    iterations: tuple[AdaptVQEIterationRecord, ...]
    n_circuit_evaluations: int
    converged: bool

    @property
    def optimal_point(self) -> np.ndarray:
        return np.asarray(self.optimal_individual.parameter_values, dtype=np.float64)


def _energy_closure(diagonal: bool, operands):
    if diagonal:
        table = operands

        def efn(state):
            return jnp.sum((state[0] * state[0] + state[1] * state[1]) * table)

        return efn
    cr, ci, z, x = operands

    def efn(state):
        return general_pauli_expectation_real(state, cr, ci, z, x)

    return efn


def _pool_gradient(state, types_row, controls_row, amask_row, operands, n_qubits, diagonal):
    """d⟨H⟩/dθ at θ=0 for appending one pool candidate to ``state``."""
    efn = _energy_closure(diagonal, operands)

    def energy_at(theta):
        ang = amask_row * theta
        s = state
        for q in range(n_qubits):
            s = _apply_slot(s, q, types_row[q], controls_row[q], ang[q], n_qubits)
        return efn(s)

    return jax.grad(energy_at)(jnp.float32(0.0))


@partial(jax.jit, static_argnames=("n_qubits", "diagonal"))
def _screen_pool(
    state, pool_types, pool_controls, pool_amask, operands, n_qubits, diagonal
):
    """Pool gradients at θ=0: each candidate is a one-hot single-gate
    layer ([C, n] types/controls, [C, n, 3] angle placement); the whole
    pool screens in one vmapped forward+adjoint pass."""

    def one(types_row, controls_row, amask_row):
        return _pool_gradient(
            state, types_row, controls_row, amask_row, operands, n_qubits, diagonal
        )

    return jax.vmap(one)(pool_types, pool_controls, pool_amask)


def _screen_pool_sharded(
    mesh, state, pool_types, pool_controls, pool_amask, operands, n_qubits, diagonal
):
    """The pool screen SPMD over a device mesh: the candidate axis is
    the natural parallel dimension of ADAPT-VQE (one forward+adjoint
    pass per candidate, all independent), so each device screens its
    block of the pool against the replicated current state and the
    results concatenate with no collective at all.  Per-candidate math
    is untouched, so sharded and unsharded screens agree to float
    exactness (pinned in tests/test_adapt_vqe.py)."""
    from jax.sharding import PartitionSpec

    axis = mesh.axis_names[0]
    n_dev = int(np.prod(mesh.devices.shape))
    sharded = PartitionSpec(axis)
    replicated = PartitionSpec()

    n_candidates = pool_types.shape[0]
    pad = (-n_candidates) % n_dev
    if pad:
        # padded candidates are all-identity layers: energy_at is then
        # θ-independent, the gradient identically zero, and the pads are
        # sliced off before selection
        pool_types = jnp.concatenate(
            [jnp.asarray(pool_types), jnp.zeros((pad, n_qubits), jnp.int32)]
        )
        pool_controls = jnp.concatenate(
            [jnp.asarray(pool_controls), jnp.full((pad, n_qubits), -1, jnp.int32)]
        )
        pool_amask = jnp.concatenate(
            [jnp.asarray(pool_amask), jnp.zeros((pad, n_qubits, 3), jnp.float32)]
        )

    def local(state, types_block, controls_block, amask_block, operands):
        def one(types_row, controls_row, amask_row):
            return _pool_gradient(
                state, types_row, controls_row, amask_row, operands, n_qubits, diagonal
            )

        return jax.vmap(one)(types_block, controls_block, amask_block)

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            replicated, sharded, sharded, sharded,
            jax.tree.map(lambda _: replicated, operands),
        ),
        out_specs=sharded,
        check_vma=False,
    )
    grads = jax.jit(mapped)(state, pool_types, pool_controls, pool_amask, operands)
    return grads[:n_candidates]


@partial(jax.jit, static_argnames=("n_qubits", "maxiter", "diagonal"))
def _reoptimize(
    gate_types, controls, layer_mask, angles, free_mask, initial, operands,
    lr, b1, b2, eps, n_qubits, maxiter, diagonal,
):
    """Adam over every placed parameter (masked), one compiled scan."""
    efn = _energy_closure(diagonal, operands)

    def loss(a):
        s = apply_circuit_real(gate_types, controls, a, layer_mask, n_qubits, initial)
        return efn(s)

    def step(carry, k):
        a, m, v = carry
        g = jax.grad(loss)(a) * free_mask
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * g * g
        t = (k + 1).astype(jnp.float32)
        m_hat = m / (1.0 - jnp.power(b1, t))
        v_hat = v / (1.0 - jnp.power(b2, t))
        a = a - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        return (a, m, v), None

    zeros = jnp.zeros_like(angles)
    (a, _, _), _ = jax.lax.scan(
        step, (angles, zeros, zeros), jnp.arange(maxiter)
    )
    return a, loss(a)


@partial(jax.jit, static_argnames=("n_qubits",))
def _simulate(gate_types, controls, angles, layer_mask, initial, n_qubits):
    return apply_circuit_real(gate_types, controls, angles, layer_mask, n_qubits, initial)


def _build_pool(n_qubits: int, pool: str):
    """Candidate layers: ([C, n] types, [C, n] controls, [C, n, 3]
    angle placement, [C] labels)."""
    types, controls, amask, labels = [], [], [], []

    def add(label, placements, angle_slot, target):
        t = np.zeros(n_qubits, np.int32)
        c = np.full(n_qubits, -1, np.int32)
        a = np.zeros((n_qubits, 3), np.float32)
        for q, (gt, ct) in placements.items():
            t[q] = gt
            c[q] = ct
        a[target, angle_slot] = 1.0
        types.append(t)
        controls.append(c)
        amask.append(a)
        labels.append(label)

    for q in range(n_qubits):
        add(f"RY({q})", {q: (GATE_ROT, -1)}, 0, q)
        add(f"RZ({q})", {q: (GATE_ROT, -1)}, 2, q)
    if pool != "single":
        if pool == "linear":
            pairs = [(q, q + 1) for q in range(n_qubits - 1)]
            pairs += [(q + 1, q) for q in range(n_qubits - 1)]
        else:
            pairs = [(c, t) for c in range(n_qubits) for t in range(n_qubits) if c != t]
        for c_q, t_q in pairs:
            crot = {t_q: (GATE_CROT, c_q), c_q: (GATE_CTRL, t_q)}
            add(f"CRY({c_q},{t_q})", crot, 0, t_q)
            add(f"CP({c_q},{t_q})", crot, 2, t_q)
    return (
        np.stack(types),
        np.stack(controls),
        np.stack(amask),
        tuple(labels),
    )


class AdaptVQEMinimumEigensolver:
    """Single-ansatz adaptive growth driven by pool gradients.

    Runs on the differentiable jnp engine (single chip); the pool screen
    is one vmapped program over all candidates, the re-optimization one
    Adam scan — both compiled once per solve thanks to the static
    ``max_depth`` tensor capacity.
    """

    def __init__(self, configuration: AdaptVQEConfiguration):
        self.configuration = configuration

    def compute_minimum_eigenvalue(self, operator: PauliSum) -> AdaptVQEResult:
        cfg = self.configuration
        n = operator.n_qubits
        diagonal = operator.is_diagonal
        if diagonal:
            operands = jnp.asarray(diagonal_energy_table(operator, dtype=np.float32))
        else:
            if n > 32:
                raise ValueError("general operators are limited to n <= 32 qubits")
            operands = (
                jnp.asarray(operator.coeffs.real.astype(np.float32)),
                jnp.asarray(operator.coeffs.imag.astype(np.float32)),
                jnp.asarray(operator.z[:, 0].astype(np.uint32)),
                jnp.asarray(operator.x[:, 0].astype(np.uint32)),
            )
        initial = _prepare_initial_state(cfg.initial_state, n)
        if initial is None and cfg.start == "plus":
            amp = np.float32(2.0 ** (-n / 2.0))
            initial = np.stack(
                [np.full(1 << n, amp, np.float32), np.zeros(1 << n, np.float32)]
            )
        if initial is not None:
            initial = jnp.asarray(initial)

        pool_t, pool_c, pool_a, labels = _build_pool(n, cfg.pool)
        pool_t, pool_c, pool_a = map(jnp.asarray, (pool_t, pool_c, pool_a))

        mesh = cfg.mesh
        if mesh is None and cfg.n_devices is not None:
            from queasars_tpu.parallel import population_mesh

            mesh = population_mesh(cfg.n_devices)

        L = cfg.max_depth
        gate_types = np.zeros((L, n), np.int32)
        controls = np.full((L, n), -1, np.int32)
        angles = np.zeros((L, n, 3), np.float32)
        layer_mask = np.zeros(L, bool)
        free_mask = np.zeros((L, n, 3), np.float32)

        history: list[AdaptVQEIterationRecord] = []
        n_evals = 0
        converged = False
        lr = jnp.float32(cfg.learning_rate)
        b1, b2, eps = map(jnp.float32, (cfg.b1, cfg.b2, cfg.eps))
        energy = float(
            _energy_closure(diagonal, operands)(
                _simulate(
                    jnp.asarray(gate_types), jnp.asarray(controls), jnp.asarray(angles),
                    jnp.asarray(layer_mask), initial, n,
                )
            )
        )
        n_evals += 1

        for depth in range(L):
            state = _simulate(
                jnp.asarray(gate_types), jnp.asarray(controls), jnp.asarray(angles),
                jnp.asarray(layer_mask), initial, n,
            )
            if mesh is not None:
                grads = np.asarray(
                    _screen_pool_sharded(
                        mesh, state, pool_t, pool_c, pool_a, operands, n, diagonal
                    )
                )
            else:
                grads = np.asarray(
                    _screen_pool(state, pool_t, pool_c, pool_a, operands, n, diagonal)
                )
            n_evals += len(labels)
            pick = int(np.argmax(np.abs(grads)))
            g_pick = float(grads[pick])
            if abs(g_pick) < cfg.gradient_tolerance:
                converged = True
                logger.info(
                    "ADAPT converged at depth %d: max |pool gradient| %.3e < %.3e",
                    depth, abs(g_pick), cfg.gradient_tolerance,
                )
                break

            gate_types[depth] = np.asarray(pool_t[pick])
            controls[depth] = np.asarray(pool_c[pick])
            layer_mask[depth] = True
            free_mask[depth] = np.asarray(pool_a[pick])

            new_angles, new_energy = _reoptimize(
                jnp.asarray(gate_types), jnp.asarray(controls), jnp.asarray(layer_mask),
                jnp.asarray(angles), jnp.asarray(free_mask), initial, operands,
                lr, b1, b2, eps, n, cfg.optimizer_maxiter, diagonal,
            )
            angles = np.asarray(new_angles)
            new_energy = float(new_energy)
            n_evals += 2 * cfg.optimizer_maxiter
            history.append(
                AdaptVQEIterationRecord(labels[pick], g_pick, new_energy)
            )
            logger.info(
                "ADAPT depth %d: grew %s (gradient %.3e), energy %.6f",
                depth + 1, labels[pick], g_pick, new_energy,
            )
            improvement = energy - new_energy
            energy = new_energy
            if cfg.energy_tolerance is not None and improvement < cfg.energy_tolerance:
                converged = True
                break

        individual = self._to_individual(n, gate_types, controls, angles, layer_mask)
        return AdaptVQEResult(
            eigenvalue=energy,
            optimal_individual=individual,
            iterations=tuple(history),
            n_circuit_evaluations=n_evals,
            converged=converged,
        )

    @staticmethod
    def _to_individual(n, gate_types, controls, angles, layer_mask) -> EVQEIndividual:
        """Convert the grown tensors into a standard genome (one gate
        per layer, identities elsewhere) — QASM export, evaluators and
        JSON codecs then apply unchanged."""
        layers: list[EVQECircuitLayer] = []
        params: list[float] = []
        if not layer_mask.any():
            # converged before growing anything (already an eigenstate):
            # a genome needs >= 1 layer, so emit one all-identity layer
            identity = EVQECircuitLayer(
                n_qubits=n, gates=tuple(IdentityGate(qubit_index=q) for q in range(n))
            )
            return EVQEIndividual(n_qubits=n, layers=(identity,), parameter_values=())
        for l in range(len(layer_mask)):
            if not layer_mask[l]:
                continue
            gates = []
            for q in range(n):
                gt = int(gate_types[l, q])
                if gt == GATE_ROT:
                    gates.append(RotationGate(qubit_index=q))
                elif gt == GATE_CROT:
                    gates.append(
                        ControlledRotationGate(
                            qubit_index=q, control_qubit_index=int(controls[l, q])
                        )
                    )
                elif gt == GATE_CTRL:
                    gates.append(
                        ControlGate(
                            qubit_index=q, controlled_qubit_index=int(controls[l, q])
                        )
                    )
                else:
                    gates.append(IdentityGate(qubit_index=q))
            layers.append(EVQECircuitLayer(n_qubits=n, gates=tuple(gates)))
            for q in range(n):
                if int(gate_types[l, q]) in (GATE_ROT, GATE_CROT):
                    params.extend(float(a) for a in angles[l, q])
        return EVQEIndividual(
            n_qubits=n, layers=tuple(layers), parameter_values=tuple(params)
        )
