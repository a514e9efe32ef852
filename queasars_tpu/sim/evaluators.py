"""Population circuit evaluators: the reference's L1 seam, TPU-native.

Replaces queasars/circuit_evaluation/circuit_evaluation.py:62-291.  The
reference API is "list of circuits + param vectors -> list of floats"
terminating in Qiskit primitive RPCs; here the API is "population of
genomes -> energies" terminating in one jitted device program.  Three
implementations mirror the reference's three:

=========================================  =====================================
Reference                                   Here
=========================================  =====================================
OperatorCircuitEvaluator (:164-219)         StatevectorExpectationEvaluator
OperatorSamplerCircuitEvaluator (:94-161)   SamplerExpectationEvaluator
BitstringCircuitEvaluator (:222-291)        BitstringFunctionEvaluator
=========================================  =====================================

The mutex/batching/transpiling primitive wrappers
(mutex_primitives.py, transpiling_primitives.py) have no equivalent by
design: evaluation is a pure SPMD program — there is nothing to lock, and
lowering genomes to tensors replaces transpilation (SURVEY.md §2.3 P2/P3).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from functools import partial
from typing import Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp

from queasars_tpu.genome.individual import EVQEIndividual
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.paulis import PauliSum
from queasars_tpu.paulis.diagonal import diagonal_energy_table
from queasars_tpu.sim.expectation import (
    cvar_expectation_from_probs,
    expectation_from_probs,
    general_pauli_expectation_real,
)
from queasars_tpu.sim.sampling import sample_counts, sample_indices
from queasars_tpu.sim.statevector import probabilities, simulate_circuits
from queasars_tpu.utils.bitstring_evaluation import BitstringEvaluator


class CircuitEvaluatorException(Exception):
    """Raised for evaluator misuse (reference: circuit_evaluation.py:90)."""


def _prepare_initial_state(
    initial_state: Optional[Union[np.ndarray, EVQEIndividual]], n_qubits: int
) -> Optional[jnp.ndarray]:
    """Accept a complex [2^n] or stacked real [2, 2^n] start state, or an
    :class:`EVQEIndividual` whose (parameter-bound) circuit prepares the
    start state — the TPU-native form of the reference's initial-state
    circuit prepend (circuit_evaluation.py:148-149,201-202): the state is
    simulated once here instead of re-prepending gates to every circuit.
    """
    if initial_state is None:
        return None
    if isinstance(initial_state, EVQEIndividual):
        if initial_state.n_qubits != n_qubits:
            raise CircuitEvaluatorException(
                "the initial-state circuit acts on a different qubit count than the operator"
            )
        packed = PackedPopulation.pack([initial_state])
        state = simulate_circuits(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n_qubits
        )[0]
        return jnp.asarray(state)
    arr = np.asarray(initial_state)
    if arr.ndim == 1:
        if arr.shape[0] != 1 << n_qubits:
            raise CircuitEvaluatorException("initial_state has the wrong dimension")
        stacked = np.stack([arr.real, arr.imag]).astype(np.float32)
    elif arr.ndim == 2 and arr.shape[0] == 2:
        stacked = arr.astype(np.float32)
    else:
        raise CircuitEvaluatorException("initial_state must be [2^n] complex or [2, 2^n] real")
    norm = float((stacked**2).sum())
    if abs(norm - 1.0) > 1e-5:
        raise CircuitEvaluatorException("initial_state must be normalized")
    return jnp.asarray(stacked)


@partial(jax.jit, static_argnames=("n_qubits",))
def _energies_exact(gate_types, controls, angles, layer_mask, table, n_qubits, initial_state=None):
    probs = probabilities(gate_types, controls, angles, layer_mask, n_qubits, initial_state)
    return expectation_from_probs(probs, table)


@partial(jax.jit, static_argnames=("n_qubits",))
def _energies_cvar(
    gate_types, controls, angles, layer_mask, sorted_energies, order, alpha, n_qubits, initial_state=None
):
    probs = probabilities(gate_types, controls, angles, layer_mask, n_qubits, initial_state)
    return cvar_expectation_from_probs(probs, sorted_energies, order, alpha)


@partial(jax.jit, static_argnames=("n_qubits",))
def _energies_dense(gate_types, controls, angles, layer_mask, h_re, h_im, n_qubits, initial_state=None):
    """<psi|H|psi> via dense Hermitian matvec on the MXU (small n).

    Real-pair arithmetic: (H psi) re/im from the split matrices; the
    expectation of a Hermitian operator is real, so only the real
    contraction is taken.
    """
    states = simulate_circuits(gate_types, controls, angles, layer_mask, n_qubits, initial_state)
    ar, ai = states[:, 0, :], states[:, 1, :]
    hr_ar = jnp.dot(
        ar, h_re.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    hi_ai = jnp.dot(ai, h_im.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    hr_ai = jnp.dot(ai, h_re.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    hi_ar = jnp.dot(ar, h_im.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    out_re = hr_ar - hi_ai
    out_im = hr_ai + hi_ar
    return jnp.sum(ar * out_re + ai * out_im, axis=-1)


@partial(jax.jit, static_argnames=("n_qubits",))
def _energies_general(
    gate_types, controls, angles, layer_mask, coeffs_re, coeffs_im, z_masks, x_masks,
    n_qubits, initial_state=None
):
    states = simulate_circuits(gate_types, controls, angles, layer_mask, n_qubits, initial_state)
    fn = lambda s: general_pauli_expectation_real(s, coeffs_re, coeffs_im, z_masks, x_masks)
    # lax.map (not vmap): each individual's term-scan reductions keep the
    # exact same shape regardless of the batch size, so mesh shards of any
    # size produce bit-identical energies (vmap'd row reductions vectorize
    # differently per batch size on CPU)
    return jax.lax.map(fn, states)


@partial(jax.jit, static_argnames=("n_qubits", "shots"))
def _sampled_probs(gate_types, controls, angles, layer_mask, keys, n_qubits, shots, initial_state=None):
    """Empirical measurement distributions; ``keys`` is one PRNG key per
    individual [P, 2] so the shot stream is independent of how the
    population axis is sharded."""
    probs = probabilities(gate_types, controls, angles, layer_mask, n_qubits, initial_state)
    counts = jax.vmap(lambda k, p: sample_counts(k, p, shots))(keys, probs)
    return counts.astype(jnp.float32) / shots


@partial(
    jax.jit,
    static_argnames=("n_qubits", "shots", "use_cvar", "use_pallas"),
)
def _sampled_diag_energies(
    gate_types, controls, angles, layer_mask, keys, table, sorted_energies,
    energy_order, alpha, initial_state, *, n_qubits, shots, use_cvar, use_pallas,
):
    """Diagonal sampler-path energies through the SAME dispatch the
    batched optimizers use (optim/objective.py::population_energies):
    counts-based on the jnp engine (the committed-fixture CPU path,
    bit-identical to the pre-round-5 helper), the in-kernel samplers
    under ``use_pallas`` (slot kernel to n=20, folded in-VMEM sampler to
    n=22)."""
    from queasars_tpu.optim.objective import population_energies

    return population_energies(
        gate_types, controls, angles, layer_mask, table, sorted_energies,
        energy_order, alpha, keys, n_qubits=n_qubits, shots=shots,
        use_cvar=use_cvar, use_shots=True, initial_state=initial_state,
        use_pallas=use_pallas,
    )


@partial(jax.jit, static_argnames=("n_qubits", "shots"))
def _sampled_energies_pallas(gate_types, controls, angles, layer_mask, keys, table, n_qubits, shots):
    """Sampled states' energies [P, shots] on the Pallas path.

    When the in-kernel sampler applies (n >= 14), the
    whole measurement — simulation + hierarchical inverse CDF — runs
    inside one kernel and only [P, shots] energies leave the chip; the
    draw values are the same ``frac * total`` as ``sample_indices``, so
    the multiset matches up to CDF-rounding boundary flips.  Otherwise:
    fused probs kernel + the shot-multiset fast path (identical stream
    to ``sample_counts``)."""
    if n_qubits >= 14:
        from queasars_tpu.sim.pallas_kernels import pallas_sampled_shot_energies

        frac = jax.vmap(lambda k: jax.random.uniform(k, (shots,), jnp.float32))(keys)
        return pallas_sampled_shot_energies(
            gate_types, controls, angles, layer_mask, table, frac, n_qubits, shots
        )
    from queasars_tpu.sim.pallas_kernels import pallas_population_probs

    probs = pallas_population_probs(gate_types, controls, angles, layer_mask, n_qubits)
    idx = jax.vmap(lambda k, p: sample_indices(k, p, shots))(keys, probs)
    return table[idx]


class BaseCircuitEvaluator(ABC):
    """Uniform "population -> energies" contract
    (reference: circuit_evaluation.py:62-87).

    When a device mesh is attached (:meth:`set_mesh`), every population
    evaluation runs SPMD with the population axis sharded over the mesh —
    the TPU-native replacement for the reference's per-individual executor
    fan-out (selection.py:75-84)."""

    def __init__(self, n_qubits: int):
        self.n_qubits = n_qubits
        self.mesh = None

    def set_mesh(self, mesh) -> None:
        """Shard subsequent population evaluations over ``mesh``'s
        population axis (None detaches)."""
        self.mesh = mesh

    def _run_batched(self, fn, pop_args: tuple, rep_args: tuple = ()) -> np.ndarray:
        """Run ``fn(pop_args, rep_args)`` on the default device, or SPMD
        over the attached mesh (population padded to the mesh's pad
        multiple, outputs trimmed back)."""
        if self.mesh is None:
            return np.asarray(fn(pop_args, rep_args))
        from queasars_tpu.parallel.mesh import (
            pad_population_axis,
            population_pad_multiple,
            run_population_sharded,
        )

        pop = pop_args[0].shape[0]
        multiple = population_pad_multiple(self.mesh)
        padded = tuple(pad_population_axis(np.asarray(arr), multiple) for arr in pop_args)
        out = run_population_sharded(self.mesh, fn, padded, rep_args)
        return np.asarray(out)[:pop]

    @abstractmethod
    def evaluate_packed(
        self, packed: PackedPopulation, angles: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Energies [B] for a packed population; ``angles`` optionally
        overrides the packed angle tensor (the optimizer's hot path)."""

    def evaluate_individuals(self, individuals: Sequence[EVQEIndividual]) -> list[float]:
        """Convenience wrapper: pack then evaluate."""
        packed = PackedPopulation.pack(individuals)
        return [float(v) for v in self.evaluate_packed(packed)]

    def evaluate_circuits(
        self,
        circuits: Sequence[EVQEIndividual],
        parameter_values: Sequence[Sequence[float]],
    ) -> list[float]:
        """Reference-signature compatibility shim
        (circuit_evaluation.py:62-87): "circuits" are genome individuals
        here; each is re-bound with the given parameter vector."""
        bound = [
            EVQEIndividual.change_parameter_values(ind, tuple(params))
            for ind, params in zip(circuits, parameter_values)
        ]
        return self.evaluate_individuals(bound)


def _pallas_requested(use_pallas: Optional[bool]) -> bool:
    """Resolve the fused-kernel opt-in: explicit argument wins, else the
    QUEASARS_USE_PALLAS env toggle.  Default off: on this platform a
    Pallas kernel costs minutes of (remote) compile per shape, which only
    amortizes for long production runs and benchmarks."""
    if use_pallas is not None:
        return use_pallas
    import os

    return os.environ.get("QUEASARS_USE_PALLAS", "0") == "1"


class StatevectorExpectationEvaluator(BaseCircuitEvaluator):
    """Exact expectation (optionally CVaR over the exact distribution).

    Mirrors OperatorCircuitEvaluator (reference: circuit_evaluation.py:
    164-219) including the estimator ``precision`` knob: the reference
    threads precision into ``estimator.run`` (:210-213), where Aer's
    EstimatorV2 realizes it as a SHOT-BASED estimate with
    ``ceil(precision**-2)`` measurement shots.  Round 4 matches that
    noise *law* exactly (it was a Gaussian of matching standard error
    before): precision > 0 routes the evaluation through the sampler
    machinery with that shot count, so energies are true multinomial
    shot means — discrete at low shot counts, seeded, deterministic,
    and bit-identical across mesh device counts like every sampler
    path.

    :param operator: the Hamiltonian (any PauliSum; CVaR requires diagonal)
    :param alpha: CVaR lower-tail mass in (0, 1]; 1 = plain expectation
    :param initial_state: optional start state prepended to every circuit
        (reference: circuit_evaluation.py:201-202); a statevector or an
        :class:`EVQEIndividual` whose circuit prepares the start state
    :param use_pallas: route diagonal evaluations through the fused VMEM
        kernel (TPU, 7 <= n <= 20, no initial state); None = env toggle
    :param precision: target standard error of each reported energy
        (0 = exact), realized as ``ceil(precision**-2)`` shots per
        evaluation — Aer EstimatorV2's precision-to-shots rule.  For a
        NON-diagonal operator the shots route through QWC measurement
        grouping with the default per-group allocation: each of the G
        groups gets the full ``ceil(precision**-2)`` budget, so the
        realized standard error is ``precision * sqrt(sum_g var_g) /
        sqrt(var_total)`` — it can exceed ``precision`` when G > 1
        (group variances add).  ``precision`` is exact as a per-group
        target; treat it as an overall scale, not a guarantee, for
        grouped operators (the reference's Aer estimator measures the
        operator in one pass and has no grouped analog to pin against)
    :param seed: RNG seed for the precision shot stream (successive
        evaluations fold in a counter; deterministic overall)
    """

    def __init__(
        self,
        operator: PauliSum,
        alpha: float = 1.0,
        initial_state: Optional[np.ndarray] = None,
        use_pallas: Optional[bool] = None,
        precision: float = 0.0,
        seed: int = 0,
    ):
        super().__init__(operator.n_qubits)
        if not 0 < alpha <= 1:
            raise ValueError("alpha (the CVaR tail fraction) lies outside (0, 1]")
        if precision < 0:
            raise ValueError("precision must be non-negative")
        self.operator = operator
        self.alpha = float(alpha)
        self.precision = float(precision)
        if self.precision > 0.0:
            # shot-based precision: ceil(p^-2) shots per evaluation through
            # the sampler machinery (counts-based on CPU, in-kernel sampler
            # under use_pallas) — the true multinomial noise law
            self._precision_sampler: Optional[SamplerExpectationEvaluator] = (
                SamplerExpectationEvaluator(
                    operator,
                    shots=int(np.ceil(self.precision ** -2.0)),
                    alpha=alpha,
                    seed=seed,
                    initial_state=initial_state,
                    use_pallas=use_pallas,
                )
            )
        else:
            self._precision_sampler = None
        self._initial = _prepare_initial_state(initial_state, operator.n_qubits)
        self._use_pallas = _pallas_requested(use_pallas)

        self._diagonal = operator.is_diagonal
        if self._diagonal:
            table = diagonal_energy_table(operator, dtype=np.float32)
            self._table = jnp.asarray(table)
            if self.alpha < 1.0:
                order = np.argsort(table, kind="stable").astype(np.int32)
                self._order = jnp.asarray(order)
                self._sorted = jnp.asarray(table[order])
        else:
            if self.alpha < 1.0:
                raise CircuitEvaluatorException("CVaR (alpha<1) requires a diagonal operator")
            if operator.n_qubits > 32:
                raise CircuitEvaluatorException("general operators limited to n<=32 qubits")
            self._coeffs_re = jnp.asarray(operator.coeffs.real.astype(np.float32))
            self._coeffs_im = jnp.asarray(operator.coeffs.imag.astype(np.float32))
            self._z = jnp.asarray(operator.z[:, 0].astype(np.uint32))
            self._x = jnp.asarray(operator.x[:, 0].astype(np.uint32))
            # small systems: dense Hermitian matvec on the MXU (fast and
            # cheap to compile); large systems: matrix-free term scan
            self._dense = operator.n_qubits <= 12
            if self._dense:
                dense = operator.to_dense_matrix()
                self._h_re = jnp.asarray(dense.real.astype(np.float32))
                self._h_im = jnp.asarray(dense.imag.astype(np.float32))

    @property
    def _counter(self) -> int:
        """Consumable-randomness state of the precision shot stream —
        exposed under the sampler evaluator's attribute name so
        checkpoint/resume (solver/checkpoint.py) round-trips it
        unchanged.  AttributeError when precision=0 (no stream)."""
        if self._precision_sampler is None:
            raise AttributeError("_counter")
        return self._precision_sampler._counter

    @_counter.setter
    def _counter(self, value: int) -> None:
        if self._precision_sampler is None:
            raise AttributeError("_counter")
        self._precision_sampler._counter = int(value)

    def _pallas_applicable(self, packed) -> bool:
        from queasars_tpu.sim.pallas_kernels import pallas_supported

        return (
            self._use_pallas
            and self._diagonal
            and self._initial is None
            and pallas_supported(packed.n_qubits, jax.default_backend())
        )

    def evaluate_packed(self, packed, angles=None):
        if self._precision_sampler is not None:
            return self._precision_sampler.evaluate_packed(packed, angles)
        a = packed.angles if angles is None else angles
        n = packed.n_qubits
        pop_args = (packed.gate_types, packed.controls, a, packed.layer_mask)
        if self._pallas_applicable(packed):
            from queasars_tpu.sim.pallas_kernels import (
                pallas_energies_exact,
                pallas_population_probs,
            )

            if self.alpha >= 1.0:
                out = self._run_batched(
                    lambda pa, ra: pallas_energies_exact(pa[0], pa[1], pa[2], pa[3], ra[0], n),
                    pop_args, (self._table,),
                )
            else:
                def cvar_pallas(pa, ra):
                    probs = pallas_population_probs(pa[0], pa[1], pa[2], pa[3], n)
                    return cvar_expectation_from_probs(probs, ra[0], ra[1], ra[2])

                out = self._run_batched(
                    cvar_pallas, pop_args,
                    (self._sorted, self._order, jnp.float32(self.alpha)),
                )
        elif self._diagonal and self.alpha >= 1.0:
            out = self._run_batched(
                lambda pa, ra: _energies_exact(pa[0], pa[1], pa[2], pa[3], ra[0], n, ra[1]),
                pop_args, (self._table, self._initial),
            )
        elif self._diagonal:
            out = self._run_batched(
                lambda pa, ra: _energies_cvar(pa[0], pa[1], pa[2], pa[3], ra[0], ra[1], ra[2], n, ra[3]),
                pop_args,
                (self._sorted, self._order, jnp.float32(self.alpha), self._initial),
            )
        elif self._dense and self.mesh is None:
            # dense MXU matvec: fastest for small n, but its tiny-K gemm is
            # not bit-stable across batch sizes — mesh runs use the term
            # scan instead so trajectories stay identical across device
            # counts
            out = self._run_batched(
                lambda pa, ra: _energies_dense(pa[0], pa[1], pa[2], pa[3], ra[0], ra[1], n, ra[2]),
                pop_args, (self._h_re, self._h_im, self._initial),
            )
        else:
            out = self._run_batched(
                lambda pa, ra: _energies_general(
                    pa[0], pa[1], pa[2], pa[3], ra[0], ra[1], ra[2], ra[3], n, ra[4]
                ),
                pop_args,
                (self._coeffs_re, self._coeffs_im, self._z, self._x, self._initial),
            )
        return out


class SamplerExpectationEvaluator(BaseCircuitEvaluator):
    """Shot-based expectation with CVaR over the empirical distribution.

    Mirrors OperatorSamplerCircuitEvaluator (reference:
    circuit_evaluation.py:94-161) and lifts its diagonal-only restriction
    (evolving_ansatz_minimum_eigensolver.py:240-244): general Pauli sums
    are measured the way hardware would — partitioned into qubit-wise
    commuting groups (paulis/grouping.py), each rotated into its product
    basis and sampled with its own ``shots`` budget.  CVaR (alpha < 1)
    still requires a diagonal operator: grouped measurements of different
    bases do not form one empirical energy distribution to take a tail of.

    :param shots: measurement shots per evaluation (per group, when the
        operator is non-diagonal and ``shot_allocation="per_group"``)
    :param seed: base RNG seed; successive evaluations fold in a counter
        so repeated calls draw fresh shots (deterministic overall)
    :param shot_allocation: how a non-diagonal operator's measurement
        groups share the budget — ``"per_group"`` (default) gives every
        group the full ``shots``; ``"proportional"`` treats ``shots`` as
        the TOTAL budget and splits it across groups proportionally to
        their coefficient L1 norms (the variance-optimal rule for the
        groups' shot-noise bounds, ``grouped_sampling.allocate_shots``).
        Ignored for diagonal operators (one implicit group)
    """

    def __init__(
        self,
        operator: PauliSum,
        shots: int,
        alpha: float = 1.0,
        seed: int = 0,
        initial_state: Optional[np.ndarray] = None,
        use_pallas: Optional[bool] = None,
        shot_allocation: str = "per_group",
    ):
        super().__init__(operator.n_qubits)
        self._use_pallas = _pallas_requested(use_pallas)
        if not 0 < alpha <= 1:
            raise ValueError("alpha (the CVaR tail fraction) lies outside (0, 1]")
        if shots < 1:
            raise ValueError("shots must be at least 1")
        if shot_allocation not in ("per_group", "proportional"):
            raise ValueError("shot_allocation must be 'per_group' or 'proportional'")
        self.operator = operator
        self.shots = int(shots)
        self.alpha = float(alpha)
        self.shot_allocation = shot_allocation
        self._group_shots: Optional[tuple] = None
        self._initial = _prepare_initial_state(initial_state, operator.n_qubits)
        self._diagonal = operator.is_diagonal
        if self._diagonal:
            self._grouped = None
            table = diagonal_energy_table(operator, dtype=np.float32)
            self._table = jnp.asarray(table)
            order = np.argsort(table, kind="stable").astype(np.int32)
            self._order = jnp.asarray(order)
            self._sorted = jnp.asarray(table[order])
        else:
            if self.alpha < 1.0:
                raise CircuitEvaluatorException(
                    "CVaR (alpha<1) over the sampler path requires a diagonal "
                    "operator: the qubit-wise-commuting groups of a general "
                    "Pauli sum are measured in different bases, so their shots "
                    "do not form one energy distribution to take a tail of"
                )
            from queasars_tpu.sim.grouped_sampling import (
                allocate_shots,
                grouped_operands,
                grouped_weights,
            )

            self._grouped = grouped_operands(operator)
            if shot_allocation == "proportional":
                self._group_shots = allocate_shots(grouped_weights(operator), self.shots)
        self._key = jax.random.PRNGKey(seed)
        self._counter = 0

    def _next_keys(self, pop: int) -> np.ndarray:
        """Per-individual PRNG keys [pop, 2] for one evaluation round."""
        self._counter += 1
        base = jax.random.fold_in(self._key, self._counter)
        return np.asarray(jax.random.split(base, pop))

    def evaluate_packed(self, packed, angles=None):
        from queasars_tpu.sim.pallas_kernels import pallas_supported

        a = packed.angles if angles is None else angles
        n, shots = packed.n_qubits, self.shots
        keys = self._next_keys(packed.n_individuals)
        if self._grouped is not None:
            from queasars_tpu.sim.grouped_sampling import (
                grouped_shot_energies,
                grouped_shot_energies_pallas,
            )

            group_shots = self._group_shots if self._group_shots is not None else shots
            # fused in-kernel grouped sampling (one-launch multi-group
            # kernel under the fold, else one launch per rotated circuit)
            # — the kernels' speedup dominates the G-fold re-simulation
            # for structured operators (docs/performance.md).  The slot
            # kernels cap at n=20; the folded route reaches the in-VMEM
            # sampler's n=21 cap.
            from queasars_tpu.optim.objective import mxu_fold_enabled

            grouped_cap = (
                21 if mxu_fold_enabled(None, n, path="sampler") else 20
            )
            if (
                self._use_pallas
                and self._initial is None
                and 14 <= n <= grouped_cap
                and (
                    pallas_supported(n, jax.default_backend())
                    or grouped_cap == 21
                )
            ):
                return self._run_batched(
                    lambda pa, ra: grouped_shot_energies_pallas(
                        pa[0], pa[1], pa[2], pa[3], pa[4], ra[0], ra[1], ra[2], ra[3],
                        n_qubits=n, shots=group_shots,
                    ),
                    (packed.gate_types, packed.controls, a, packed.layer_mask, keys),
                    self._grouped,
                )
            return self._run_batched(
                lambda pa, ra: grouped_shot_energies(
                    pa[0], pa[1], pa[2], pa[3], pa[4], ra[0], ra[1], ra[2], ra[3],
                    n_qubits=n, shots=group_shots, initial_state=ra[4],
                ),
                (packed.gate_types, packed.controls, a, packed.layer_mask, keys),
                (*self._grouped, self._initial),
            )
        from queasars_tpu.optim.objective import mxu_fold_enabled

        # the fused route: slot kernels to n=20, the folded in-VMEM
        # sampler to n=22 — the same dispatch the batched optimizers use
        # (population_energies), so direct evaluations and in-scan
        # objectives share one code path and one shot stream
        use_pallas = (
            self._use_pallas
            and self._initial is None
            and (
                pallas_supported(packed.n_qubits, jax.default_backend())
                or mxu_fold_enabled(None, packed.n_qubits, path="sampler")
            )
        )
        return self._run_batched(
            lambda pa, ra: _sampled_diag_energies(
                pa[0], pa[1], pa[2], pa[3], pa[4], ra[0], ra[1], ra[2], ra[3],
                ra[4], n_qubits=n, shots=shots,
                use_cvar=self.alpha < 1.0, use_pallas=use_pallas,
            ),
            (packed.gate_types, packed.controls, a, packed.layer_mask, keys),
            (
                self._table, self._sorted, self._order,
                jnp.float32(self.alpha), self._initial,
            ),
        )


class BitstringFunctionEvaluator(BaseCircuitEvaluator):
    """Black-box bitstring objective over sampled measurements.

    Mirrors BitstringCircuitEvaluator (reference: circuit_evaluation.py:
    222-291): sample shots on device, evaluate the (host Python) objective
    on each observed bitstring, CVaR-accumulate exactly like the
    reference's ``get_expectation_with_bitstring_evaluator``
    (expectation_calculation.py:72-103).
    """

    def __init__(
        self,
        bitstring_evaluator: BitstringEvaluator,
        shots: int,
        alpha: float = 1.0,
        seed: int = 0,
        initial_state: Optional[np.ndarray] = None,
    ):
        super().__init__(bitstring_evaluator.input_length)
        if not 0 < alpha <= 1:
            raise ValueError("alpha (the CVaR tail fraction) lies outside (0, 1]")
        if shots < 1:
            raise ValueError("shots must be at least 1")
        self.bitstring_evaluator = bitstring_evaluator
        self.shots = int(shots)
        self.alpha = float(alpha)
        self._initial = _prepare_initial_state(initial_state, self.n_qubits)
        self._key = jax.random.PRNGKey(seed)
        self._counter = 0
        self._value_cache: dict[int, float] = {}

    def _next_keys(self, pop: int) -> np.ndarray:
        self._counter += 1
        base = jax.random.fold_in(self._key, self._counter)
        return np.asarray(jax.random.split(base, pop))

    def _state_value(self, state: int) -> float:
        if state not in self._value_cache:
            bitstring = format(state, f"0{self.n_qubits}b")
            self._value_cache[state] = self.bitstring_evaluator.evaluate_bitstring(bitstring)
        return self._value_cache[state]

    def evaluate_packed(self, packed, angles=None):
        a = packed.angles if angles is None else angles
        n, shots = packed.n_qubits, self.shots
        keys = self._next_keys(packed.n_individuals)
        emp = self._run_batched(
            lambda pa, ra: _sampled_probs(pa[0], pa[1], pa[2], pa[3], pa[4], n, shots, ra[0]),
            (packed.gate_types, packed.controls, a, packed.layer_mask, keys),
            (self._initial,),
        )
        # vectorized host objective: the (Python) callable runs once per
        # unique observed state across the whole batch (memoized across
        # calls), everything else is numpy batch arithmetic
        observed = np.nonzero(emp.any(axis=0))[0]
        values = np.array([self._state_value(int(s)) for s in observed], dtype=np.float64)
        probs = emp[:, observed].astype(np.float64)
        if self.alpha >= 1.0:
            return probs @ values
        # CVaR tail accumulation over states sorted ascending by value —
        # the vectorized equivalent of the reference's sequential loop
        # (expectation_calculation.py:14-32)
        order = np.argsort(values, kind="stable")
        v_sorted = values[order]
        p_sorted = probs[:, order]
        cum_prev = np.cumsum(p_sorted, axis=1) - p_sorted
        weights = np.clip(self.alpha - cum_prev, 0.0, p_sorted)
        return (weights * v_sorted).sum(axis=1) / self.alpha


EvaluatorLike = Union[
    StatevectorExpectationEvaluator, SamplerExpectationEvaluator, BitstringFunctionEvaluator
]
