"""Generation-loop solver driver.

Behavioral port of queasars/minimum_eigensolvers/base/
evolving_ansatz_minimum_eigensolver.py:53-478: operator pipeline with
budget-aware early stop, result/evaluation-count callbacks as the
generation boundary, termination criteria, and final result assembly —
plus an ``initial_population`` resume hook the reference lacks (its JSON
codecs can persist a population but nothing can restart from one,
SURVEY.md §5).

The reference's primitive wrapping (mutex/batching/transpiling,
:139-173) has no equivalent: evaluation is one SPMD program.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Callable, Optional, Union

import numpy as np
from numpy import mean, median

import jax

from queasars_tpu.evolve.base import (
    BaseEvolutionaryOperator,
    BasePopulationEvaluationResult,
    OperatorContext,
    PopulationEnergyCache,
)
from queasars_tpu.genome.individual import EVQEIndividual
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.genome.population import EVQEPopulation
from queasars_tpu.paulis import PauliSum
from queasars_tpu.sim.evaluators import (
    BaseCircuitEvaluator,
    CircuitEvaluatorException,
    BitstringFunctionEvaluator,
    SamplerExpectationEvaluator,
    StatevectorExpectationEvaluator,
)
from queasars_tpu.sim.sampling import quasi_distribution, sample_counts
from queasars_tpu.sim.statevector import probabilities
from queasars_tpu.solver.configured_evaluators import ConfiguredEstimator, ConfiguredSampler
from queasars_tpu.solver.result import EvolvingAnsatzMinimumEigensolverResult
from queasars_tpu.solver.termination_criteria import (
    EvolvingAnsatzMinimumEigensolverBaseTerminationCriterion,
)
from queasars_tpu.utils.bitstring_evaluation import BitstringEvaluator

ListOrDict = Union[list, dict, None]


@dataclass
class EvolvingAnsatzMinimumEigensolverConfiguration:
    """Driver configuration
    (reference: evolving_ansatz_minimum_eigensolver.py:53-119).

    :param population_initializer: problem-size (qubits) -> initial population
    :param evolutionary_operators: the per-generation operator pipeline
    :param configured_sampler: shot settings for sampler-path evaluation and
        final eigenstate measurement; None = exact distributions
    :param configured_estimator: exact-expectation settings; when given the
        estimator path is used for fitness evaluation (reference behavior:
        estimator preferred when present, :253-257)
    :param max_generations / max_circuit_evaluations / termination_criterion:
        at least one must be set (validated, :114-119)
    :param distribution_alpha_tail: CVaR alpha for the sampler path
    :param initial_population: optional resume population (new capability)
    :param use_pallas: route diagonal evaluation through the fused VMEM
        kernel (TPU only; None = QUEASARS_USE_PALLAS env toggle)
    :param checkpoint_path: when set, the FULL solver state (population,
        operator RNG states, generation counter, evaluation ledger,
        trajectory, best-so-far, evaluator randomness) is written there as
        JSON after every completed generation pass; crashed/preempted
        solves restart bit-identically via
        ``resume_from_checkpoint=path`` (completes the reference's
        serialize-only persistence story, SURVEY.md §5)
    :param resume_from_checkpoint: path of a checkpoint written through
        ``checkpoint_path`` — the solve continues exactly where it left
        off, reproducing the uninterrupted run's remaining trajectory
    :param mesh: a ``jax.sharding.Mesh`` to shard the population axis over
        — every evaluation/optimization step then runs SPMD across the
        mesh's devices (the reference's dask-executor seam,
        base/evolutionary_algorithm.py:110-118, selection.py:75-84)
    :param n_devices: convenience alternative to ``mesh``: build a 1-D
        population mesh over the first ``n_devices`` local devices
    """

    population_initializer: Callable[[int], EVQEPopulation]
    evolutionary_operators: list[BaseEvolutionaryOperator]
    configured_sampler: Optional[ConfiguredSampler]
    configured_estimator: Optional[ConfiguredEstimator]
    max_generations: Optional[int]
    max_circuit_evaluations: Optional[int]
    termination_criterion: Optional[EvolvingAnsatzMinimumEigensolverBaseTerminationCriterion]
    #: pluggable external evaluation backend (the reference's L1 seam,
    #: circuit_evaluation.py:62-87 / configured_primitives.py:9-22): a
    #: ready BaseCircuitEvaluator instance, or a factory callable
    #: ``operator -> BaseCircuitEvaluator`` (required when aux operators
    #: should also be measured externally).  When set, ALL fitness
    #: evaluations go through it — wrap a plain
    #: ``evaluate_circuits(circuits, params) -> energies`` callable in
    #: sim/external.py::CallbackCircuitEvaluator to drive the solve from
    #: an external simulator or real QPU.  The optimizers fall back to
    #: host-stepped probing (the reference's own evaluation shape).
    #: configured_sampler/configured_estimator then become optional; a
    #: configured_sampler still controls final eigenstate measurement.
    evaluator: Optional[object] = None
    distribution_alpha_tail: float = 1.0
    initial_population: Optional[EVQEPopulation] = field(default=None)
    use_pallas: Optional[bool] = None
    pack_min_layers: Optional[int] = None
    checkpoint_path: Optional[str] = None
    resume_from_checkpoint: Optional[str] = None
    mesh: Optional[object] = None
    n_devices: Optional[int] = None
    #: flat-parameter ordering for packing and optimizer traversal:
    #: "canonical" (qubits ascending, theta/phi/lambda) or "qiskit"
    #: (alphabetical parameter-name order, matching the reference's
    #: implicit binding order — see genome/parameter_order.py)
    parameter_order: str = "canonical"
    #: let selection reuse the exact final energies the preceding
    #: parameter search already computed for these genomes (saves one
    #: device dispatch + one batched evaluation per generation; values
    #: may differ from a fresh evaluation at the float-rounding level).
    #: None = on exactly when the fused Pallas path is active (production
    #: TPU runs); True/False forces it for any engine.
    reuse_selection_energies: Optional[bool] = None
    #: amplitude sharding: factor the mesh as (pop, amp) — the population
    #: axis keeps sharding individuals while each statevector splits over
    #: the amp axis (SURVEY.md §2.3 P4 — the scale axis the reference
    #: lacks, composed with the one it has).  None = automatic (on when a
    #: mesh is configured and the operator exceeds 20 qubits), True/False
    #: = force.  Works on the estimator path (any operator; exact) and
    #: the sampler path (diagonal operators; distributed shot sampling),
    #: with or without an initial state.
    shard_amplitudes: Optional[bool] = None
    #: devices on the amplitude axis of the (pop, amp) factorization
    #: (must divide the mesh size; the rest shard the population).
    #: None = smallest power of two keeping each shard's local qubit
    #: count at most ``amp_local_qubits``
    amp_devices: Optional[int] = None
    #: auto-factorization target: grow the amp axis until each device
    #: holds at most 2^this amplitudes per state
    amp_local_qubits: int = 20

    def __post_init__(self):
        if (
            self.max_generations is None
            and self.max_circuit_evaluations is None
            and self.termination_criterion is None
        ):
            raise ValueError(
                "no stopping condition configured: set max_generations, "
                "max_circuit_evaluations and/or a termination_criterion"
            )
        if (
            self.configured_sampler is None
            and self.configured_estimator is None
            and self.evaluator is None
        ):
            raise ValueError(
                "provide a configured_sampler and/or a configured_estimator "
                "(or inject an external evaluator)"
            )


class EvolvingAnsatzMinimumEigensolver:
    """Minimum eigensolver evolving the ansatz architecture alongside its
    rotation angles (reference: evolving_ansatz_minimum_eigensolver.py:
    122-478)."""

    def __init__(self, configuration: EvolvingAnsatzMinimumEigensolverConfiguration):
        self.configuration = configuration
        self.logger = logging.getLogger(__name__)

    def _resolve_mesh(self):
        """The population mesh to run on (None = default device)."""
        if self.configuration.mesh is not None:
            return self.configuration.mesh
        if self.configuration.n_devices is not None:
            from queasars_tpu.parallel.mesh import population_mesh

            return population_mesh(self.configuration.n_devices)
        return None

    # ------------------------------------------------------------------
    # entry points (reference: :177-329)
    # ------------------------------------------------------------------

    def compute_minimum_eigenvalue(
        self,
        operator: PauliSum,
        aux_operators: ListOrDict = None,
    ) -> EvolvingAnsatzMinimumEigensolverResult:
        """Find the minimum eigenvalue of ``operator``
        (reference: :177-199)."""
        return self.compute_minimum_eigenvalue_with_initial_state(
            operator=operator, aux_operators=aux_operators, initial_state=None
        )

    def compute_minimum_eigenvalue_with_initial_state(
        self,
        operator: PauliSum,
        aux_operators: ListOrDict = None,
        initial_state: Union[np.ndarray, EVQEIndividual, None] = None,
    ) -> EvolvingAnsatzMinimumEigensolverResult:
        """Like :meth:`compute_minimum_eigenvalue`, starting every circuit
        from ``initial_state`` (reference: :201-276) — either a prepared
        statevector ([2^n] complex or [2, 2^n] re/im planes) or an
        :class:`EVQEIndividual` whose circuit prepares the state (the
        reference's initial-state-circuit prepend, simulated once)."""

        if self.configuration.evaluator is not None:
            return self._solve_with_injected_evaluator(
                operator, aux_operators, initial_state
            )

        mesh = self._resolve_mesh()

        def amplitude_sharding_applies(op: PauliSum) -> bool:
            requested = self.configuration.shard_amplitudes
            if requested is False or mesh is None:
                return False
            if requested is None:
                return op.n_qubits > 20
            return True

        def resolve_amp_devices(op: PauliSum) -> Optional[int]:
            """The (pop, amp) factorization: explicit knob, or the
            smallest power-of-two amp axis keeping each shard at
            <= 2^amp_local_qubits amplitudes — the population keeps the
            remaining devices (the reference's scaling axis survives at
            large n)."""
            if self.configuration.amp_devices is not None:
                return self.configuration.amp_devices
            total = int(np.prod(np.shape(mesh.devices)))
            amp = 1
            while amp < total and op.n_qubits - (amp.bit_length() - 1) > self.configuration.amp_local_qubits:
                amp *= 2
            return amp

        def build_evaluator(op: PauliSum) -> BaseCircuitEvaluator:
            if amplitude_sharding_applies(op):
                from queasars_tpu.sim.sharded_evaluator import (
                    AmplitudeShardedExpectationEvaluator,
                )

                estimator = self.configuration.configured_estimator
                if estimator is not None:
                    return AmplitudeShardedExpectationEvaluator(
                        operator=op,
                        mesh=mesh,
                        precision=estimator.precision or 0.0,
                        seed=estimator.seed,
                        initial_state=initial_state,
                        amp_devices=resolve_amp_devices(op),
                    )
                sampler = self.configuration.configured_sampler
                return AmplitudeShardedExpectationEvaluator(
                    operator=op,
                    mesh=mesh,
                    shots=sampler.shots,
                    alpha=self.configuration.distribution_alpha_tail,
                    seed=sampler.seed,
                    initial_state=initial_state,
                    amp_devices=resolve_amp_devices(op),
                    shot_allocation=sampler.shot_allocation,
                )
            if self.configuration.configured_estimator is not None:
                evaluator = StatevectorExpectationEvaluator(
                    operator=op,
                    alpha=1.0,
                    initial_state=initial_state,
                    use_pallas=self.configuration.use_pallas,
                    precision=self.configuration.configured_estimator.precision or 0.0,
                    seed=self.configuration.configured_estimator.seed,
                )
            else:
                assert self.configuration.configured_sampler is not None
                evaluator = SamplerExpectationEvaluator(
                    operator=op,
                    shots=self.configuration.configured_sampler.shots,
                    alpha=self.configuration.distribution_alpha_tail,
                    seed=self.configuration.configured_sampler.seed,
                    initial_state=initial_state,
                    use_pallas=self.configuration.use_pallas,
                    shot_allocation=self.configuration.configured_sampler.shot_allocation,
                )
            if mesh is not None:
                evaluator.set_mesh(mesh)
            return evaluator

        evaluator = build_evaluator(operator)
        aux_evaluators: ListOrDict = None
        if isinstance(aux_operators, list):
            aux_evaluators = [build_evaluator(op) for op in aux_operators]
        elif isinstance(aux_operators, dict):
            aux_evaluators = {key: build_evaluator(op) for key, op in aux_operators.items()}

        from queasars_tpu.genome.parameter_order import parameter_order

        with parameter_order(self.configuration.parameter_order):
            return self._solve_by_evolution(evaluator, aux_evaluators, initial_state)

    def _solve_with_injected_evaluator(
        self,
        operator: PauliSum,
        aux_operators: ListOrDict,
        initial_state,
    ) -> EvolvingAnsatzMinimumEigensolverResult:
        """Evolution driven by the configuration's injected external
        evaluator (the reference's pluggable-primitive capability:
        evolving_ansatz_minimum_eigensolver.py:227-251 builds its
        evaluators from whatever BaseEstimatorV2/BaseSamplerV2 the user
        configured — including real hardware)."""
        from queasars_tpu.genome.parameter_order import parameter_order
        from queasars_tpu.sim.external import resolve_injected_evaluator

        if initial_state is not None:
            raise CircuitEvaluatorException(
                "initial_state cannot be combined with an injected external "
                "evaluator: the external backend owns state preparation — "
                "prepend the initial-state circuit inside your backend, or "
                "use the internal engines"
            )
        injected = self.configuration.evaluator
        evaluator = resolve_injected_evaluator(injected, operator, role="operator")
        aux_evaluators: ListOrDict = None
        if aux_operators is not None:
            from queasars_tpu.sim.evaluators import BaseCircuitEvaluator as _Base

            if isinstance(injected, _Base) and (
                self.configuration.configured_estimator is None
                and self.configuration.configured_sampler is None
            ):
                raise CircuitEvaluatorException(
                    "aux_operators with an injected evaluator INSTANCE need "
                    "either a factory callable (operator -> evaluator) as the "
                    "evaluator, or a configured_estimator/configured_sampler "
                    "for the aux evaluations"
                )

            def build_aux(op: PauliSum):
                if not isinstance(injected, _Base):
                    return resolve_injected_evaluator(injected, op, role="aux operator")
                if self.configuration.configured_estimator is not None:
                    return StatevectorExpectationEvaluator(
                        operator=op,
                        precision=self.configuration.configured_estimator.precision or 0.0,
                        seed=self.configuration.configured_estimator.seed,
                    )
                return SamplerExpectationEvaluator(
                    operator=op,
                    shots=self.configuration.configured_sampler.shots,
                    alpha=self.configuration.distribution_alpha_tail,
                    seed=self.configuration.configured_sampler.seed,
                )

            if isinstance(aux_operators, list):
                aux_evaluators = [build_aux(op) for op in aux_operators]
            else:
                aux_evaluators = {k: build_aux(op) for k, op in aux_operators.items()}

        with parameter_order(self.configuration.parameter_order):
            return self._solve_by_evolution(evaluator, aux_evaluators, None)

    def compute_minimum_function_value(
        self,
        operator: BitstringEvaluator,
        aux_operators: ListOrDict = None,
        initial_state: Union[np.ndarray, EVQEIndividual, None] = None,
    ) -> EvolvingAnsatzMinimumEigensolverResult:
        """Minimize a black-box bitstring objective (reference: :278-329)."""
        if self.configuration.configured_sampler is None:
            raise ValueError("compute_minimum_function_value requires a configured_sampler!")

        mesh = self._resolve_mesh()

        def build_evaluator(op: BitstringEvaluator) -> BaseCircuitEvaluator:
            evaluator = BitstringFunctionEvaluator(
                bitstring_evaluator=op,
                shots=self.configuration.configured_sampler.shots,
                alpha=self.configuration.distribution_alpha_tail,
                seed=self.configuration.configured_sampler.seed,
                initial_state=initial_state,
            )
            if mesh is not None:
                evaluator.set_mesh(mesh)
            return evaluator

        evaluator = build_evaluator(operator)
        aux_evaluators: ListOrDict = None
        if isinstance(aux_operators, list):
            aux_evaluators = [build_evaluator(op) for op in aux_operators]
        elif isinstance(aux_operators, dict):
            aux_evaluators = {key: build_evaluator(op) for key, op in aux_operators.items()}

        from queasars_tpu.genome.parameter_order import parameter_order

        with parameter_order(self.configuration.parameter_order):
            return self._solve_by_evolution(evaluator, aux_evaluators, initial_state)

    # ------------------------------------------------------------------
    # the generation loop (reference: :331-478)
    # ------------------------------------------------------------------

    def _solve_by_evolution(
        self,
        circuit_evaluator: BaseCircuitEvaluator,
        aux_circuit_evaluators: ListOrDict,
        initial_state: Optional[np.ndarray],
    ) -> EvolvingAnsatzMinimumEigensolverResult:
        n_circuit_evaluations: list[int] = []
        n_generations = 0
        terminate = False
        current_best_individual: Optional[EVQEIndividual] = None
        current_best_expectation_value: Optional[float] = None
        population_evaluations: list[BasePopulationEvaluationResult] = []
        if self.configuration.termination_criterion is not None:
            self.configuration.termination_criterion.reset_state()

        resume_state = None
        if self.configuration.resume_from_checkpoint is not None:
            from queasars_tpu.solver.checkpoint import (
                load_checkpoint,
                restore_evaluator_state,
                restore_operator_rng_states,
            )

            resume_state = load_checkpoint(self.configuration.resume_from_checkpoint)
            n_circuit_evaluations = list(resume_state.n_circuit_evaluations)
            n_generations = resume_state.n_generations
            population_evaluations = list(resume_state.population_evaluations)
            current_best_individual = resume_state.best_individual
            current_best_expectation_value = resume_state.best_expectation_value
            if resume_state.operator_rngs:
                restore_operator_rng_states(
                    self.configuration.evolutionary_operators, resume_state.operator_rngs
                )
            restore_evaluator_state(circuit_evaluator, resume_state.evaluator)
            # replay the termination criterion over the restored trajectory
            # so its internal windows match the uninterrupted run
            if self.configuration.termination_criterion is not None:
                replay_best_individual: Optional[EVQEIndividual] = None
                replay_best_value: Optional[float] = None
                for evaluation in population_evaluations:
                    if (
                        replay_best_value is None
                        or evaluation.best_expectation_value < replay_best_value
                    ):
                        replay_best_individual = evaluation.best_individual
                        replay_best_value = evaluation.best_expectation_value
                    terminate = self.configuration.termination_criterion.check_termination(
                        population_evaluation=evaluation,
                        best_individual=replay_best_individual,
                        best_expectation_value=replay_best_value,
                    )

        def result_callback(evaluation_result: BasePopulationEvaluationResult) -> None:
            nonlocal current_best_individual, current_best_expectation_value
            nonlocal terminate, n_generations

            population_evaluations.append(evaluation_result)
            if (
                current_best_expectation_value is None
                or evaluation_result.best_expectation_value < current_best_expectation_value
            ):
                current_best_individual = evaluation_result.best_individual
                current_best_expectation_value = evaluation_result.best_expectation_value

            self.logger.info("Results for generation: %d", n_generations)
            self.logger.info(
                "generation best expectation value: %f", evaluation_result.best_expectation_value
            )
            filtered = [v for v in evaluation_result.expectation_values if v is not None]
            self.logger.info("generation median expectation value: %f", median(filtered))
            self.logger.info("generation mean expectation value: %f", mean(filtered))

            n_generations += 1

            if self.configuration.termination_criterion is not None:
                terminate = self.configuration.termination_criterion.check_termination(
                    population_evaluation=evaluation_result,
                    best_individual=current_best_individual,
                    best_expectation_value=current_best_expectation_value,
                )

        def circuit_evaluation_callback(evaluations: int) -> None:
            if len(n_circuit_evaluations) < n_generations + 1:
                n_circuit_evaluations.append(evaluations)
            else:
                n_circuit_evaluations[n_generations] += evaluations

        reuse_energies = self.configuration.reuse_selection_energies
        if reuse_energies is None:
            from queasars_tpu.sim.evaluators import _pallas_requested

            # default on for the production paths: the fused Pallas
            # kernel, and amplitude-sharded evaluation (every dispatch
            # there is a full mesh program)
            reuse_energies = _pallas_requested(self.configuration.use_pallas) or (
                getattr(circuit_evaluator, "nft_minimize", None) is not None
            )
        operator_context = OperatorContext(
            circuit_evaluator=circuit_evaluator,
            result_callback=result_callback,
            circuit_evaluation_count_callback=circuit_evaluation_callback,
            pack_min_layers=self.configuration.pack_min_layers,
            energy_cache=PopulationEnergyCache() if reuse_energies else None,
        )

        if resume_state is not None:
            population = resume_state.population
        elif self.configuration.initial_population is not None:
            population = self.configuration.initial_population
        else:
            population = self.configuration.population_initializer(circuit_evaluator.n_qubits)

        self.logger.info("Starting evolution!")

        while not terminate:
            for operator in self.configuration.evolutionary_operators:
                # budget checks before each operator (reference: :405-428)
                if (
                    self.configuration.max_circuit_evaluations is not None
                    and sum(n_circuit_evaluations) >= self.configuration.max_circuit_evaluations
                ):
                    terminate = True
                estimated = operator.get_n_expected_circuit_evaluations(
                    population=population, operator_context=operator_context
                )
                if (
                    self.configuration.max_circuit_evaluations is not None
                    and estimated is not None
                    and sum(n_circuit_evaluations) + estimated
                    >= self.configuration.max_circuit_evaluations
                ):
                    terminate = True
                if (
                    self.configuration.max_generations is not None
                    and n_generations >= self.configuration.max_generations
                ):
                    terminate = True
                if terminate:
                    break
                population = operator.apply_operator(
                    population=population, operator_context=operator_context
                )
            else:
                # one full pipeline pass completed — persist the entire
                # solver state so a crash resumes the exact trajectory
                if self.configuration.checkpoint_path is not None:
                    from queasars_tpu.solver.checkpoint import write_checkpoint

                    write_checkpoint(
                        self.configuration.checkpoint_path,
                        population=population,
                        n_generations=n_generations,
                        n_circuit_evaluations=n_circuit_evaluations,
                        population_evaluations=population_evaluations,
                        best_individual=current_best_individual,
                        best_expectation_value=current_best_expectation_value,
                        operators=self.configuration.evolutionary_operators,
                        evaluator=circuit_evaluator,
                    )

        if current_best_individual is None or len(population_evaluations) == 0:
            raise RuntimeError(
                "the solve terminated before any population evaluation completed "
                "(budget too small for even one selection step?)"
            )

        result = EvolvingAnsatzMinimumEigensolverResult()
        result.eigenvalue = current_best_expectation_value
        result.eigenstate = self._measure_eigenstate(current_best_individual, initial_state)
        result.best_individual = current_best_individual
        result.circuit_evaluations = n_circuit_evaluations
        result.generations = n_generations
        result.population_evaluation_results = population_evaluations
        result.initial_state = initial_state

        if isinstance(aux_circuit_evaluators, list):
            result.aux_operators_evaluated = [
                evaluator.evaluate_individuals([current_best_individual])[0]
                for evaluator in aux_circuit_evaluators
            ]
        elif isinstance(aux_circuit_evaluators, dict):
            result.aux_operators_evaluated = {
                name: evaluator.evaluate_individuals([current_best_individual])[0]
                for name, evaluator in aux_circuit_evaluators.items()
            }

        return result

    def _measure_eigenstate(
        self, individual: EVQEIndividual, initial_state
    ) -> dict[int, float]:
        """Measurement distribution of the best circuit (reference samples
        the best circuit with the configured sampler, :449-454); exact
        probabilities when no sampler is configured."""
        from queasars_tpu.sim.evaluators import _prepare_initial_state

        packed = PackedPopulation.pack([individual])
        probs = probabilities(
            packed.gate_types,
            packed.controls,
            packed.angles,
            packed.layer_mask,
            packed.n_qubits,
            _prepare_initial_state(initial_state, packed.n_qubits),
        )[0]
        sampler = self.configuration.configured_sampler
        if sampler is not None:
            key = jax.random.fold_in(jax.random.PRNGKey(sampler.seed), 0x5EED)
            counts = sample_counts(key, probs, sampler.shots)
            return quasi_distribution(np.asarray(counts, dtype=np.float64) / sampler.shots)
        return quasi_distribution(np.asarray(probs))
