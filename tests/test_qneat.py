"""QNEAT solver tests: genome genetics, lowering fidelity, operator
behavior, and the end-to-end solve.

Mirrors the test tiers used for EVQE (seeded property tests + directional
operator assertions + exact-optimum E2E).  QNEAT is an algorithm the
reference names as future work with no code (reference README.md:3), so
there is no reference oracle; the pinned invariants are NEAT's
(innovation alignment, compatibility speciation, elitism) plus engine
consistency through the gene-list -> layered-tensor lowering.
"""

from __future__ import annotations

from random import Random

import numpy as np
import pytest

from queasars_tpu.evolve.base import OperatorContext
from queasars_tpu.evolve.qneat import (
    QNEATAddGate,
    QNEATAngleMutation,
    QNEATSpeciationSelection,
)
from queasars_tpu.genome.qneat import QNEATGene, QNEATIndividual, QNEATPopulation
from queasars_tpu.paulis import PauliSum, diagonal_energy_table, pauli_z_string
from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator
from queasars_tpu.sim.statevector import probabilities


def _operator(n_qubits: int = 4, seed: int = 3) -> PauliSum:
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(5):
        z = int(rng.integers(1, 1 << n_qubits))
        label = "".join("Z" if (z >> q) & 1 else "I" for q in range(n_qubits))[::-1]
        parts.append(PauliSum.from_label(label, float(rng.normal())))
    return PauliSum.sum(parts)


def _random_genome(n_qubits: int, n_extra: int, seed: int) -> QNEATIndividual:
    rng = Random(seed)
    individual = QNEATIndividual.minimal(n_qubits, True, rng)
    innovation = n_qubits
    for _ in range(n_extra):
        if rng.random() < 0.5 and n_qubits >= 2:
            target, control = rng.sample(range(n_qubits), 2)
        else:
            target, control = rng.randrange(n_qubits), -1
        individual = individual.with_gene(
            QNEATGene(innovation=innovation, target=target, control=control),
            [rng.uniform(0, 6.28) for _ in range(3)],
        )
        innovation += 1
    return individual


# ---------------------------------------------------------------------------
# genome genetics
# ---------------------------------------------------------------------------


def test_minimal_genomes_share_innovations():
    pop = QNEATPopulation.initial(4, 6, True, random_seed=0)
    assert pop.next_innovation == 4
    for individual in pop.individuals:
        assert [g.innovation for g in individual.genes] == [0, 1, 2, 3]


def test_genome_validation():
    with pytest.raises(ValueError):
        QNEATIndividual(2, (QNEATGene(0, 0),), (0.0,))  # wrong angle count
    with pytest.raises(ValueError):
        QNEATIndividual(2, (QNEATGene(1, 0), QNEATGene(0, 1)), (0.0,) * 6)  # unordered
    with pytest.raises(ValueError):
        QNEATIndividual(2, (QNEATGene(0, 1, 1),), (0.0,) * 3)  # control == target


def test_compatibility_distance_properties():
    a = _random_genome(4, 5, seed=1)
    assert a.compatibility_distance(a, 1.0, 1.0, 0.4) == 0.0
    b = _random_genome(4, 5, seed=2)
    d_ab = a.compatibility_distance(b, 1.0, 1.0, 0.4)
    d_ba = b.compatibility_distance(a, 1.0, 1.0, 0.4)
    assert d_ab == pytest.approx(d_ba)
    assert d_ab > 0
    # adding a gene strictly increases distance to the original
    grown = a.with_gene(QNEATGene(innovation=99, target=0), (0.1, 0.2, 0.3))
    assert a.compatibility_distance(grown, 1.0, 1.0, 0.0) > 0


def test_crossover_alignment():
    rng = Random(0)
    base = _random_genome(4, 3, seed=5)
    fitter = base.with_gene(QNEATGene(innovation=50, target=1), (0.1, 0.2, 0.3))
    weaker = base.with_gene(QNEATGene(innovation=60, target=2), (0.4, 0.5, 0.6))
    child = QNEATIndividual.crossover(fitter, weaker, rng)
    # child inherits exactly the fitter parent's structure
    assert [g.innovation for g in child.genes] == [g.innovation for g in fitter.genes]
    # matching genes take angles from one of the parents
    weaker_map = {g.innovation: i for i, g in enumerate(weaker.genes)}
    for i, gene in enumerate(child.genes):
        child_angles = child.angles[3 * i : 3 * i + 3]
        sources = [fitter.angles[3 * i : 3 * i + 3]]
        if gene.innovation in weaker_map:
            j = weaker_map[gene.innovation]
            sources.append(weaker.angles[3 * j : 3 * j + 3])
        assert child_angles in sources
    # equal fitness: disjoint genes from both parents may appear, ordered
    child_eq = QNEATIndividual.crossover(fitter, weaker, Random(1), equal_fitness=True)
    innovations = [g.innovation for g in child_eq.genes]
    assert innovations == sorted(innovations)


# ---------------------------------------------------------------------------
# lowering
# ---------------------------------------------------------------------------


def test_lowering_matches_sequential_gene_application():
    """The ASAP-layered lowering must equal applying genes one by one."""
    from queasars_tpu.genome.packing import PackedPopulation

    genome = _random_genome(4, 8, seed=7)
    lowered = genome.lower()
    packed = PackedPopulation.pack([lowered])
    probs_lowered = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, 4
        )
    )[0]

    # one gene per layer = strictly sequential application
    sequential = QNEATIndividual(
        n_qubits=4,
        genes=tuple(
            QNEATGene(innovation=10 * i, target=g.target, control=g.control)
            for i, g in enumerate(genome.genes)
        ),
        angles=genome.angles,
    )
    depth_one_layers = []
    from queasars_tpu.genome.circuit_layer import EVQECircuitLayer
    from queasars_tpu.genome.gates import (
        ControlGate,
        ControlledRotationGate,
        IdentityGate,
        RotationGate,
    )

    flat = []
    for i, gene in enumerate(genome.genes):
        gates = [IdentityGate(qubit_index=q) for q in range(4)]
        if gene.is_controlled:
            gates[gene.target] = ControlledRotationGate(
                qubit_index=gene.target, control_qubit_index=gene.control
            )
            gates[gene.control] = ControlGate(
                qubit_index=gene.control, controlled_qubit_index=gene.target
            )
        else:
            gates[gene.target] = RotationGate(qubit_index=gene.target)
        depth_one_layers.append(EVQECircuitLayer(n_qubits=4, gates=tuple(gates)))
        flat.extend(genome.angles[3 * i : 3 * i + 3])
    from queasars_tpu.genome.individual import EVQEIndividual

    sequential_ind = EVQEIndividual(
        n_qubits=4, layers=tuple(depth_one_layers), parameter_values=tuple(flat)
    )
    packed_seq = PackedPopulation.pack([sequential_ind])
    probs_seq = np.asarray(
        probabilities(
            packed_seq.gate_types, packed_seq.controls, packed_seq.angles,
            packed_seq.layer_mask, 4,
        )
    )[0]
    np.testing.assert_allclose(probs_lowered, probs_seq, atol=1e-6)
    # and the layering actually compresses below one-gene-per-layer
    assert len(lowered.layers) < len(sequential_ind.layers)


def test_angle_round_trip_through_lowering():
    genome = _random_genome(4, 6, seed=9)
    lowered = genome.lower()
    round_tripped = genome.pull_angles_from(lowered)
    assert round_tripped.angles == genome.angles


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------


def _context(op):
    counts: list[int] = []
    results: list = []
    ctx = OperatorContext(
        circuit_evaluator=StatevectorExpectationEvaluator(op),
        result_callback=results.append,
        circuit_evaluation_count_callback=counts.append,
    )
    return ctx, counts, results


def test_add_gate_innovation_reuse():
    op = _operator()
    ctx, counts, _ = _context(op)
    pop = QNEATPopulation.initial(4, 8, True, random_seed=1)
    grower = QNEATAddGate(mutation_probability=1.0, random_seed=2)
    grown = grower.apply_operator(pop, ctx)
    assert grown.next_innovation > pop.next_innovation
    # identical structural additions within the pass share innovations
    new_genes = {}
    for individual in grown.individuals:
        for gene in individual.genes:
            if gene.innovation >= pop.next_innovation:
                key = gene.structure_key()
                assert new_genes.setdefault(key, gene.innovation) == gene.innovation
    # distinct structures got distinct innovations
    assert len(set(new_genes.values())) == len(new_genes)


def test_angle_mutation_skips_elites():
    op = _operator()
    ctx, _, _ = _context(op)
    pop = QNEATPopulation.initial(4, 4, True, random_seed=3)
    pop = QNEATPopulation(
        individuals=pop.individuals,
        next_innovation=pop.next_innovation,
        elite_flags=(True, False, False, False),
    )
    mutated = QNEATAngleMutation(
        mutation_probability=1.0, perturbation_probability=1.0,
        reset_probability=0.0, sigma=0.5, random_seed=4,
    ).apply_operator(pop, ctx)
    assert mutated.individuals[0].angles == pop.individuals[0].angles
    for before, after in zip(pop.individuals[1:], mutated.individuals[1:]):
        assert before.angles != after.angles
        assert before.genes == after.genes


def test_speciation_selection_reports_and_reproduces():
    op = _operator()
    ctx, counts, results = _context(op)
    pop = QNEATPopulation.initial(op.n_qubits, 10, True, random_seed=5)
    # diversify structure so several species can form
    grower = QNEATAddGate(mutation_probability=0.7, random_seed=6)
    for _ in range(3):
        pop = grower.apply_operator(pop, ctx)
    selector = QNEATSpeciationSelection(distance_threshold=0.8, random_seed=7)
    next_pop = selector.apply_operator(pop, ctx)
    assert len(next_pop.individuals) == 10
    assert counts[-1] == 10  # one evaluation per individual
    assert len(results) == 1  # the generation tick
    evaluation = results[0]
    assert len(evaluation.expectation_values) == 10
    assert evaluation.best_expectation_value == min(evaluation.expectation_values)
    # the reported population is the LOWERED (engine/result-stack) form
    from queasars_tpu.genome.individual import EVQEIndividual

    assert all(isinstance(i, EVQEIndividual) for i in evaluation.population.individuals)
    assert next_pop.species_representatives


def test_selection_improves_over_generations():
    op = _operator()
    ctx, _, results = _context(op)
    pop = QNEATPopulation.initial(op.n_qubits, 12, True, random_seed=8)
    selector = QNEATSpeciationSelection(random_seed=9)
    mutator = QNEATAngleMutation(random_seed=10)
    grower = QNEATAddGate(random_seed=11)
    for _ in range(6):
        pop = selector.apply_operator(pop, ctx)
        pop = mutator.apply_operator(pop, ctx)
        pop = grower.apply_operator(pop, ctx)
    assert results[-1].best_expectation_value <= results[0].best_expectation_value


# ---------------------------------------------------------------------------
# end-to-end solve
# ---------------------------------------------------------------------------


def test_qneat_solver_finds_optimum():
    from queasars_tpu.problems.qubo import qubo_hamiltonian
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        ConfiguredSampler,
        QNEATMinimumEigensolver,
        QNEATMinimumEigensolverConfiguration,
    )

    operator, _ = qubo_hamiltonian(np.array([[-2.0, 1.5], [0.0, -3.0]]))
    config = QNEATMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=1024, seed=0),
        max_generations=10,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=14,
    )
    result = QNEATMinimumEigensolver(config).compute_minimum_eigenvalue(operator)
    table = diagonal_energy_table(operator)
    assert float(result.eigenvalue) == pytest.approx(float(table.min()), abs=0.3)
    assert result.generations == 10
    assert sum(result.circuit_evaluations) == 10 * 14
    assert result.eigenstate is not None


def test_qneat_solver_deterministic():
    from queasars_tpu.problems.qubo import qubo_hamiltonian
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        ConfiguredSampler,
        QNEATMinimumEigensolver,
        QNEATMinimumEigensolverConfiguration,
    )

    operator, _ = qubo_hamiltonian(np.array([[1.0, -2.0], [0.0, 1.0]]))

    def run():
        config = QNEATMinimumEigensolverConfiguration(
            configured_estimator=ConfiguredEstimator(),
            configured_sampler=ConfiguredSampler(shots=512, seed=0),
            max_generations=4,
            max_circuit_evaluations=None,
            termination_criterion=None,
            random_seed=7,
            population_size=8,
        )
        result = QNEATMinimumEigensolver(config).compute_minimum_eigenvalue(operator)
        return float(result.eigenvalue), [
            float(r.best_expectation_value) for r in result.population_evaluation_results
        ]

    assert run() == run()


def test_qneat_with_optimizer_polish():
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.problems.qubo import qubo_hamiltonian
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        ConfiguredSampler,
        QNEATMinimumEigensolver,
        QNEATMinimumEigensolverConfiguration,
    )

    operator, _ = qubo_hamiltonian(np.array([[-1.0, 2.0], [0.0, -2.0]]))
    config = QNEATMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=512, seed=0),
        max_generations=3,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=1,
        population_size=6,
        optimizer=BatchedNFT(NFTConfig(maxiter=6)),
    )
    result = QNEATMinimumEigensolver(config).compute_minimum_eigenvalue(operator)
    table = diagonal_energy_table(operator)
    assert float(result.eigenvalue) == pytest.approx(float(table.min()), abs=0.3)
    # ledger counts polish evals (13 per individual) + selection evals
    assert sum(result.circuit_evaluations) > 3 * 6


def test_qneat_population_json_round_trip():
    import json

    from queasars_tpu.evolve.qneat import QNEATAddGate
    from queasars_tpu.genome.serialization import (
        QNEATPopulationJSONDecoder,
        QNEATPopulationJSONEncoder,
    )

    op = _operator()
    ctx, _, _ = _context(op)
    pop = QNEATPopulation.initial(4, 5, True, random_seed=13)
    pop = QNEATAddGate(mutation_probability=1.0, random_seed=14).apply_operator(pop, ctx)
    pop = QNEATPopulation(
        individuals=pop.individuals,
        next_innovation=pop.next_innovation,
        species_representatives=pop.individuals[:2],
        elite_flags=(True,) + (False,) * 4,
    )
    text = json.dumps(pop, cls=QNEATPopulationJSONEncoder)
    restored = json.loads(text, cls=QNEATPopulationJSONDecoder)
    assert restored.individuals == pop.individuals
    assert restored.next_innovation == pop.next_innovation
    assert restored.species_representatives == pop.species_representatives
    assert restored.elite_flags == pop.elite_flags


def test_qneat_checkpoint_resume_exact_trajectory(tmp_path):
    """QNEAT solves checkpoint/resume like EVQE: the resumed run
    reproduces the uninterrupted run's remaining generations exactly."""
    import os

    from queasars_tpu.problems.qubo import qubo_hamiltonian
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        ConfiguredSampler,
        QNEATMinimumEigensolver,
        QNEATMinimumEigensolverConfiguration,
    )

    operator, _ = qubo_hamiltonian(np.array([[1.0, -2.0], [0.0, 1.0]]))
    path = os.path.join(tmp_path, "qneat_state.json")

    def config(max_generations, checkpoint=None, resume=None):
        return QNEATMinimumEigensolverConfiguration(
            configured_estimator=ConfiguredEstimator(),
            configured_sampler=ConfiguredSampler(shots=512, seed=0),
            max_generations=max_generations,
            max_circuit_evaluations=None,
            termination_criterion=None,
            random_seed=5,
            population_size=8,
            checkpoint_path=checkpoint,
            resume_from_checkpoint=resume,
        )

    def trajectory(result):
        return [
            (gen.expectation_values, gen.best_expectation_value)
            for gen in result.population_evaluation_results
        ]

    full = QNEATMinimumEigensolver(config(6)).compute_minimum_eigenvalue(operator)
    QNEATMinimumEigensolver(config(3, checkpoint=path)).compute_minimum_eigenvalue(operator)
    resumed = QNEATMinimumEigensolver(
        config(6, checkpoint=path, resume=path)
    ).compute_minimum_eigenvalue(operator)

    assert trajectory(resumed) == trajectory(full)
    assert float(resumed.eigenvalue) == float(full.eigenvalue)
    assert resumed.best_individual == full.best_individual


def test_qneat_amplitude_sharded_solve_matches_plain():
    """QNEAT accepts the amplitude-sharding knobs (round 4): a (pop, amp)
    2-D mesh solve reproduces the unsharded eigenvalue — the generic
    driver's sharded evaluator is genome-family agnostic."""
    from queasars_tpu.parallel import population_mesh
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        ConfiguredSampler,
        QNEATMinimumEigensolver,
        QNEATMinimumEigensolverConfiguration,
    )

    op = PauliSum.sum([pauli_z_string(q, 5) * float(q + 1) for q in range(5)])

    def solve(**kwargs):
        config = QNEATMinimumEigensolverConfiguration(
            configured_estimator=ConfiguredEstimator(),
            configured_sampler=ConfiguredSampler(shots=256, seed=1),
            max_generations=3,
            max_circuit_evaluations=None,
            termination_criterion=None,
            random_seed=5,
            population_size=8,
            **kwargs,
        )
        return QNEATMinimumEigensolver(config).compute_minimum_eigenvalue(op)

    plain = solve()
    sharded = solve(
        mesh=population_mesh(8), shard_amplitudes=True, amp_devices=2
    )
    assert float(sharded.eigenvalue) == pytest.approx(float(plain.eigenvalue), abs=1e-5)
