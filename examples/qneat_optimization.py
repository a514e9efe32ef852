"""QNEAT on a small JSSP: speciated neuro-evolution of circuit genomes.

The third algorithm the reference names as future work with no code
(reference README.md:3): QNEAT (arXiv:2304.06981) evolves gate-gene lists
NEAT-style — innovation-number crossover, compatibility speciation with
explicit fitness sharing, champion elitism — instead of EVQE's
layer-granular mutations.  Genomes lower to the same packed-tensor engine
(one batched device evaluation per generation).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import numpy as np

from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.paulis import diagonal_energy_table
from queasars_tpu.problems.jssp import (
    JSSPDomainWallHamiltonianEncoder,
    Job,
    JobShopSchedulingProblemInstance,
    Machine,
    Operation,
)
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    QNEATMinimumEigensolver,
    QNEATMinimumEigensolverConfiguration,
)


def build_instance() -> JobShopSchedulingProblemInstance:
    m1, m2 = Machine("m1"), Machine("m2")
    j1 = Job("j1", (Operation("o1", "j1", m1, 1), Operation("o2", "j1", m2, 1)))
    j2 = Job("j2", (Operation("o1", "j2", m2, 1),))
    return JobShopSchedulingProblemInstance("tiny", (m1, m2), (j1, j2))


def main() -> None:
    encoder = JSSPDomainWallHamiltonianEncoder(build_instance(), makespan_limit=3)
    hamiltonian = encoder.get_problem_hamiltonian()
    table = diagonal_energy_table(hamiltonian)
    print(f"{hamiltonian.n_qubits}-qubit JSSP Hamiltonian, optimum {float(table.min()):.3f}")

    config = QNEATMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=2048, seed=0),
        max_generations=12,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=16,
        add_gate_probability=0.4,
        # hybrid: a short batched-NFT polish per generation (pure QNEAT
        # relies on angle mutation alone — drop this line to see it)
        optimizer=BatchedNFT(NFTConfig(maxiter=8)),
    )
    result = QNEATMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)

    print(f"generations: {result.generations}, evaluations: {sum(result.circuit_evaluations)}")
    print(f"best energy: {float(result.eigenvalue):.3f}")
    best_genes = result.best_individual
    print(f"best circuit: {len(best_genes.layers)} layers, "
          f"{best_genes.get_n_controlled_gates()} controlled gates")
    likeliest = max(result.eigenstate, key=result.eigenstate.get)
    schedule = encoder.translate_result_state(likeliest)
    print(f"likeliest schedule valid: {schedule.is_valid}, makespan: {schedule.makespan}")


if __name__ == "__main__":
    main()
