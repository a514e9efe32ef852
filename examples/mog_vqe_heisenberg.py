"""MoG-VQE on a Heisenberg chain: Pareto front of energy vs gate cost.

The multi-objective search (arXiv:2007.04424) the reference names as
future work: instead of one champion circuit, the result carries the
non-dominated trade-off set between accuracy and two-qubit-gate count —
the currency of near-term hardware.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import numpy as np

from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.problems.spin_chains import heisenberg_chain
from queasars_tpu.solver import (
    ConfiguredEstimator,
    EVQEMinimumEigensolverConfiguration,
    MoGVQEMinimumEigensolver,
    result_pareto_front,
)


def main() -> None:
    n = 4
    hamiltonian = heisenberg_chain(n)
    ground = float(np.linalg.eigvalsh(hamiltonian.to_dense_matrix())[0])
    print(f"{n}-site Heisenberg chain, exact ground energy {ground:.4f}")

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=25, reset_interval=4)),
        optimizer_n_circuit_evaluations=None,
        max_generations=6,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=10,
        speciation_genetic_distance_threshold=2,  # unused by MoG-VQE
        selection_alpha_penalty=0.0,
        selection_beta_penalty=0.0,
        parameter_search_probability=0.4,
        topological_search_probability=0.5,
        layer_removal_probability=0.05,
    )
    result = MoGVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)

    print(f"best energy found: {result.eigenvalue:.4f} "
          f"({result.generations} generations, {result.total_circuit_evaluations} evaluations)")
    print("Pareto front (energy, CU3 gates, layers):")
    for individual, energy, gates in result_pareto_front(result):
        print(f"  E = {energy:8.4f}   CU3 = {gates}   layers = {len(individual.layers)}")


if __name__ == "__main__":
    main()
