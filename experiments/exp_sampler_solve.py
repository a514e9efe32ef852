"""Production-solve wall-clock on the SAMPLER path: the reference's
notebook configuration (finite shots + CVaR tail + tournament
selection) at 18 qubits — the counterpart of exp_production_solve.py's
exact-estimator measurement, exercising the shot-multiset fast path
inside the fused-kernel objective.

Run on the TPU: python experiments/exp_sampler_solve.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from exp_production_solve import build_problem

from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.solver import (
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def solve(hamiltonian, seed=0):
    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=None,  # sampler path
        configured_sampler=ConfiguredSampler(shots=512, seed=seed),
        distribution_alpha_tail=0.5,
        optimizer=BatchedNFT(NFTConfig(maxiter=30)),
        optimizer_n_circuit_evaluations=None,
        max_generations=4,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=seed,
        population_size=16,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=2.0,
        selection_beta_penalty=2.0,
        parameter_search_probability=0.25,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
        use_tournament_selection=True,
        tournament_size=2,
        use_pallas=True,
        pack_min_layers=6,
    )
    solver = EVQEMinimumEigensolver(config)
    start = time.perf_counter()
    result = solver.compute_minimum_eigenvalue(hamiltonian)
    elapsed = time.perf_counter() - start
    return result, elapsed


def main() -> None:
    encoder, hamiltonian = build_problem()
    result, cold = solve(hamiltonian)
    evals = sum(result.circuit_evaluations)
    print(f"cold solve: {cold:.1f} s ({evals} circuit evaluations, incl. compiles)")
    result, warm = solve(hamiltonian)
    evals = sum(result.circuit_evaluations)
    print(
        f"warm solve: {warm:.2f} s ({evals} circuit evaluations -> "
        f"{evals / warm:.0f} effective evals/s through the complete sampler-path solver)"
    )
    print(f"best CVaR energy: {float(result.eigenvalue):.4f}")
    result2, warm2 = solve(hamiltonian)
    identical = float(result2.eigenvalue) == float(result.eigenvalue)
    print(f"repeat warm solve: {warm2:.2f} s; trajectory-identical best energy: {identical}")


if __name__ == "__main__":
    main()
