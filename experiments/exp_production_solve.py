"""Production-solve wall-clock: 3x3 JSSP (~18 qubits), population 16,
NFT(maxiter=30), 4 generations, fused kernel + pinned pack shape — the
configuration recorded in docs/performance.md "End-to-end solves".

Run on the TPU: python experiments/exp_production_solve.py
Prints cold (includes kernel compiles) and warm wall-clock.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.problems.jssp import JSSPDomainWallHamiltonianEncoder
from queasars_tpu.problems.jssp.random_instances import random_job_shop_scheduling_instance
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def build_problem():
    for seed in range(100):
        instance = random_job_shop_scheduling_instance(
            instance_name=f"prod-{seed}",
            n_jobs=3,
            n_machines=3,
            relative_op_amount=0.5,
            op_duration=1,
            random_seed=seed,
        )
        encoder = JSSPDomainWallHamiltonianEncoder(instance, makespan_limit=5)
        hamiltonian = encoder.get_problem_hamiltonian()
        if hamiltonian.n_qubits == 18:
            print(f"# instance seed {seed}: {hamiltonian.n_qubits} qubits, "
                  f"{len(hamiltonian.coeffs)} terms")
            return encoder, hamiltonian
    raise SystemExit("no 18-qubit instance found")


def solve(hamiltonian, seed=0):
    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=2048, seed=seed),
        optimizer=BatchedNFT(NFTConfig(maxiter=30)),
        optimizer_n_circuit_evaluations=None,
        max_generations=4,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=seed,
        population_size=16,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.25,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
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
        f"{evals / warm:.0f} effective evals/s through the complete solver)"
    )
    print(f"best energy: {float(result.eigenvalue):.4f}")
    result2, warm2 = solve(hamiltonian)
    identical = float(result2.eigenvalue) == float(result.eigenvalue)
    print(f"repeat warm solve: {warm2:.2f} s; trajectory-identical best energy: {identical}")


if __name__ == "__main__":
    main()
