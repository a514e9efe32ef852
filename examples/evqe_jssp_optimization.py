"""Larger JSSP with the shot-based sampler path, CVaR tail and tournament
selection.

Script counterpart of the reference's evqe_jssp_optimization.ipynb
(512-4000 shots, CVaR alpha per quantum-journal q-2020-04-20-256).
Sized to finish quickly even on a single CPU core; scale shots/maxiter
up on TPU.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.problems.jssp import (
    JSSPDomainWallHamiltonianEncoder,
    random_job_shop_scheduling_instance,
)
from queasars_tpu.problems.jssp.exact_solver import solve_jssp_exact
from queasars_tpu.solver import (
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def main() -> None:
    instance = random_job_shop_scheduling_instance(
        "jssp_opt", n_jobs=2, n_machines=2, relative_op_amount=1.0, op_duration=1, random_seed=1
    )
    encoder = JSSPDomainWallHamiltonianEncoder(
        jssp_instance=instance,
        makespan_limit=4,
        encoding_penalty=300,
        overlap_constraint_penalty=100,
        precedence_constraint_penalty=100,
        max_opt_value=100,
    )
    hamiltonian = encoder.get_problem_hamiltonian()
    print(f"{encoder.n_qubits} qubits, {hamiltonian.n_terms} terms")

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=None,  # sampler path: finite shots + CVaR
        configured_sampler=ConfiguredSampler(shots=512, seed=0),
        distribution_alpha_tail=0.5,
        optimizer=BatchedNFT(NFTConfig(maxiter=20)),
        optimizer_n_circuit_evaluations=None,
        max_generations=4,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=10,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=2.0,
        selection_beta_penalty=2.0,
        parameter_search_probability=0.25,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
        use_tournament_selection=True,
        tournament_size=2,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)

    best_state = max(result.eigenstate, key=result.eigenstate.get)
    schedule = encoder.translate_result_state(best_state)
    oracle = solve_jssp_exact(instance, makespan_limit=4)
    print(f"CVaR eigenvalue: {result.eigenvalue:.4f}")
    print(f"decoded schedule valid: {schedule.is_valid}, makespan: {schedule.makespan} "
          f"(exact optimum: {oracle.makespan})")
    print(schedule)


if __name__ == "__main__":
    main()
