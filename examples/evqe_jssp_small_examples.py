"""Small JSSP end-to-end: encode, solve with EVQE, decode, plot.

Script counterpart of the reference's evqe_jssp_small_examples.ipynb.
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
from queasars_tpu.problems.jssp.visualization import (
    plot_jssp_problem_instance_gantt,
    plot_jssp_problem_solution_gantt,
)
from queasars_tpu.solver import (
    BestIndividualRelativeChangeTolerance,
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def main() -> None:
    instance = random_job_shop_scheduling_instance(
        "small_jssp", n_jobs=2, n_machines=2, relative_op_amount=1.0, op_duration=1, random_seed=42
    )
    print(instance)
    plot_jssp_problem_instance_gantt(instance, save_path="/tmp/jssp_instance.png")

    encoder = JSSPDomainWallHamiltonianEncoder(jssp_instance=instance, makespan_limit=3)
    hamiltonian = encoder.get_problem_hamiltonian()
    print(f"{encoder.n_qubits} qubits, {hamiltonian.n_terms} Pauli terms")

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=2048, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=40)),
        optimizer_n_circuit_evaluations=None,
        max_generations=8,
        max_circuit_evaluations=None,
        termination_criterion=BestIndividualRelativeChangeTolerance(0.005),
        random_seed=0,
        population_size=10,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.25,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)

    print(f"eigenvalue {result.eigenvalue:.4f} after {result.generations} generations "
          f"({result.total_circuit_evaluations} circuit evaluations)")
    best_state = max(result.eigenstate, key=result.eigenstate.get)
    schedule = encoder.translate_result_state(best_state)
    print(schedule)

    oracle = solve_jssp_exact(instance, makespan_limit=3)
    print(f"EVQE makespan: {schedule.makespan}, exact-solver optimum: {oracle.makespan}")

    if schedule.is_valid:
        plot_jssp_problem_solution_gantt(schedule, save_path="/tmp/jssp_solution.png")
        print("Gantt charts written to /tmp/jssp_instance.png and /tmp/jssp_solution.png")


if __name__ == "__main__":
    main()
