"""Persist solver results and populations as JSON; resume a solve.

Counterpart of the reference's "Serialize and store the results" workflow
(using_the_ibm_runtime.ipynb) plus two resume capabilities the reference
lacks: continuing from a stored final population
(``initial_population=``) and exact-trajectory crash recovery from a
full-solver-state checkpoint (``checkpoint_path=`` /
``resume_from_checkpoint=``).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import json

from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.problems.jssp import (
    JSSPDomainWallHamiltonianEncoder,
    random_job_shop_scheduling_instance,
)
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)
from queasars_tpu.solver.serialization import (
    EvolvingAnsatzMinimumEigensolverResultJSONDecoder,
    EvolvingAnsatzMinimumEigensolverResultJSONEncoder,
)


def make_config(**overrides):
    defaults = dict(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=2048, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=30)),
        optimizer_n_circuit_evaluations=None,
        max_generations=3,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=8,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.25,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
    )
    defaults.update(overrides)
    return EVQEMinimumEigensolverConfiguration(**defaults)


def main() -> None:
    instance = random_job_shop_scheduling_instance(
        "resume_demo", n_jobs=2, n_machines=2, relative_op_amount=1.0, op_duration=1, random_seed=7
    )
    encoder = JSSPDomainWallHamiltonianEncoder(instance, makespan_limit=3)
    hamiltonian = encoder.get_problem_hamiltonian()

    # first solve: 3 generations, then persist everything
    result = EVQEMinimumEigensolver(make_config()).compute_minimum_eigenvalue(hamiltonian)
    path = "/tmp/evqe_result.json"
    with open(path, "w") as fh:
        json.dump(result, fh, cls=EvolvingAnsatzMinimumEigensolverResultJSONEncoder)
    print(f"saved result after {result.generations} generations "
          f"(eigenvalue {result.eigenvalue:.4f}) to {path}")

    # reload and resume from the stored final population
    with open(path) as fh:
        restored = json.load(fh, cls=EvolvingAnsatzMinimumEigensolverResultJSONDecoder)
    final_population = restored.final_population_evaluation_result.population
    resumed = EVQEMinimumEigensolver(
        make_config(max_generations=3, initial_population=final_population, random_seed=1)
    ).compute_minimum_eigenvalue(hamiltonian)
    print(f"resumed solve: eigenvalue {resumed.eigenvalue:.4f} "
          f"after {resumed.generations} more generations")
    assert resumed.eigenvalue <= restored.eigenvalue + 1e-6

    # crash recovery: checkpoint_path persists the FULL solver state every
    # generation; resume_from_checkpoint continues the exact trajectory
    # (operator RNGs, ledger, best-so-far, shot counters all restored)
    checkpoint = "/tmp/evqe_checkpoint.json"
    EVQEMinimumEigensolver(
        make_config(max_generations=2, checkpoint_path=checkpoint)
    ).compute_minimum_eigenvalue(hamiltonian)  # "crashes" after 2 generations
    recovered = EVQEMinimumEigensolver(
        make_config(max_generations=4, resume_from_checkpoint=checkpoint)
    ).compute_minimum_eigenvalue(hamiltonian)
    uninterrupted = EVQEMinimumEigensolver(
        make_config(max_generations=4)
    ).compute_minimum_eigenvalue(hamiltonian)
    assert recovered.eigenvalue == uninterrupted.eigenvalue
    trajectory = [g.best_expectation_value for g in recovered.population_evaluation_results]
    assert trajectory == [
        g.best_expectation_value for g in uninterrupted.population_evaluation_results
    ]
    print(f"crash-recovered solve reproduced the uninterrupted trajectory exactly: "
          f"{[round(v, 4) for v in trajectory]}")


if __name__ == "__main__":
    main()
