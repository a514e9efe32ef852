"""Per-generation checkpointing + crash-resume round trip."""

import os

from queasars_tpu.genome.serialization import load_population
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum, pauli_z_string
from queasars_tpu.solver import (
    ConfiguredEstimator,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def make_config(**overrides):
    defaults = dict(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=10)),
        optimizer_n_circuit_evaluations=None,
        max_generations=3,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=6,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.3,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
        use_tournament_selection=True,
        tournament_size=2,
    )
    defaults.update(overrides)
    return EVQEMinimumEigensolverConfiguration(**defaults)


def test_checkpoint_written_and_resumable(tmp_path):
    hamiltonian = PauliSum.sum([pauli_z_string(q, 3) for q in range(3)])
    path = os.path.join(tmp_path, "population.json")

    result = EVQEMinimumEigensolver(make_config(checkpoint_path=path)).compute_minimum_eigenvalue(
        hamiltonian
    )
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")  # atomic replace cleaned up

    # the checkpoint holds the LAST evaluated population
    population = load_population(path)
    final = result.final_population_evaluation_result.population
    assert population.individuals == final.individuals

    # resume from the checkpoint ("crash recovery")
    resumed = EVQEMinimumEigensolver(
        make_config(max_generations=1, initial_population=population, random_seed=1)
    ).compute_minimum_eigenvalue(hamiltonian)
    assert resumed.eigenvalue <= result.eigenvalue + 1e-6
