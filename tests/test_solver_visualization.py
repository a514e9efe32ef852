"""Solve-result plotting smoke tests (figure creation + save)."""

import os

from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum, pauli_z_string
from queasars_tpu.solver import (
    ConfiguredEstimator,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)
from queasars_tpu.solver.mog_vqe import MoGVQEMinimumEigensolver
from queasars_tpu.solver.visualization import plot_convergence, plot_pareto_front


def _config(**overrides):
    defaults = dict(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=4)),
        optimizer_n_circuit_evaluations=None,
        max_generations=2,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=4,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.3,
        topological_search_probability=0.3,
        layer_removal_probability=0.1,
    )
    defaults.update(overrides)
    return EVQEMinimumEigensolverConfiguration(**defaults)


def test_convergence_plot(tmp_path):
    hamiltonian = PauliSum.sum([pauli_z_string(q, 3) for q in range(3)])
    result = EVQEMinimumEigensolver(_config()).compute_minimum_eigenvalue(hamiltonian)
    fig = plot_convergence(result)
    assert fig is not None
    target = os.path.join(tmp_path, "convergence.png")
    assert plot_convergence(result, path=target) is None
    assert os.path.getsize(target) > 0


def test_pareto_plot(tmp_path):
    hamiltonian = PauliSum.sum([pauli_z_string(q, 3) for q in range(3)])
    result = MoGVQEMinimumEigensolver(_config()).compute_minimum_eigenvalue(hamiltonian)
    target = os.path.join(tmp_path, "pareto.png")
    assert plot_pareto_front(result, path=target) is None
    assert os.path.getsize(target) > 0
