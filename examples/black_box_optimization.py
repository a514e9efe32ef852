"""Minimize an arbitrary black-box bitstring objective with EVQE.

Demonstrates ``compute_minimum_function_value`` (reference:
evolving_ansatz_minimum_eigensolver.py:278-329): any
``Callable[[str], float]`` becomes the fitness — no Hamiltonian needed.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.solver import (
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)
from queasars_tpu.utils import BitstringEvaluator


def objective(bitstring: str) -> float:
    """Deceptive trap-ish objective: prefer alternating bit patterns."""
    transitions = sum(1 for a, b in zip(bitstring, bitstring[1:]) if a != b)
    return -float(transitions)


def main() -> None:
    n = 5
    evaluator = BitstringEvaluator(input_length=n, evaluation_function=objective)

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=None,
        configured_sampler=ConfiguredSampler(shots=2048, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=20)),
        optimizer_n_circuit_evaluations=None,
        max_generations=6,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=8,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.05,
        selection_beta_penalty=0.05,
        parameter_search_probability=0.3,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
        use_tournament_selection=True,
        tournament_size=2,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_function_value(evaluator)

    best_state = max(result.eigenstate, key=result.eigenstate.get)
    bitstring = format(best_state, f"0{n}b")
    print(f"best objective value: {result.eigenvalue:.3f}")
    print(f"likeliest bitstring: {bitstring} (objective {objective(bitstring)})")


if __name__ == "__main__":
    main()
