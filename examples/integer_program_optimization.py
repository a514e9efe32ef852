"""Minimize a quadratic integer program with EVQE — no docplex needed.

Counterpart of the reference's docplex -> IntegerToBinary -> to_ising
pipeline (reference test fixture model.py:10-23 and the optimization
notebooks): `IntegerQuadraticProgram` lowers bounded integer variables to
the same binary coding and emits a diagonal PauliSum natively.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.problems.qubo import IntegerQuadraticProgram
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def main() -> None:
    # minimize x^2 - y^2 for integers x, y in [0, 3]  (optimum: x=0, y=3)
    program = IntegerQuadraticProgram()
    x = program.integer_var(0, 3, "x")
    y = program.integer_var(0, 3, "y")
    program.minimize(quadratic={(x, x): 1.0, (y, y): -1.0})
    hamiltonian, offset = program.to_ising()
    print(f"{program.n_qubits} qubits, {len(hamiltonian.coeffs)} Pauli terms, offset {offset:+.2f}")

    configuration = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=1000, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=20)),
        optimizer_n_circuit_evaluations=None,
        max_generations=4,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=8,
        speciation_genetic_distance_threshold=3,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.3,
        topological_search_probability=0.3,
        layer_removal_probability=0.05,
        use_tournament_selection=True,
        tournament_size=2,
    )
    result = EVQEMinimumEigensolver(configuration).compute_minimum_eigenvalue(hamiltonian)

    likeliest = max(result.eigenstate.items(), key=lambda kv: kv[1])[0]
    values = program.decode(likeliest)
    print(f"best energy {result.eigenvalue:+.4f} (objective {result.eigenvalue + offset:+.4f})")
    print(f"likeliest assignment: {values} -> objective {program.objective_value(values):+.1f}")
    assert values == {"x": 0, "y": 3}


if __name__ == "__main__":
    main()
