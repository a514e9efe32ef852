"""The reference's end-to-end correctness anchor, ported.

Reference: test/minimum_eigensolvers/evqe/test_evqe_algorithm.py:23-38
with the fixture config of test/minimum_eigensolvers/evqe/solver.py:17-53:
minimize x^2 - y^2 over integers x, y in [0, 3] (docplex model ->
IntegerToBinary -> Ising), EVQE with seed 0, population 10, NFT(40),
estimator precision 0.05, relative-change termination 0.005 — the
likeliest measured bitstring must decode to the exact global optimum
[0, 3].

The Hamiltonian is built here from first principles (Walsh-Hadamard
decomposition of the same objective over the same 2-bit bounded integer
coding), so the spectrum matches the reference's `to_ising` output up to
the dropped identity offset — which shifts all energies equally and
changes nothing about the solve.
"""

import numpy as np

from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum
from queasars_tpu.solver import (
    BestIndividualRelativeChangeTolerance,
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)

N_QUBITS = 4


def decode(state: int) -> tuple[int, int]:
    """basis state -> (x, y) under the reference's IntegerToBinary coding
    (x = b0 + 2 b1, y = b2 + 2 b3; bit q of the index = qubit q)."""
    x = (state & 1) + 2 * ((state >> 1) & 1)
    y = ((state >> 2) & 1) + 2 * ((state >> 3) & 1)
    return x, y


def objective_table() -> np.ndarray:
    return np.array([float(x * x - y * y) for s in range(1 << N_QUBITS) for x, y in [decode(s)]])


def build_hamiltonian() -> PauliSum:
    """Diagonal Pauli decomposition of the objective via Walsh-Hadamard:
    coeff(m) = 2^-n sum_s (-1)^{popcount(m & s)} E(s); the identity term
    (m = 0) is dropped exactly as qiskit's ``to_ising`` drops the
    offset."""
    table = objective_table()
    dim = 1 << N_QUBITS
    terms = []
    for mask in range(1, dim):
        coeff = 0.0
        for state in range(dim):
            sign = -1.0 if bin(mask & state).count("1") % 2 else 1.0
            coeff += sign * table[state]
        coeff /= dim
        if abs(coeff) < 1e-12:
            continue
        label = "".join("Z" if (mask >> (N_QUBITS - 1 - pos)) & 1 else "I" for pos in range(N_QUBITS))
        terms.append(PauliSum.from_label(label, coeff))
    return PauliSum.sum(terms)


def test_hamiltonian_spectrum_matches_objective():
    from queasars_tpu.paulis import diagonal_energy_table

    table = diagonal_energy_table(build_hamiltonian())
    want = objective_table()
    offset = want.mean()  # the dropped identity coefficient
    np.testing.assert_allclose(table, want - offset, atol=1e-9)


def test_evqe_finds_exact_optimum_of_reference_anchor():
    hamiltonian = build_hamiltonian()
    configuration = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(precision=0.05, seed=0),
        configured_sampler=ConfiguredSampler(shots=1000, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=40)),
        optimizer_n_circuit_evaluations=40,
        max_generations=None,
        max_circuit_evaluations=None,
        termination_criterion=BestIndividualRelativeChangeTolerance(
            minimum_relative_change=0.005
        ),
        random_seed=0,
        population_size=10,
        randomize_initial_population_parameters=False,
        speciation_genetic_distance_threshold=3,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.24,
        topological_search_probability=0.2,
        layer_removal_probability=0.05,
    )
    result = EVQEMinimumEigensolver(configuration).compute_minimum_eigenvalue(hamiltonian)

    likeliest = max(result.eigenstate.items(), key=lambda kv: kv[1])[0]
    assert decode(likeliest) == (0, 3)  # the exact global optimum
    # the best energy sits at the bottom of the (offset-shifted) spectrum
    assert result.eigenvalue <= min(objective_table() - objective_table().mean()) + 1.0
