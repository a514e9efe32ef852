"""QUBO / integer-program encoding tests: exhaustive-spectrum oracles
(the same validation style as the JSSP encoder tests) plus an E2E solve."""

import numpy as np
import pytest

from queasars_tpu.paulis import diagonal_energy_table
from queasars_tpu.problems.qubo import (
    BoundedIntegerVariable,
    IntegerQuadraticProgram,
    decode_qubo_bits,
    qubo_hamiltonian,
)


def brute_force_qubo(quadratic, linear, constant, n):
    values = np.zeros(1 << n)
    for state in range(1 << n):
        x = np.array(decode_qubo_bits(state, n), dtype=np.float64)
        values[state] = x @ quadratic @ x + (linear @ x if linear is not None else 0.0) + constant
    return values


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_qubo_hamiltonian_exhaustive_spectrum(seed):
    rng = np.random.default_rng(seed)
    n = 6
    quadratic = rng.normal(size=(n, n))
    linear = rng.normal(size=n)
    constant = float(rng.normal())
    hamiltonian, offset = qubo_hamiltonian(quadratic, linear, constant)
    table = diagonal_energy_table(hamiltonian)
    want = brute_force_qubo(quadratic, linear, constant, n)
    np.testing.assert_allclose(table + offset, want, atol=1e-9)


def test_qubo_asymmetric_matrix_symmetrized():
    quadratic = np.array([[0.0, 3.0], [1.0, 0.0]])  # asymmetric
    hamiltonian, offset = qubo_hamiltonian(quadratic)
    table = diagonal_energy_table(hamiltonian)
    want = brute_force_qubo(quadratic, None, 0.0, 2)
    np.testing.assert_allclose(table + offset, want, atol=1e-12)


def test_bounded_integer_coding_matches_reference_scheme():
    # ub - lb = 3 -> coefficients [1, 2] (the IntegerToBinary scheme)
    var = BoundedIntegerVariable("x", 0, 3)
    assert var.n_bits == 2 and var.coefficients == (1, 2)
    assert [var.value_from_bits([b0, b1]) for b1 in (0, 1) for b0 in (0, 1)] == [0, 1, 2, 3]
    # non-power-of-two span: ub - lb = 5 -> [1, 2, 2] (last clipped)
    var = BoundedIntegerVariable("y", 2, 7)
    assert var.n_bits == 3 and var.coefficients == (1, 2, 2)
    assert var.value_from_bits([1, 1, 1]) == 7
    assert var.value_from_bits([0, 0, 0]) == 2


def test_integer_program_spectrum_and_decode():
    program = IntegerQuadraticProgram()
    x = program.integer_var(0, 3, "x")
    y = program.integer_var(0, 3, "y")
    program.minimize(quadratic={(x, x): 1.0, (y, y): -1.0})
    hamiltonian, offset = program.to_ising()
    assert program.n_qubits == 4

    table = diagonal_energy_table(hamiltonian)
    for state in range(16):
        values = program.decode(state)
        assert table[state] + offset == pytest.approx(program.objective_value(values), abs=1e-9)
    # the exact optimum x=0, y=3 is the spectrum minimum
    best = int(np.argmin(table))
    assert program.decode(best) == {"x": 0, "y": 3}


def test_integer_program_solve_end_to_end():
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        ConfiguredSampler,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    program = IntegerQuadraticProgram()
    x = program.integer_var(0, 3, "x")
    y = program.integer_var(0, 3, "y")
    program.minimize(quadratic={(x, x): 1.0, (y, y): -1.0})
    hamiltonian, _ = program.to_ising()

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
    assert program.decode(likeliest) == {"x": 0, "y": 3}


def test_maxcut_hamiltonian_exhaustive():
    """Every basis state's cut value = offset - <H> (5-node weighted graph)."""
    from queasars_tpu.problems.qubo import maxcut_hamiltonian

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3)]
    weights = [1.0, 2.0, 0.5, 1.5, 1.0, 3.0]
    hamiltonian, offset = maxcut_hamiltonian(5, edges, weights)
    table = diagonal_energy_table(hamiltonian)
    for state in range(1 << 5):
        bits = decode_qubo_bits(state, 5)
        cut = sum(w for (i, j), w in zip(edges, weights) if bits[i] != bits[j])
        assert offset - table[state] == pytest.approx(cut, abs=1e-9)
    # the operator's minimum is the maximum cut
    best = int(np.argmin(table))
    best_bits = decode_qubo_bits(best, 5)
    best_cut = sum(w for (i, j), w in zip(edges, weights) if best_bits[i] != best_bits[j])
    all_cuts = [
        sum(w for (i, j), w in zip(edges, weights)
            if decode_qubo_bits(s, 5)[i] != decode_qubo_bits(s, 5)[j])
        for s in range(1 << 5)
    ]
    assert best_cut == pytest.approx(max(all_cuts))


def test_maxcut_solve_end_to_end():
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.problems.qubo import maxcut_hamiltonian
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        ConfiguredSampler,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    # a 4-cycle: max cut = 4 (alternating partition)
    hamiltonian, offset = maxcut_hamiltonian(4, [(0, 1), (1, 2), (2, 3), (3, 0)])
    configuration = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=512, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=15)),
        optimizer_n_circuit_evaluations=None,
        max_generations=3,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=8,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.4,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
        use_tournament_selection=True,
        tournament_size=2,
    )
    result = EVQEMinimumEigensolver(configuration).compute_minimum_eigenvalue(hamiltonian)
    assert offset - result.eigenvalue == pytest.approx(4.0, abs=1e-3)
