"""Pluggable external-backend evaluation (sim/external.py).

The reference's L1 accepts any BaseEstimatorV2/BaseSamplerV2 at config
time, including real hardware (reference: circuit_evaluation.py:62-87,
configured_primitives.py:9-22, examples/using_the_ibm_runtime.ipynb).
These tests drive a FULL EVQE solve end-to-end through an injected
mock external backend whose energies come from the independent dense
numpy oracle of test_statevector.py — proving the evolution loop, the
host-stepped optimizers and the ledger all run against a backend the
framework knows nothing about.
"""

import numpy as np
import pytest

from queasars_tpu.genome.individual import EVQEIndividual
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim import BatchedNFT, BatchedSPSA, NFTConfig, SPSAConfig
from queasars_tpu.paulis import diagonal_energy_table
from queasars_tpu.sim.evaluators import (
    CircuitEvaluatorException,
    StatevectorExpectationEvaluator,
)
from queasars_tpu.sim.external import CallbackCircuitEvaluator, resolve_injected_evaluator
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)

from tests.test_reference_anchor import N_QUBITS, build_hamiltonian, decode, objective_table
from tests.test_statevector import dense_layer


class DenseOracleBackend:
    """Mock external backend: a from-scratch dense numpy simulator (the
    oracle of test_statevector.py) measuring a diagonal operator —
    standing in for an external simulator / real QPU."""

    def __init__(self, operator):
        self.table = np.asarray(diagonal_energy_table(operator), dtype=np.float64)
        self.n_qubits = operator.n_qubits
        self.calls = 0
        self.circuits_seen = 0

    def evaluate_circuits(self, circuits, parameter_values):
        self.calls += 1
        self.circuits_seen += len(circuits)
        energies = []
        for individual, params in zip(circuits, parameter_values):
            bound = EVQEIndividual.change_parameter_values(individual, tuple(params))
            packed = PackedPopulation.pack([bound])
            state = np.zeros(1 << self.n_qubits, dtype=np.complex128)
            state[0] = 1.0
            for l in range(packed.max_layers):
                if not packed.layer_mask[0, l]:
                    continue
                u = dense_layer(
                    packed.gate_types[0, l], packed.controls[0, l],
                    packed.angles[0, l], self.n_qubits,
                )
                state = u @ state
            probs = np.abs(state) ** 2
            energies.append(float(probs @ self.table))
        return energies


def _base_config(**overrides):
    config = dict(
        configured_estimator=None,
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=10)),
        optimizer_n_circuit_evaluations=10,
        max_generations=4,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=6,
        randomize_initial_population_parameters=False,
        speciation_genetic_distance_threshold=3,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.24,
        topological_search_probability=0.2,
        layer_removal_probability=0.05,
    )
    config.update(overrides)
    return EVQEMinimumEigensolverConfiguration(**config)


def test_callback_evaluator_validates_inputs():
    with pytest.raises(CircuitEvaluatorException, match="callable"):
        CallbackCircuitEvaluator("not callable", n_qubits=3)
    evaluator = CallbackCircuitEvaluator(lambda c, p: [0.0] * len(c), n_qubits=3)
    population = [
        EVQEIndividual.random_individual(3, 1, True, random_seed=s) for s in (0, 1)
    ]
    packed = PackedPopulation.pack(population)
    out = evaluator.evaluate_packed(packed)
    assert out.shape == (2,)
    # wrong qubit count is rejected
    evaluator5 = CallbackCircuitEvaluator(lambda c, p: [0.0] * len(c), n_qubits=5)
    with pytest.raises(CircuitEvaluatorException, match="measures 5"):
        evaluator5.evaluate_packed(packed)
    # wrong energy count is rejected
    bad = CallbackCircuitEvaluator(lambda c, p: [0.0], n_qubits=3)
    with pytest.raises(CircuitEvaluatorException, match="energies"):
        bad.evaluate_packed(packed)


def test_callback_receives_structure_and_rebinding():
    """The callback sees the genome structure as circuits and the probed
    flat vectors as parameter_values (the reference contract)."""
    seen = {}

    def backend(circuits, parameter_values):
        seen["circuits"] = circuits
        seen["params"] = parameter_values
        return [float(sum(p)) for p in parameter_values]

    individual = EVQEIndividual.random_individual(3, 1, True, random_seed=7)
    evaluator = CallbackCircuitEvaluator(backend, n_qubits=3)
    packed = PackedPopulation.pack([individual])
    probe = packed.angles + 0.5  # an optimizer probe tensor
    out = evaluator.evaluate_packed(packed, angles=probe)
    assert seen["circuits"][0] is individual
    expected_flat = packed.angles_to_flat(0, probe[0])
    assert seen["params"][0] == expected_flat
    np.testing.assert_allclose(out[0], sum(expected_flat), rtol=1e-6)


def test_resolve_injected_evaluator_shapes():
    hamiltonian = build_hamiltonian()
    backend = DenseOracleBackend(hamiltonian)
    instance = CallbackCircuitEvaluator(backend.evaluate_circuits, N_QUBITS)
    assert resolve_injected_evaluator(instance, hamiltonian) is instance

    factory_calls = []

    def factory(operator):
        factory_calls.append(operator)
        return CallbackCircuitEvaluator(backend.evaluate_circuits, operator.n_qubits)

    resolved = resolve_injected_evaluator(factory, hamiltonian)
    assert isinstance(resolved, CallbackCircuitEvaluator)
    assert factory_calls == [hamiltonian]
    with pytest.raises(CircuitEvaluatorException, match="measures"):
        resolve_injected_evaluator(
            CallbackCircuitEvaluator(backend.evaluate_circuits, 7), hamiltonian
        )
    with pytest.raises(CircuitEvaluatorException, match="factory"):
        resolve_injected_evaluator(lambda op: "nope", hamiltonian)
    with pytest.raises(CircuitEvaluatorException, match="BaseCircuitEvaluator"):
        resolve_injected_evaluator(42, hamiltonian)


@pytest.mark.smoke
def test_full_evqe_solve_through_external_backend():
    """The reference anchor solved entirely through the injected mock
    external backend (reference: the IBM-runtime notebook's shape —
    evolution driven by a backend the framework does not own)."""
    hamiltonian = build_hamiltonian()
    backend = DenseOracleBackend(hamiltonian)
    configuration = _base_config(
        evaluator=CallbackCircuitEvaluator(backend.evaluate_circuits, N_QUBITS),
        max_generations=6,
        population_size=8,
    )
    result = EVQEMinimumEigensolver(configuration).compute_minimum_eigenvalue(hamiltonian)

    assert backend.calls > 0 and backend.circuits_seen > 0
    likeliest = max(result.eigenstate.items(), key=lambda kv: kv[1])[0]
    assert decode(likeliest) == (0, 3)  # the exact global optimum
    offset_spectrum = objective_table() - objective_table().mean()
    assert result.eigenvalue <= offset_spectrum.min() + 1.0
    # the ledger counted reference-equivalent evaluations per generation
    assert len(result.circuit_evaluations) == result.generations
    assert sum(result.circuit_evaluations) > 0


def test_external_backend_matches_internal_estimator_energies():
    """The external dense-oracle energies agree with the internal engine
    on the same population (the plumbing does not distort values)."""
    hamiltonian = build_hamiltonian()
    backend = DenseOracleBackend(hamiltonian)
    external = CallbackCircuitEvaluator(backend.evaluate_circuits, N_QUBITS)
    internal = StatevectorExpectationEvaluator(hamiltonian)
    population = [
        EVQEIndividual.random_individual(N_QUBITS, 2, True, random_seed=s)
        for s in range(4)
    ]
    packed = PackedPopulation.pack(population)
    np.testing.assert_allclose(
        external.evaluate_packed(packed),
        internal.evaluate_packed(packed),
        atol=1e-5,
    )


def test_spsa_host_fallback_descends_through_external_backend():
    hamiltonian = build_hamiltonian()
    backend = DenseOracleBackend(hamiltonian)
    external = CallbackCircuitEvaluator(backend.evaluate_circuits, N_QUBITS)
    population = [
        EVQEIndividual.random_individual(N_QUBITS, 1, True, random_seed=s)
        for s in range(3)
    ]
    packed = PackedPopulation.pack(population)
    before = external.evaluate_packed(packed)
    coords_list = [packed.param_coordinates(i) for i in range(3)]
    k_max = max(c.shape[0] for c in coords_list)
    coords = np.zeros((3, k_max, 3), np.int32)
    for i, c in enumerate(coords_list):
        coords[i, : c.shape[0]] = c
    n_free = packed.n_params.copy()
    active = np.ones(3, bool)
    optimizer = BatchedSPSA(SPSAConfig(maxiter=30, learning_rate=0.2, perturbation=0.15))
    new_angles, energies, nfev = optimizer.minimize(
        external, packed, coords, n_free, active, seed=5
    )
    after = external.evaluate_packed(packed, angles=new_angles)
    assert nfev == 61  # 2 per step + the final evaluation
    assert after.sum() < before.sum()  # SPSA descended on average
    np.testing.assert_allclose(energies, after, atol=1e-9)


def test_injected_evaluator_rejects_initial_state():
    hamiltonian = build_hamiltonian()
    backend = DenseOracleBackend(hamiltonian)
    configuration = _base_config(
        evaluator=CallbackCircuitEvaluator(backend.evaluate_circuits, N_QUBITS)
    )
    solver = EVQEMinimumEigensolver(configuration)
    with pytest.raises(CircuitEvaluatorException, match="initial_state"):
        solver.compute_minimum_eigenvalue_with_initial_state(
            hamiltonian, initial_state=np.eye(1, 1 << N_QUBITS, 0, dtype=np.complex64)[0]
        )


def test_aux_operators_with_instance_need_primitives_or_factory():
    hamiltonian = build_hamiltonian()
    backend = DenseOracleBackend(hamiltonian)
    instance = CallbackCircuitEvaluator(backend.evaluate_circuits, N_QUBITS)
    solver = EVQEMinimumEigensolver(_base_config(evaluator=instance))
    with pytest.raises(CircuitEvaluatorException, match="factory"):
        solver.compute_minimum_eigenvalue(hamiltonian, aux_operators=[hamiltonian])

    # an estimator for the aux path unblocks the instance form
    solver = EVQEMinimumEigensolver(
        _base_config(
            evaluator=instance,
            configured_estimator=ConfiguredEstimator(precision=None, seed=0),
            max_generations=1,
        )
    )
    result = solver.compute_minimum_eigenvalue(hamiltonian, aux_operators=[hamiltonian])
    assert len(result.aux_operators_evaluated) == 1

    # a factory serves main AND aux operators externally
    def factory(operator):
        return CallbackCircuitEvaluator(
            DenseOracleBackend(operator).evaluate_circuits, operator.n_qubits
        )

    solver = EVQEMinimumEigensolver(_base_config(evaluator=factory, max_generations=1))
    result = solver.compute_minimum_eigenvalue(hamiltonian, aux_operators={"h": hamiltonian})
    assert set(result.aux_operators_evaluated) == {"h"}
    # the aux value is the main-operator energy of the best individual
    internal = StatevectorExpectationEvaluator(hamiltonian)
    expected = internal.evaluate_individuals([result.best_individual])[0]
    np.testing.assert_allclose(result.aux_operators_evaluated["h"], expected, atol=1e-5)


def test_config_requires_some_evaluation_path():
    with pytest.raises(ValueError, match="external evaluator"):
        _base_config()  # no estimator, no sampler, no injected evaluator


def test_final_eigenstate_sampling_honors_configured_sampler():
    hamiltonian = build_hamiltonian()
    backend = DenseOracleBackend(hamiltonian)
    configuration = _base_config(
        evaluator=CallbackCircuitEvaluator(backend.evaluate_circuits, N_QUBITS),
        configured_sampler=ConfiguredSampler(shots=64, seed=3),
        max_generations=2,
    )
    result = EVQEMinimumEigensolver(configuration).compute_minimum_eigenvalue(hamiltonian)
    # 64 shots -> quasi-probabilities on a 1/64 lattice
    weights = np.array(list(result.eigenstate.values()))
    np.testing.assert_allclose(weights * 64, np.round(weights * 64), atol=1e-6)
