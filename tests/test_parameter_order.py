"""Qiskit-compatible flat-parameter ordering (genome/parameter_order.py).

The reference binds flat vectors to qiskit's alphabetically sorted
Parameters (names ``layer{l}_q{q}_{theta,phi,lambda}``), so its effective
per-layer order is qubits sorted by the string ``"q{q}_"`` with angles in
(lambda, phi, theta).  NFT cycles parameters by flat index, so matching
this order is what makes optimization trajectories reference-comparable.
"""

import numpy as np
import pytest

from queasars_tpu.genome import (
    EVQEIndividual,
    EVQEPopulation,
    PackedPopulation,
    parameter_order,
)
from queasars_tpu.genome.parameter_order import layer_slot_order, ordered_qubits
from queasars_tpu.sim.statevector import probabilities


def test_canonical_slot_order():
    assert layer_slot_order([0, 2], "canonical") == [
        (0, 0), (0, 1), (0, 2), (2, 0), (2, 1), (2, 2),
    ]


def test_qiskit_slot_order_angle_triplet():
    # within a qubit: lambda (idx 2) < phi (idx 1) < theta (idx 0)
    assert layer_slot_order([1], "qiskit") == [(1, 2), (1, 1), (1, 0)]


def test_qiskit_qubit_string_sort_above_ten_qubits():
    # alphabetical name sort: q0 < q10 < q11 < q1 < q2 (the '_' vs digit
    # comparison the reference inherits from qiskit's Parameter sorting)
    assert ordered_qubits([0, 1, 2, 10, 11], "qiskit") == [0, 10, 11, 1, 2]
    assert ordered_qubits([0, 1, 2, 10, 11], "canonical") == [0, 1, 2, 10, 11]


@pytest.mark.parametrize("mode", ["canonical", "qiskit"])
def test_pack_flat_round_trip(mode):
    individual = EVQEIndividual.random_individual(12, 3, True, random_seed=4)
    packed = PackedPopulation.pack([individual], parameter_order=mode)
    assert packed.parameter_order == mode
    flat = packed.angles_to_flat(0, packed.angles[0])
    assert np.allclose(flat, individual.parameter_values, atol=1e-6)


def test_modes_assign_different_slots_same_simulation_semantics():
    """The same flat vector lands on different angle slots per mode, but a
    vector permuted accordingly gives the identical circuit."""
    individual = EVQEIndividual.random_individual(12, 2, True, random_seed=1)
    packed_c = PackedPopulation.pack([individual], parameter_order="canonical")
    packed_q = PackedPopulation.pack([individual], parameter_order="qiskit")
    # different interpretations of the same flat values
    assert not np.allclose(packed_c.angles, packed_q.angles)

    # permute the flat vector from canonical slots into qiskit order: the
    # packed angle tensors must then agree exactly
    coords_c = packed_c.param_coordinates(0)
    coords_q = packed_q.param_coordinates(0)
    slot_to_value = {tuple(c): v for c, v in zip(coords_c, individual.parameter_values)}
    permuted = tuple(slot_to_value[tuple(c)] for c in coords_q)
    repacked = PackedPopulation.pack(
        [EVQEIndividual.change_parameter_values(individual, permuted)],
        parameter_order="qiskit",
    )
    np.testing.assert_array_equal(repacked.angles, packed_c.angles)
    probs_c = np.asarray(
        probabilities(
            packed_c.gate_types, packed_c.controls, packed_c.angles, packed_c.layer_mask, 12
        )
    )
    probs_q = np.asarray(
        probabilities(
            repacked.gate_types, repacked.controls, repacked.angles, repacked.layer_mask, 12
        )
    )
    np.testing.assert_array_equal(probs_c, probs_q)


def test_global_mode_context_manager():
    individual = EVQEIndividual.random_individual(5, 2, True, random_seed=2)
    with parameter_order("qiskit"):
        packed = PackedPopulation.pack([individual])
    assert packed.parameter_order == "qiskit"
    packed_default = PackedPopulation.pack([individual])
    assert packed_default.parameter_order == "canonical"


def test_nft_traversal_order_follows_mode():
    """Batched NFT walks coordinates in flat order — under qiskit mode the
    first optimized coordinate is q0's lambda, not q0's theta."""
    individual = EVQEIndividual.random_individual(4, 1, True, random_seed=3)
    packed_c = PackedPopulation.pack([individual], parameter_order="canonical")
    packed_q = PackedPopulation.pack([individual], parameter_order="qiskit")
    first_c = tuple(packed_c.param_coordinates(0)[0])
    first_q = tuple(packed_q.param_coordinates(0)[0])
    assert first_c[2] == 0  # theta
    assert first_q[2] == 2  # lambda
    assert first_c[:2] == first_q[:2]


def test_solver_runs_under_qiskit_order():
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.paulis import PauliSum, pauli_z_string
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    hamiltonian = PauliSum.sum([pauli_z_string(q, 3) for q in range(3)])
    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=8)),
        optimizer_n_circuit_evaluations=None,
        max_generations=2,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=6,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.5,
        topological_search_probability=0.5,
        layer_removal_probability=0.1,
        use_tournament_selection=True,
        tournament_size=2,
        parameter_order="qiskit",
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)
    assert result.generations == 2
    assert result.eigenvalue < 0.0
