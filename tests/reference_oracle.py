"""Independent oracle for the reference's seeded genome distributions.

This is a minimal, standalone transcription of the *random call order* of
the reference's genome factories
(/root/reference/queasars/minimum_eigensolvers/evqe/quantum_circuit/
circuit_layer.py:37-125, evolutionary_algorithm/individual.py:34-65,
population.py:32-77) operating on plain integer tuples — no qiskit, no
queasars_tpu imports.  It exists so the seeded-structure tests pin the
framework against a *reference-derived* fixture rather than against
itself (self-consistency is not parity): any deviation in our genome
module's Random consumption order shows up as a mismatch here.

Encoding: per qubit slot, a gate code (0=identity, 1=rotation, 2=control,
3=controlled-rotation) and a partner index (the control qubit for code 3,
the controlled qubit for code 2, else -1).
"""

from __future__ import annotations

from math import pi
from random import Random
from typing import Optional

ID, ROT, CTRL, CROT = 0, 1, 2, 3

Layer = tuple[tuple[int, ...], tuple[int, ...]]  # (codes, partners)


def oracle_new_seed(rng: Random) -> int:
    # reference utility/random.py:7-15
    return rng.randint(0, 2147483647)


def oracle_random_layer(n_qubits: int, previous: Optional[Layer], seed: int) -> Layer:
    codes = [ID] * n_qubits
    partners = [-1] * n_qubits
    cr_candidates: list[int] = []
    rng = Random(seed)

    # per qubit: one `choice` draw unless the previous layer forces a CR slot
    for q in range(n_qubits):
        if previous is not None and previous[0][q] in (ROT, ID):
            cr_candidates.append(q)
        elif rng.choice([ROT, CROT]) == CROT:
            cr_candidates.append(q)
        else:
            codes[q] = ROT

    # pair CR candidates with `sample` draws; duplicate pairs vs the
    # previous layer are rejected (the draw is still consumed)
    while len(cr_candidates) >= 2:
        rotation_qubit, control_qubit = rng.sample(cr_candidates, 2)
        duplicate = previous is not None and (
            (previous[0][rotation_qubit] == CROT and previous[1][rotation_qubit] == control_qubit)
            or (previous[0][control_qubit] == CTRL and previous[1][control_qubit] == rotation_qubit)
        )
        if not duplicate:
            codes[control_qubit], partners[control_qubit] = CTRL, rotation_qubit
            codes[rotation_qubit], partners[rotation_qubit] = CROT, control_qubit
            cr_candidates.remove(rotation_qubit)
            cr_candidates.remove(control_qubit)

    if len(cr_candidates) == 1:
        q = cr_candidates[0]
        codes[q] = ID if (previous is not None and previous[0][q] == ROT) else ROT

    return tuple(codes), tuple(partners)


def oracle_random_individual(
    n_qubits: int, n_layers: int, randomize_parameter_values: bool, seed: int
) -> tuple[list[Layer], tuple[float, ...]]:
    rng = Random(seed)
    layers: list[Layer] = []
    previous: Optional[Layer] = None
    for _ in range(n_layers):
        previous = oracle_random_layer(n_qubits, previous, oracle_new_seed(rng))
        layers.append(previous)
    n_parameters = sum(3 for codes, _ in layers for code in codes if code in (ROT, CROT))
    if randomize_parameter_values:
        values = tuple(2 * pi * rng.random() for _ in range(n_parameters))
    else:
        values = (0.0,) * n_parameters
    return layers, values


def oracle_random_population(
    n_qubits: int,
    n_layers: int,
    n_individuals: int,
    randomize_parameter_values: bool,
    seed: int,
) -> list[tuple[list[Layer], tuple[float, ...]]]:
    rng = Random(seed)
    return [
        oracle_random_individual(
            n_qubits, n_layers, randomize_parameter_values, oracle_new_seed(rng)
        )
        for _ in range(n_individuals)
    ]
