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


# ---------------------------------------------------------------------------
# operator-level transcriptions (round 3): the Random consumption of the
# solver pipeline construction and each evolutionary operator, transcribed
# from the reference sources cited per function.  Together with the genome
# factories above, these pin the ENTIRE structural random stream of a
# reference solve.
# ---------------------------------------------------------------------------


def oracle_pipeline_seeds(master_seed: Optional[int]) -> dict:
    """The master Random's draw order in EVQEMinimumEigensolver.__init__
    (reference: evqe.py:188-230): one child seed per operator in pipeline
    order — last-layer search, speciation, selection, parameter search,
    topological search, layer removal — then the population seed, which
    the initializer lambda draws lazily at solve time (evqe.py:190-196
    evaluates new_random_seed when the lambda runs, i.e. AFTER the six
    operator constructions)."""
    rng = Random(master_seed)
    operators = {
        "last_layer_parameter_search": oracle_new_seed(rng),
        "speciation": oracle_new_seed(rng),
        "selection": oracle_new_seed(rng),
        "parameter_search": oracle_new_seed(rng),
        "topological_search": oracle_new_seed(rng),
        "layer_removal": oracle_new_seed(rng),
    }
    return {"operators": operators, "population": oracle_new_seed(rng)}


def oracle_mutation_round(rng: Random, n_individuals: int, probability: float):
    """One mutation operator application (reference: mutation.py:205-216):
    per individual IN ORDER one ``random()`` Bernoulli draw; each selected
    individual consumes one child seed immediately."""
    flags: list[bool] = []
    seeds: list[Optional[int]] = []
    for _ in range(n_individuals):
        if rng.random() <= probability:
            flags.append(True)
            seeds.append(oracle_new_seed(rng))
        else:
            flags.append(False)
            seeds.append(None)
    return flags, seeds


def oracle_layer_order(seed: Optional[int], n_layers: int):
    """Per-individual layer optimization order in the full parameter
    search (reference: mutation.py:115-129): repeatedly ``choice`` from
    the remaining layer ids, then one child seed per chosen layer."""
    rng = Random(seed)
    remaining = list(range(n_layers))
    order: list[int] = []
    child_seeds: list[int] = []
    while remaining:
        layer = rng.choice(remaining)
        remaining.remove(layer)
        order.append(layer)
        child_seeds.append(oracle_new_seed(rng))
    return order, child_seeds


def oracle_removal_count(seed: Optional[int], n_layers: int) -> int:
    """Trailing layers removed by the layer-removal mutation (reference:
    mutation.py:135-152): 0 for single-layer individuals (no draw), else
    one ``randrange(1, n_layers)``."""
    if n_layers == 1:
        return 0
    return Random(seed).randrange(1, n_layers)


def oracle_speciation_representatives(rng: Random, species_member_lists):
    """The representative refresh after species assignment (reference:
    speciation.py:67-83): one ``choice(members)`` per species with
    members, iterated in species insertion order.  Returns the chosen
    representative INDEX per species."""
    return [rng.choice(members) for members in species_member_lists if members]


def oracle_roulette_selection(rng: Random, evaluation_results, layer_counts,
                              controlled_gate_counts, species_sizes,
                              alpha_penalty, beta_penalty, n_select):
    """Roulette-wheel selection draws (reference: selection.py:114-139),
    including the documented double-offset quirk: the offset is added into
    the fitness AND again inside the 1/(fitness+offset) weight.  Returns
    selected indices (``choices`` with weights consumes one ``random()``
    per draw; the selected objects do not touch the stream)."""
    best = min(range(len(evaluation_results)), key=lambda i: evaluation_results[i])
    offset = -evaluation_results[best] + 1 if evaluation_results[best] <= 0 else 0
    fitness = [
        (evaluation_results[i] + offset + alpha_penalty * layer_counts[i]
         + beta_penalty * controlled_gate_counts[i]) * float(species_sizes[i])
        for i in range(len(evaluation_results))
    ]
    weights = [1 / (f + offset) for f in fitness]
    return rng.choices(range(len(evaluation_results)), weights=weights, k=n_select)


def oracle_tournament_selection(rng: Random, evaluation_results, layer_counts,
                                controlled_gate_counts, species_sizes,
                                alpha_penalty, beta_penalty, tournament_size,
                                n_select):
    """Tournament selection draws (reference: selection.py:141-168): per
    selected slot one unweighted ``choices(range(n), k=t)``; the winner is
    the lowest fitness, earliest index on ties (strict ``<``)."""
    fitness = [
        (evaluation_results[i] + alpha_penalty * layer_counts[i]
         + beta_penalty * controlled_gate_counts[i]) * float(species_sizes[i])
        for i in range(len(evaluation_results))
    ]
    selected: list[int] = []
    while len(selected) < n_select:
        tournament = rng.choices(range(len(evaluation_results)), k=tournament_size)
        best_index = None
        best_fitness = None
        for idx in tournament:
            if best_fitness is None or fitness[idx] < best_fitness:
                best_index = idx
                best_fitness = fitness[idx]
        selected.append(best_index)
    return selected
