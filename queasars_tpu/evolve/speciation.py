"""NEAT-style speciation operator.

Behavioral port of
queasars/minimum_eigensolvers/evqe/evolutionary_algorithm/speciation.py:
19-95: assign each individual to the first representative within the
genetic-distance threshold (founding new species otherwise), then re-draw
random representatives per species.  Pure host work, zero circuit
evaluations.
"""

from __future__ import annotations

from random import Random
from typing import Optional

from queasars_tpu.evolve.base import BaseEvolutionaryOperator, OperatorContext
from queasars_tpu.genome.individual import EVQEIndividual
from queasars_tpu.genome.population import EVQEPopulation


class EVQESpeciation(BaseEvolutionaryOperator[EVQEPopulation]):
    """Speciation by genetic distance (reference: speciation.py:19-95).

    :param genetic_distance_threshold: individuals within this distance of
        a representative join its species
    :param random_seed: RNG seed for representative re-draws
    """

    def __init__(self, genetic_distance_threshold: int, random_seed: Optional[int]):
        self.genetic_distance_threshold = genetic_distance_threshold
        self.random_generator = Random(random_seed)

    def apply_operator(self, population: EVQEPopulation, operator_context: OperatorContext) -> EVQEPopulation:
        if population.species_representatives is None:
            species_representatives: list[EVQEIndividual] = []
            species_members: dict[EVQEIndividual, list[int]] = {}
        else:
            species_representatives = population.species_representatives
            species_members = {representative: [] for representative in species_representatives}
        species_membership: dict[int, EVQEIndividual] = {}

        # assignment pass (reference: speciation.py:45-65)
        for i, individual in enumerate(population.individuals):
            found = False
            for representative in species_representatives:
                if (
                    EVQEIndividual.get_genetic_distance(
                        individual_1=individual, individual_2=representative
                    )
                    < self.genetic_distance_threshold
                    or individual == representative
                ):
                    species_members[representative].append(i)
                    species_membership[i] = representative
                    found = True
                    break
            if not found:
                species_representatives.append(individual)
                species_members[individual] = [i]
                species_membership[i] = individual

        # representative refresh (reference: speciation.py:67-83)
        new_species_members: dict[EVQEIndividual, list[int]] = {}
        for members in species_members.values():
            if len(members) <= 0:
                continue
            representative_index = self.random_generator.choice(members)
            representative = population.individuals[representative_index]
            if representative not in new_species_members:
                new_species_members[representative] = members
            else:
                new_species_members[representative].extend(members)

        species_membership = {}
        for representative, members in new_species_members.items():
            for member in members:
                species_membership[member] = representative

        return EVQEPopulation(
            individuals=population.individuals,
            species_representatives=list(new_species_members.keys()),
            species_members=new_species_members,
            species_membership=species_membership,
        )

    def get_n_expected_circuit_evaluations(self, population, operator_context):
        return 0
