"""Evolutionary algorithm: contracts and the EVQE operator pipeline.

Rebuild of queasars/minimum_eigensolvers/base/evolutionary_algorithm.py and
evqe/evolutionary_algorithm/{mutation,speciation,selection}.py.  Host-side
orchestration (Bernoulli draws, speciation dicts, selection RNG) keeps the
reference's exact ``random.Random`` call order; all circuit evaluation and
parameter optimization happens in batched device programs.
"""

from queasars_tpu.evolve.base import (
    BaseEvolutionaryOperator,
    BasePopulationEvaluationResult,
    OperatorContext,
)
from queasars_tpu.evolve.mutation import (
    EVQELastLayerParameterSearch,
    EVQEParameterSearch,
    EVQETopologicalSearch,
    EVQELayerRemoval,
)
from queasars_tpu.evolve.multiobjective import (
    MultiObjectiveEVQESelection,
    non_dominated_sort,
    crowding_distance,
    pareto_front,
)
from queasars_tpu.evolve.qneat import (
    QNEATAddGate,
    QNEATAngleMutation,
    QNEATParameterPolish,
    QNEATSpeciationSelection,
)
from queasars_tpu.evolve.speciation import EVQESpeciation
from queasars_tpu.evolve.selection import EVQESelection, EVQESelectionException

__all__ = [
    "BaseEvolutionaryOperator",
    "BasePopulationEvaluationResult",
    "OperatorContext",
    "EVQELastLayerParameterSearch",
    "EVQEParameterSearch",
    "EVQETopologicalSearch",
    "EVQELayerRemoval",
    "EVQESpeciation",
    "QNEATSpeciationSelection",
    "QNEATAngleMutation",
    "QNEATAddGate",
    "QNEATParameterPolish",
    "MultiObjectiveEVQESelection",
    "non_dominated_sort",
    "crowding_distance",
    "pareto_front",
    "EVQESelection",
    "EVQESelectionException",
]
