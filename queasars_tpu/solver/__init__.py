"""Solver API / algorithm driver (reference layer L3).

Rebuild of queasars/minimum_eigensolvers/base/ and the EVQE facade
(queasars/minimum_eigensolvers/evqe/evqe.py): generation loop with budget
and termination enforcement, result assembly, configuration dataclasses,
result JSON serialization — plus a resume hook (``initial_population``)
the reference lacks (SURVEY.md §5 checkpoint/resume gap).
"""

from queasars_tpu.solver.termination_criteria import (
    EvolvingAnsatzMinimumEigensolverBaseTerminationCriterion,
    BestIndividualChangeTolerance,
    BestIndividualRelativeChangeTolerance,
    BestIndividualExpectationValueThreshold,
    PopulationChangeTolerance,
    PopulationChangeRelativeTolerance,
)
from queasars_tpu.solver.result import EvolvingAnsatzMinimumEigensolverResult
from queasars_tpu.solver.configured_evaluators import ConfiguredEstimator, ConfiguredSampler
from queasars_tpu.solver.driver import (
    EvolvingAnsatzMinimumEigensolver,
    EvolvingAnsatzMinimumEigensolverConfiguration,
)
from queasars_tpu.solver.adapt_vqe import (
    AdaptVQEConfiguration,
    AdaptVQEMinimumEigensolver,
    AdaptVQEResult,
)
from queasars_tpu.solver.evqe import EVQEMinimumEigensolver, EVQEMinimumEigensolverConfiguration
from queasars_tpu.solver.qaoa import QAOAConfiguration, QAOAMinimumEigensolver, QAOAResult
from queasars_tpu.solver.mog_vqe import MoGVQEMinimumEigensolver, result_pareto_front
from queasars_tpu.solver.qneat import (
    QNEATMinimumEigensolver,
    QNEATMinimumEigensolverConfiguration,
)

__all__ = [
    "AdaptVQEConfiguration",
    "AdaptVQEMinimumEigensolver",
    "AdaptVQEResult",
    "EvolvingAnsatzMinimumEigensolverBaseTerminationCriterion",
    "BestIndividualChangeTolerance",
    "BestIndividualRelativeChangeTolerance",
    "BestIndividualExpectationValueThreshold",
    "PopulationChangeTolerance",
    "PopulationChangeRelativeTolerance",
    "EvolvingAnsatzMinimumEigensolverResult",
    "ConfiguredEstimator",
    "ConfiguredSampler",
    "EvolvingAnsatzMinimumEigensolver",
    "EvolvingAnsatzMinimumEigensolverConfiguration",
    "EVQEMinimumEigensolver",
    "EVQEMinimumEigensolverConfiguration",
    "MoGVQEMinimumEigensolver",
    "QAOAConfiguration",
    "QAOAMinimumEigensolver",
    "QAOAResult",
    "QNEATMinimumEigensolver",
    "QNEATMinimumEigensolverConfiguration",
    "result_pareto_front",
]

from queasars_tpu.solver.visualization import plot_convergence, plot_pareto_front  # noqa: E402

__all__ += ["plot_convergence", "plot_pareto_front"]
