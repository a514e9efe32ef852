"""Job Shop Scheduling problem domain.

TPU-native rebuild of queasars/job_shop_scheduling/: data model, domain-wall
Hamiltonian encoder, random instance generation, JSON serialization, Gantt
visualization, and classical reference solvers (exact brute-force oracle in
C++/numpy; optional SCIP MILP when pyscipopt is available).
"""

from queasars_tpu.problems.jssp.problem_instances import (
    Machine,
    Operation,
    Job,
    JobShopSchedulingProblemInstance,
    PotentiallyScheduledOperation,
    UnscheduledOperation,
    ScheduledOperation,
    JobShopSchedulingResult,
    JobShopSchedulingProblemException,
    ensure_all_operations_are_scheduled,
)
from queasars_tpu.problems.jssp.domain_wall_variables import DomainWallVariable
from queasars_tpu.problems.jssp.encoder import JSSPDomainWallHamiltonianEncoder
from queasars_tpu.problems.jssp.random_instances import (
    random_job_shop_scheduling_instance,
)

__all__ = [
    "Machine",
    "Operation",
    "Job",
    "JobShopSchedulingProblemInstance",
    "PotentiallyScheduledOperation",
    "UnscheduledOperation",
    "ScheduledOperation",
    "JobShopSchedulingResult",
    "JobShopSchedulingProblemException",
    "ensure_all_operations_are_scheduled",
    "DomainWallVariable",
    "JSSPDomainWallHamiltonianEncoder",
    "random_job_shop_scheduling_instance",
]
