"""JSON (de)serialization for the JSSP data model.

Wire-compatible with the reference codec
(queasars/job_shop_scheduling/serialization.py:18-193): the same sentinel
keys ("machine_name", "operation_name", "tuple", "dict", ...) are used so
JSON produced by either implementation round-trips through the other.
"""

from __future__ import annotations

from json import JSONDecoder, JSONEncoder
from typing import Any

from queasars_tpu.problems.jssp.problem_instances import (
    Job,
    JobShopSchedulingProblemInstance,
    JobShopSchedulingResult,
    Machine,
    Operation,
    ScheduledOperation,
    UnscheduledOperation,
)


class JSSPJSONEncoder(JSONEncoder):
    """Serializes Machine, Operation, Job, JobShopSchedulingProblemInstance,
    (Un)ScheduledOperation and JobShopSchedulingResult.

    Reference key scheme: serialization.py:31-78.
    """

    def default(self, o: Any) -> Any:
        if isinstance(o, tuple):
            return {"tuple": [self.default(entry) for entry in o]}
        if isinstance(o, list):
            return [self.default(entry) for entry in o]
        if isinstance(o, dict):
            return {"dict": self.default(list(o.items()))}
        if isinstance(o, Machine):
            return {"machine_name": o.name}
        if isinstance(o, Operation):
            return {
                "operation_name": o.name,
                "operation_job_name": o.job_name,
                "operation_machine": self.default(o.machine),
                "operation_processing_duration": o.processing_duration,
            }
        if isinstance(o, Job):
            return {"job_name": o.name, "job_operations": self.default(o.operations)}
        if isinstance(o, JobShopSchedulingProblemInstance):
            return {
                "jssp_instance_name": o.name,
                "jssp_instance_machines": self.default(o.machines),
                "jssp_instance_jobs": self.default(o.jobs),
            }
        if isinstance(o, UnscheduledOperation):
            return {"unscheduled_operation": self.default(o.operation)}
        if isinstance(o, ScheduledOperation):
            return {
                "scheduled_operation": self.default(o.operation),
                "scheduled_start_time": self.default(o.start_time),
            }
        if isinstance(o, JobShopSchedulingResult):
            return {
                "jssp_result_problem_instance": self.default(o.problem_instance),
                "jssp_result_schedule": self.default(o.schedule),
            }
        return o


class JSSPJSONDecoder(JSONDecoder):
    """Inverse of :class:`JSSPJSONEncoder` via sentinel-key dispatch
    (reference: serialization.py:94-133)."""

    def __init__(self, *args, **kwargs):
        super().__init__(object_hook=self.object_hook, *args, **kwargs)

    def object_hook(self, object_dict):
        if "tuple" in object_dict and len(object_dict) == 1:
            return tuple(object_dict["tuple"])
        if "dict" in object_dict and len(object_dict) == 1:
            return dict(object_dict["dict"])
        if "machine_name" in object_dict:
            return Machine(name=object_dict["machine_name"])
        if "operation_name" in object_dict:
            return Operation(
                name=object_dict["operation_name"],
                job_name=object_dict["operation_job_name"],
                machine=object_dict["operation_machine"],
                processing_duration=object_dict["operation_processing_duration"],
            )
        if "job_name" in object_dict:
            return Job(name=object_dict["job_name"], operations=object_dict["job_operations"])
        if "jssp_instance_name" in object_dict:
            return JobShopSchedulingProblemInstance(
                name=object_dict["jssp_instance_name"],
                machines=object_dict["jssp_instance_machines"],
                jobs=object_dict["jssp_instance_jobs"],
            )
        if "unscheduled_operation" in object_dict:
            return UnscheduledOperation(operation=object_dict["unscheduled_operation"])
        if "scheduled_operation" in object_dict:
            return ScheduledOperation(
                operation=object_dict["scheduled_operation"],
                start_time=object_dict["scheduled_start_time"],
            )
        if "jssp_result_problem_instance" in object_dict:
            return JobShopSchedulingResult(
                problem_instance=object_dict["jssp_result_problem_instance"],
                schedule=object_dict["jssp_result_schedule"],
            )
        return object_dict
