"""JSSP data-model validation tests.

Port of the reference's exhaustive constructor-validation and schedule
validity/makespan tests (test/job_shop_scheduling/test_problem_instances.py).
"""

import pytest

from queasars_tpu.problems.jssp import (
    Job,
    JobShopSchedulingProblemException,
    JobShopSchedulingProblemInstance,
    JobShopSchedulingResult,
    Machine,
    Operation,
    ScheduledOperation,
    UnscheduledOperation,
)

from tests.jssp_fixtures import invalid_result, problem_instance, valid_result


M1 = Machine("m1")
M2 = Machine("m2")


def op(name="op", job="j", machine=M1, duration=1):
    return Operation(name=name, job_name=job, machine=machine, processing_duration=duration)


class TestConstructorValidation:
    def test_machine_empty_name(self):
        with pytest.raises(JobShopSchedulingProblemException):
            Machine("")

    def test_operation_empty_name(self):
        with pytest.raises(JobShopSchedulingProblemException):
            op(name="")

    def test_operation_empty_job_name(self):
        with pytest.raises(JobShopSchedulingProblemException):
            op(job="")

    @pytest.mark.parametrize("duration", [0, -1])
    def test_operation_nonpositive_duration(self, duration):
        with pytest.raises(JobShopSchedulingProblemException):
            op(duration=duration)

    def test_operation_identifier(self):
        assert op(name="a", job="b").identifier == "b_a"

    def test_job_empty_name(self):
        with pytest.raises(JobShopSchedulingProblemException):
            Job(name="", operations=(op(),))

    def test_job_no_operations(self):
        with pytest.raises(JobShopSchedulingProblemException):
            Job(name="j", operations=())

    def test_job_duplicate_operation_identifiers(self):
        with pytest.raises(JobShopSchedulingProblemException):
            Job(name="j", operations=(op(name="a"), op(name="a", machine=M2)))

    def test_job_mismatched_job_name(self):
        with pytest.raises(JobShopSchedulingProblemException):
            Job(name="j", operations=(op(job="other"),))

    def test_job_machine_revisit(self):
        with pytest.raises(JobShopSchedulingProblemException):
            Job(name="j", operations=(op(name="a"), op(name="b")))

    def test_instance_empty_name(self):
        with pytest.raises(JobShopSchedulingProblemException):
            JobShopSchedulingProblemInstance(name="", machines=(M1,), jobs=())

    def test_instance_duplicate_machines(self):
        with pytest.raises(JobShopSchedulingProblemException):
            JobShopSchedulingProblemInstance(name="i", machines=(M1, Machine("m1")), jobs=())

    def test_instance_duplicate_job_names(self):
        j1 = Job(name="j", operations=(op(),))
        j2 = Job(name="j", operations=(op(machine=M2),))
        with pytest.raises(JobShopSchedulingProblemException):
            JobShopSchedulingProblemInstance(name="i", machines=(M1, M2), jobs=(j1, j2))

    def test_instance_job_uses_undeclared_machine(self):
        j1 = Job(name="j", operations=(op(machine=M2),))
        with pytest.raises(JobShopSchedulingProblemException):
            JobShopSchedulingProblemInstance(name="i", machines=(M1,), jobs=(j1,))

    def test_result_wrong_jobs(self):
        instance = problem_instance()
        with pytest.raises(JobShopSchedulingProblemException):
            JobShopSchedulingResult(problem_instance=instance, schedule={})

    def test_result_wrong_operation_order(self):
        instance = problem_instance()
        schedule = {}
        for job in instance.jobs:
            schedule[job] = tuple(
                ScheduledOperation(operation=o, start_time=0) for o in reversed(job.operations)
            )
        with pytest.raises(JobShopSchedulingProblemException):
            JobShopSchedulingResult(problem_instance=instance, schedule=schedule)


class TestScheduleValidity:
    def test_valid_result(self):
        result = valid_result()
        assert result.is_valid
        assert result.makespan == 2
        assert result.valid_schedule is result.schedule

    def test_invalid_result_with_unscheduled_operation(self):
        result = invalid_result()
        assert not result.is_valid
        assert result.makespan is None
        with pytest.raises(JobShopSchedulingProblemException):
            _ = result.valid_schedule

    def test_job_order_violation_invalid(self):
        instance = problem_instance()
        j1, j2 = instance.jobs
        schedule = {
            j1: (
                ScheduledOperation(operation=j1.operations[0], start_time=1),
                ScheduledOperation(operation=j1.operations[1], start_time=0),
            ),
            j2: (
                ScheduledOperation(operation=j2.operations[0], start_time=2),
                ScheduledOperation(operation=j2.operations[1], start_time=3),
            ),
        }
        assert not JobShopSchedulingResult(problem_instance=instance, schedule=schedule).is_valid

    def test_machine_overlap_invalid(self):
        instance = problem_instance()
        j1, j2 = instance.jobs
        # j1.op1 on m1 at t=0 and j2.op4 on m1 at t=0 overlap
        schedule = {
            j1: (
                ScheduledOperation(operation=j1.operations[0], start_time=0),
                ScheduledOperation(operation=j1.operations[1], start_time=1),
            ),
            j2: (
                ScheduledOperation(operation=j2.operations[0], start_time=0),
                ScheduledOperation(operation=j2.operations[1], start_time=0),
            ),
        }
        result = JobShopSchedulingResult(problem_instance=instance, schedule=schedule)
        assert not result.is_valid

    def test_unscheduled_flags(self):
        o = op()
        assert not UnscheduledOperation(operation=o).is_scheduled
        scheduled = ScheduledOperation(operation=o, start_time=3)
        assert scheduled.is_scheduled
        assert scheduled.end_time == 4
