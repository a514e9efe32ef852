"""CLI smoke tests (python -m queasars_tpu solve)."""

import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the env var alone is NOT enough on this platform (sitecustomize
    # preloads the TPU plugin and overrides it): --platform cpu applies
    # the jax.config override inside the subprocess
    proc = subprocess.run(
        [sys.executable, "-m", "queasars_tpu", *args, "--platform", "cpu"],
        capture_output=True, text=True, env=env, cwd=REPO_ROOT, timeout=timeout,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_cli_qubo_solve(tmp_path):
    qubo = os.path.join(tmp_path, "qubo.json")
    with open(qubo, "w") as fh:
        json.dump({"quadratic": [[1.0, 0.0], [0.0, -1.0]]}, fh)
    summary = _run(["solve", "--qubo", qubo, "--generations", "2", "--population", "6",
                    "--nft-maxiter", "8"])
    assert summary["generations"] == 2
    assert summary["decoded"]["bits"] == [0, 1]  # optimum x0=0, x1=1


def test_cli_jssp_solve_checkpoint_resume(tmp_path):
    from queasars_tpu.problems.jssp import random_job_shop_scheduling_instance
    from queasars_tpu.problems.jssp.serialization import JSSPJSONEncoder

    instance_path = os.path.join(tmp_path, "instance.json")
    instance = random_job_shop_scheduling_instance(
        "cli", n_jobs=2, n_machines=2, relative_op_amount=1.0, op_duration=1, random_seed=0
    )
    with open(instance_path, "w") as fh:
        json.dump(instance, fh, cls=JSSPJSONEncoder)

    checkpoint = os.path.join(tmp_path, "state.json")
    output = os.path.join(tmp_path, "result.json")
    base = ["solve", "--jssp", instance_path, "--makespan-limit", "3",
            "--population", "6", "--nft-maxiter", "8", "--checkpoint", checkpoint]
    first = _run([*base, "--generations", "2", "--output", output])
    assert first["generations"] == 2
    assert os.path.exists(checkpoint) and os.path.exists(output)

    resumed = _run([*base, "--generations", "3", "--resume"])
    assert resumed["generations"] == 3
    # the resumed run keeps the first run's ledger prefix
    assert resumed["circuit_evaluations"][:2] == first["circuit_evaluations"][:2]

    from queasars_tpu.solver.serialization import (
        EvolvingAnsatzMinimumEigensolverResultJSONDecoder,
    )

    with open(output) as fh:
        result = json.load(fh, cls=EvolvingAnsatzMinimumEigensolverResultJSONDecoder)
    assert result.generations == 2


def test_cli_qneat_solve(tmp_path):
    qubo = os.path.join(tmp_path, "qubo.json")
    with open(qubo, "w") as fh:
        json.dump({"quadratic": [[1.0, 0.0], [0.0, -1.0]]}, fh)
    summary = _run([
        "solve", "--qubo", qubo, "--algorithm", "qneat",
        "--generations", "4", "--population", "8", "--nft-maxiter", "6",
    ])
    assert summary["generations"] == 4
    assert summary["decoded"]["bits"] == [0, 1]
