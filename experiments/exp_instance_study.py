"""Random-instance solution-quality study at experiment scale (round 5).

The reference validates EVQE on ONE anchor instance
(test_evqe_algorithm.py:23-38); the TPU engine's speed makes a real
study feasible: >= 20 seeded random JSSP instances spanning 8-20 qubits,
each solved under two production configurations —

  A. exact estimator (the reference's estimator path), and
  B. 512-shot CVaR-0.5 sampler (the reference's notebook configuration)

— and scored against the exact branch-and-bound oracle
(problems/jssp/exact_solver.py):

- **success**: the likeliest measured bitstring decodes to a VALID
  schedule with the oracle-optimal makespan (the reference's own E2E
  criterion, generalized),
- **valid**: the likeliest bitstring decodes to any valid schedule,
- **evals-to-target**: reference-equivalent circuit evaluations spent up
  to the end of the first generation whose best individual's most
  likely bitstring decodes to an optimal schedule (NaN when never),
- **wall-clock** per solve (warm-process; each qubit count still pays
  its jit compiles once — the jnp TPU engine is used, whose compiles
  are seconds, so the study measures solution quality, not kernel
  speed; bench.py owns the kernel-speed story).

Run on the TPU: python experiments/exp_instance_study.py [--quick] [--budget]
Emits one JSON line per (instance, config) plus a summary table.
``--budget`` is the budget-sensitivity companion: the same instances and
configs but max 12 generations and a 10x tighter change tolerance with 2
allowed consecutive violations — it tests whether the anchor config's
failures are budget failures (the 0.005 criterion fires after ~2
generations) or search failures.
Measured results: docs/performance.md "Random-instance quality study".
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from queasars_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.problems.jssp import JSSPDomainWallHamiltonianEncoder
from queasars_tpu.problems.jssp.exact_solver import solve_jssp_exact
from queasars_tpu.problems.jssp.random_instances import random_job_shop_scheduling_instance
from queasars_tpu.sim.sampling import sample_counts
from queasars_tpu.sim.statevector import probabilities
from queasars_tpu.solver import (
    BestIndividualRelativeChangeTolerance,
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)

#: (n_jobs, n_machines, makespan_limit, op_duration, seeds) families —
#: spans 8-20 qubits with >= 20 instances total
FAMILIES = [
    (2, 2, 4, 1, [0, 1, 2, 3]),
    (2, 2, 5, {1: 0.5, 2: 0.5}, [0, 1, 2]),
    (2, 3, 5, 1, [0, 1, 2, 3]),
    (3, 2, 5, 1, [0, 1, 2]),
    (3, 3, 5, 1, [0, 1, 2, 3]),
    # seeds landing exactly 20 qubits (probed; rel=0.75 mixed durations)
    (3, 3, 6, {1: 0.5, 2: 0.5}, [0, 1, 4, 10]),
]


def build_instances(quick: bool):
    cases = []
    for n_jobs, n_machines, makespan, dur, seeds in FAMILIES:
        for seed in seeds[: 1 if quick else None]:
            instance = random_job_shop_scheduling_instance(
                instance_name=f"study-{n_jobs}x{n_machines}-{seed}",
                n_jobs=n_jobs, n_machines=n_machines, relative_op_amount=1.0
                if isinstance(dur, int) else 0.75,
                op_duration=dur, random_seed=seed,
            )
            exact = solve_jssp_exact(instance)
            if exact is None:
                continue
            optimal_makespan = exact.makespan
            if optimal_makespan > makespan:
                continue  # encoder window cannot host the optimum
            encoder = JSSPDomainWallHamiltonianEncoder(instance, makespan_limit=makespan)
            hamiltonian = encoder.get_problem_hamiltonian()
            if not 8 <= hamiltonian.n_qubits <= 20:
                continue
            cases.append((instance, encoder, hamiltonian, optimal_makespan))
    return cases


def decode_best(encoder, individual):
    """Most likely bitstring of an individual's circuit, decoded."""
    packed = PackedPopulation.pack([individual])
    probs = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            encoder.n_qubits,
        )[0]
    )
    state = int(np.argmax(probs))
    return encoder.translate_result_bitstring(format(state, f"0{encoder.n_qubits}b"))


def solver_config(mode: str, seed: int, budget: bool = False):
    base = dict(
        configured_estimator=ConfiguredEstimator() if mode == "estimator" else None,
        configured_sampler=(
            ConfiguredSampler(shots=512, seed=seed) if mode == "sampler" else None
        ),
        optimizer=BatchedNFT(NFTConfig(maxiter=40)),
        optimizer_n_circuit_evaluations=40,
        max_generations=12 if budget else 10,
        max_circuit_evaluations=None,
        termination_criterion=BestIndividualRelativeChangeTolerance(
            minimum_relative_change=0.0005, allowed_consecutive_violations=2
        )
        if budget
        else BestIndividualRelativeChangeTolerance(minimum_relative_change=0.005),
        random_seed=seed,
        population_size=10,
        randomize_initial_population_parameters=False,
        speciation_genetic_distance_threshold=3,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.24,
        topological_search_probability=0.2,
        layer_removal_probability=0.05,
    )
    if mode == "sampler":
        base["distribution_alpha_tail"] = 0.5
        base["use_tournament_selection"] = True
        base["tournament_size"] = 2
    return EVQEMinimumEigensolverConfiguration(**base)


def run_case(instance, encoder, hamiltonian, optimal_makespan, mode, budget=False):
    start = time.perf_counter()
    result = EVQEMinimumEigensolver(
        solver_config(mode, seed=0, budget=budget)
    ).compute_minimum_eigenvalue(hamiltonian)
    wall = time.perf_counter() - start

    likeliest = max(result.eigenstate.items(), key=lambda kv: kv[1])[0]
    solution = encoder.translate_result_bitstring(
        format(likeliest, f"0{encoder.n_qubits}b")
    )
    valid = solution.is_valid
    success = bool(valid and solution.makespan == optimal_makespan)

    # evals-to-target: ledger total through the first generation whose
    # best individual's likeliest bitstring decodes optimally
    evals_to_target = None
    cumulative = 0
    for gen_idx, evaluation in enumerate(result.population_evaluation_results):
        cumulative = sum(result.circuit_evaluations[: gen_idx + 1])
        generation_solution = decode_best(encoder, evaluation.best_individual)
        if generation_solution.is_valid and generation_solution.makespan == optimal_makespan:
            evals_to_target = cumulative
            break

    return {
        "instance": instance.name,
        "n_qubits": encoder.n_qubits,
        "mode": mode,
        "optimal_makespan": optimal_makespan,
        "valid": bool(valid),
        "success": success,
        "evals_total": int(sum(result.circuit_evaluations)),
        "evals_to_target": evals_to_target,
        "generations": result.generations,
        "wall_s": round(wall, 2),
    }


def main() -> None:
    quick = "--quick" in sys.argv
    budget = "--budget" in sys.argv
    cases = build_instances(quick)
    print(f"# {len(cases)} instances, qubit counts "
          f"{sorted(set(c[2].n_qubits for c in cases))}"
          f"{' (budget config)' if budget else ''}", file=sys.stderr)
    records = []
    for mode in ("estimator", "sampler"):
        for instance, encoder, hamiltonian, optimal in cases:
            record = run_case(instance, encoder, hamiltonian, optimal, mode,
                              budget=budget)
            records.append(record)
            print(json.dumps(record), flush=True)

    for mode in ("estimator", "sampler"):
        sub = [r for r in records if r["mode"] == mode]
        n_success = sum(r["success"] for r in sub)
        n_valid = sum(r["valid"] for r in sub)
        reached = [r["evals_to_target"] for r in sub if r["evals_to_target"]]
        print(
            f"# {mode}: {n_success}/{len(sub)} optimal, {n_valid}/{len(sub)} valid, "
            f"median evals-to-target {int(np.median(reached)) if reached else 'n/a'}, "
            f"median wall {np.median([r['wall_s'] for r in sub]):.1f}s",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
