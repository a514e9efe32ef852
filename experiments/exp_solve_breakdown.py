"""Stage-level wall-clock breakdown of the 18-qubit production solve.

Wraps each evolutionary operator (and the evaluator) with timers to show
where the warm 1.27 s goes: device dispatches, optimizer scans, host
genome logic.

Run on the TPU: python experiments/exp_solve_breakdown.py
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from exp_production_solve import build_problem, solve

from queasars_tpu.evolve.base import BaseEvolutionaryOperator


def main() -> None:
    encoder, hamiltonian = build_problem()
    # warm all compiled paths first
    _, cold = solve(hamiltonian)
    print(f"# cold solve {cold:.1f} s (compiles)")

    timings: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    original = BaseEvolutionaryOperator.__subclasses__()

    def wrap(cls):
        inner = cls.apply_operator

        def timed(self, population, *args, **kwargs):
            start = time.perf_counter()
            out = inner(self, population, *args, **kwargs)
            timings[cls.__name__] += time.perf_counter() - start
            counts[cls.__name__] += 1
            return out

        cls.apply_operator = timed
        return inner

    unwrappers = []
    seen = set()
    stack = list(original)
    while stack:
        cls = stack.pop()
        if cls in seen:
            continue
        seen.add(cls)
        stack.extend(cls.__subclasses__())
        if "apply_operator" in cls.__dict__:
            unwrappers.append((cls, wrap(cls)))

    try:
        start = time.perf_counter()
        result, warm = solve(hamiltonian)
        total = time.perf_counter() - start
    finally:
        for cls, inner in unwrappers:
            cls.apply_operator = inner

    print(f"warm solve: {warm:.2f} s total")
    accounted = 0.0
    for name in sorted(timings, key=timings.get, reverse=True):
        print(f"  {name:35s} {timings[name]*1e3:8.1f} ms  ({counts[name]} calls)")
        accounted += timings[name]
    print(f"  {'(outside operators)':35s} {(total - accounted)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
