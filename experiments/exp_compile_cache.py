"""Persistent-compilation-cache cold-start deltas (VERDICT r3 item 7).

Measures, in fresh subprocesses on the real chip, the wall-clock of
(a) the n=5 QAOA solve whose Adam scan costs ~362 s to compile cold and
(b) an n=8 fused-slot-kernel evaluation (a remote Pallas compile), each
twice: first with a COLD cache directory, then again warm.  Prints one
JSON line per run.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

CHILD = r"""
import json, os, sys, time
from queasars_tpu.utils.compilation_cache import enable_persistent_cache
enable_persistent_cache(os.environ["EXP_CACHE_DIR"])
import numpy as np
which = os.environ["EXP_WHICH"]
t0 = time.time()
if which == "qaoa":
    from queasars_tpu.problems.qubo import maxcut_hamiltonian
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2)]
    op, _offset = maxcut_hamiltonian(5, edges)
    from queasars_tpu.solver import QAOAConfiguration, QAOAMinimumEigensolver
    result = QAOAMinimumEigensolver(
        QAOAConfiguration(reps=2, n_starts=8, maxiter=150, seed=1)
    ).compute_minimum_eigenvalue(op)
    value = float(result.eigenvalue)
else:
    from queasars_tpu.genome import EVQEPopulation
    from queasars_tpu.genome.packing import PackedPopulation
    from queasars_tpu.sim.pallas_kernels import pallas_population_probs
    pop = EVQEPopulation.random_population(8, 2, 4, True, random_seed=1)
    sp = PackedPopulation.pack(list(pop.individuals))
    value = float(np.asarray(
        pallas_population_probs(sp.gate_types, sp.controls, sp.angles, sp.layer_mask, 8)
    ).sum())
print(json.dumps({"which": which, "wall_s": round(time.time() - t0, 2), "value": value}))
"""


def run(which, cache_dir):
    env = dict(os.environ, EXP_WHICH=which, EXP_CACHE_DIR=cache_dir)
    proc = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, capture_output=True, text=True,
        timeout=1800, cwd="/root/repo",
    )
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(proc.stderr[-2000:])


def main():
    tmp = tempfile.mkdtemp(prefix="jax_cache_exp_")
    try:
        for which in ("qaoa", "pallas"):
            cold = run(which, tmp)
            warm = run(which, tmp)
            print(json.dumps({"workload": which, "cold_s": cold["wall_s"],
                              "warm_s": warm["wall_s"],
                              "speedup": round(cold["wall_s"] / warm["wall_s"], 1)}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
