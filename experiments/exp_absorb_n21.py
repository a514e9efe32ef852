"""On-hardware numeric check of top-group absorption at n=21.

The interpret-mode absorb tests stop at n=15 (1-CPU-core budget), so
the n=21 whole-state top-group row-scale — the largest shape whose top
group may absorb (`build_fold_pipeline` excludes it from n=22's
sub-kron split) — is pinned here on the real chip: folded probs with
``absorb_diag=True`` vs the jnp engine, requiring at least one absorbed
top-group slot in the workload.

Run: ``python experiments/exp_absorb_n21.py`` (one remote kernel
compile, minutes).
"""

from __future__ import annotations

import sys, os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from queasars_tpu.genome.individual import EVQEIndividual
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.sim.fold_pipeline import LANE_BITS, build_fold_pipeline
from queasars_tpu.sim.pallas_fold_kernels import pallas_population_probs_folded
from queasars_tpu.sim.statevector import probabilities

N = 21


def main():
    individuals = [
        EVQEIndividual.random_individual(N, 4, True, random_seed=s) for s in (3, 4, 5)
    ]
    packed = PackedPopulation.pack(individuals)
    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, N,
        absorb_diag=True,
    )
    a_tgt = np.asarray(pipe.abs_tgt)
    n_top = int(np.logical_and(a_tgt >= 2 * LANE_BITS, a_tgt >= 0).sum())
    n_abs = int(np.asarray(pipe.abs_count).sum())
    print(f"absorbed slots: {n_abs} total, {n_top} in the top group")
    assert n_top > 0, "workload exercises no top-group absorption"

    got = np.asarray(pallas_population_probs_folded(pipe, N, precision="high"))
    want = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, N
        )
    )
    err = float(np.abs(got - want).max())
    print(f"n=21 absorbed fold probs vs engine (high): max |diff| = {err:.3e}")
    assert err < 1e-5, "outside the engine gate"


if __name__ == "__main__":
    main()
