"""On-hardware numeric check of diag absorption at n=21 / n=22.

The interpret-mode absorb tests stop at n=15 (1-CPU-core budget), so
the two large single-chip fold shapes are pinned here on the real chip
with the production ``absorb_diag=True`` build:

- n=21 — the largest shape whose TOP group may absorb (whole-state
  top-group row-scale); requires at least one absorbed top-group slot
  in the workload.
- n=22 — the sub-kron-split shape: `build_fold_pipeline` must EXCLUDE
  the top group (its two per-sub row-scales cannot host a cross-sub
  diagonal) while lane/row groups keep absorbing; requires at least
  one absorbed lane/row slot and zero absorbed top slots.

Each checks folded probs at the production ``"high"`` precision
against the jnp engine (bench gate criterion, 1e-5).

Run: ``python experiments/exp_absorb_large_n.py [n]`` (n defaults to
21; one remote kernel compile per shape, minutes).  Measured: n=21
max |diff| 4.0e-8 (3 top-group slots absorbed), n=22 max |diff| in
docs/performance.md.
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


def main(n: int):
    individuals = [
        EVQEIndividual.random_individual(n, 4, True, random_seed=s) for s in (3, 4, 5)
    ]
    packed = PackedPopulation.pack(individuals)
    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n,
        absorb_diag=True,
    )
    a_tgt = np.asarray(pipe.abs_tgt)
    n_top = int(np.logical_and(a_tgt >= 2 * LANE_BITS, a_tgt >= 0).sum())
    n_abs = int(np.asarray(pipe.abs_count).sum())
    print(f"n={n}: absorbed slots: {n_abs} total, {n_top} in the top group")
    if n <= 21:
        assert n_top > 0, "workload exercises no top-group absorption"
    else:
        assert n_top == 0, "n=22 must exclude the sub-kron-split top group"
        assert n_abs > 0, "workload exercises no lane/row absorption"

    got = np.asarray(pallas_population_probs_folded(pipe, n, precision="high"))
    want = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    err = float(np.abs(got - want).max())
    print(f"n={n} absorbed fold probs vs engine (high): max |diff| = {err:.3e}")
    assert err < 1e-5, "outside the engine gate"


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 21)
