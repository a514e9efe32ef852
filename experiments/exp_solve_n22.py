"""End-to-end production solves at 21 and 22 qubits on one chip (round 5).

VERDICT r4 weak #2: the fold kernels reach n=22 but no end-to-end solve
past 20 qubits had a measured wall-clock.  This experiment runs the full
EVQE production configuration (fold-kernel estimator path, pop 16,
NFT(30), 3 generations) on single-chip JSSP instances at 21 and 22
qubits, plus the 512-shot CVaR sampler configuration at 21 qubits (the
in-VMEM sampler's cap on the folded route), and reports warm wall-clock
+ reference-equivalent evals/s for the docs BASELINE-configs table.

Run on the TPU: python experiments/exp_solve_n22.py [n]
Each config solves twice; the second (warm) run is the reported number.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from queasars_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()

from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)

from exp_baseline_configs import evqe_config, jssp_with_qubits, run


def main() -> None:
    only = int(sys.argv[1]) if len(sys.argv) > 1 else None

    if only in (None, 21):
        # 21 qubits: 3x3 JSSP (mixed durations reach odd counts)
        seed21, h21 = jssp_with_qubits(
            3, 3, 6, 21, rel=1.0, op_duration={1: 0.5, 2: 0.5}
        )
        run(
            f"6. EVQE 21q 3x3 JSSP pop-16 exact estimator (seed {seed21})",
            lambda: EVQEMinimumEigensolver(
                evqe_config(use_pallas=True, pack_min_layers=6, max_generations=3)
            ),
            h21,
        )
        # sampler production config at the in-VMEM sampler's n=21 cap
        run(
            f"7. EVQE 21q 3x3 JSSP sampler 512-shot CVaR-0.5 (seed {seed21})",
            lambda: EVQEMinimumEigensolver(
                evqe_config(
                    configured_estimator=None,
                    configured_sampler=ConfiguredSampler(shots=512, seed=0),
                    distribution_alpha_tail=0.5,
                    use_tournament_selection=True, tournament_size=2,
                    use_pallas=True, pack_min_layers=6, max_generations=3,
                )
            ),
            h21,
        )

    if only in (None, 22):
        # 22 qubits: the single-chip fold ceiling (exact/probs kernels)
        seed22, h22 = jssp_with_qubits(3, 3, 7, 22, op_duration={1: 0.5, 2: 0.5})
        run(
            f"8. EVQE 22q 3x3 JSSP pop-16 exact estimator (seed {seed22})",
            lambda: EVQEMinimumEigensolver(
                evqe_config(use_pallas=True, pack_min_layers=6, max_generations=3)
            ),
            h22,
        )


if __name__ == "__main__":
    main()
