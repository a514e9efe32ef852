"""Hardware measurement: compacted-gate kernel vs the slot kernel at the
benchmark shape (n=20, pop=32, 5 real layers, 512-term table).

Run on the TPU: python experiments/exp_compact.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench
from queasars_tpu.sim.compact_kernels import compact_energies_exact, compact_gates
from queasars_tpu.sim.pallas_kernels import pallas_energies_exact

SCAN_ITERS = 40
REPEATS = 3


def main() -> None:
    packed, z_masks, coeffs = bench.build_workload()
    table = jnp.asarray(bench.build_table(z_masks, coeffs, bench.N_QUBITS))
    n = bench.N_QUBITS
    cg = compact_gates(packed.gate_types, packed.controls, packed.layer_mask, n)
    counts = cg.boundaries[:, -1]
    print(f"# active gates per individual: min={counts.min()} max={counts.max()} "
          f"mean={counts.mean():.1f} (padded G={cg.max_gates}; slot kernel visits "
          f"{packed.max_layers * n})")

    # correctness on hardware vs the slot kernel
    e_slot = np.asarray(
        pallas_energies_exact(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, table, n
        )
    )
    e_compact = np.asarray(compact_energies_exact(cg, packed.angles, table))
    err = np.abs(e_slot - e_compact).max()
    print(f"# compact vs slot energies max|diff| = {err:.3e}")
    assert err < 1e-4, "compact kernel disagrees on hardware"

    @partial(jax.jit, static_argnames=("iters",))
    def scan_compact(qubits, controls, angle_index, boundaries, angles, tab, iters):
        flat = angles.reshape(angles.shape[0], -1, 3)

        def step(carry, k):
            ga = jnp.take_along_axis(
                flat + 0.001 * k.astype(jnp.float32), angle_index[:, :, None], axis=1
            )
            from queasars_tpu.sim.compact_kernels import _compact_energies_call

            e = _compact_energies_call(
                qubits, controls, ga, boundaries, tab, n, cg.n_layers
            )
            return carry + e, None

        out, _ = jax.lax.scan(step, jnp.zeros(angles.shape[0], jnp.float32), jnp.arange(iters))
        return out

    args = (cg.qubits, cg.controls, cg.angle_index, cg.boundaries)

    def run(i):
        return np.asarray(
            scan_compact(*args, packed.angles + np.float32(0.01 * i), table, SCAN_ITERS)
        )

    run(0)  # compile
    run(1)  # warm
    start = time.perf_counter()
    for i in range(REPEATS):
        run(i + 2)
    elapsed = time.perf_counter() - start
    rate = bench.POPULATION * REPEATS * SCAN_ITERS / elapsed
    print(f"compact kernel sustained: {rate:.1f} evals/s")

    # slot-kernel reference on the same machine state
    slot_rate = bench.measure_rate(packed, np.asarray(table), repeats=REPEATS)
    print(f"slot kernel sustained:    {slot_rate:.1f} evals/s")
    print(f"speedup: {rate / slot_rate:.2f}x")


if __name__ == "__main__":
    main()
