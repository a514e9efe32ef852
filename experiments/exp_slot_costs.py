"""Re-derive the slot kernel's per-slot costs at the benchmark shape.

All runs reuse ONE compiled shape (pop=32, L=6, n=20) — gate content and
layer masks are data.  Decomposition:

- layers 0..5 active with the benchmark genome -> per-layer slope
- all-ROT genome (20 active gates/layer) vs all-ID genome (20 predicated
  -off slots/layer) at the same layer count -> active vs off per-slot cost

Run on the TPU: python experiments/exp_slot_costs.py
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
from queasars_tpu.sim.pallas_kernels import pallas_energies_exact

SCAN_ITERS = 40
REPEATS = 2
POP, L, N = 32, 6, 20


@partial(jax.jit, static_argnames=("iters",))
def scan(gt, ctrl, ang, lm, tab, iters):
    def step(carry, k):
        e = pallas_energies_exact(gt, ctrl, ang + 0.001 * k.astype(jnp.float32), lm, tab, N)
        return carry + e, None

    out, _ = jax.lax.scan(step, jnp.zeros(ang.shape[0], jnp.float32), jnp.arange(iters))
    return out


def timed(gt, ctrl, ang, lm, tab):
    np.asarray(scan(gt, ctrl, ang, lm, tab, SCAN_ITERS))
    np.asarray(scan(gt, ctrl, ang + np.float32(0.5), lm, tab, SCAN_ITERS))
    start = time.perf_counter()
    for i in range(REPEATS):
        np.asarray(scan(gt, ctrl, ang + np.float32(0.01 * i), lm, tab, SCAN_ITERS))
    return (time.perf_counter() - start) / (REPEATS * SCAN_ITERS)


def main() -> None:
    packed, z_masks, coeffs = bench.build_workload()
    table = jnp.asarray(bench.build_table(z_masks, coeffs, N))
    gt, ctrl, ang = packed.gate_types, packed.controls, packed.angles

    print("# benchmark genome, layers active 0..5 (per batched evaluation):")
    times = []
    for k in range(L + 1):
        lm = np.zeros_like(packed.layer_mask)
        lm[:, :k] = packed.layer_mask[:, :k]
        t = timed(gt, ctrl, ang, lm, table)
        times.append(t)
        active = int(((gt[:, :k] == 1) | (gt[:, :k] == 3)).sum()) / POP
        print(f"  {k} layers: {t * 1e3:7.2f} ms  (avg active gates/ind: {active:.1f})")
    slopes = np.diff(times) * 1e3
    print(f"  per-layer slopes: {[f'{s:.2f}' for s in slopes]} ms")

    # all-ROT vs all-ID content at 5 layers (same shape)
    lm5 = np.zeros_like(packed.layer_mask)
    lm5[:, :5] = True
    rot_gt = np.ones_like(gt)
    rot_ctrl = np.full_like(ctrl, -1)
    t_rot = timed(rot_gt, rot_ctrl, ang, lm5, table)
    id_gt = np.zeros_like(gt)
    t_id = timed(id_gt, rot_ctrl, ang, lm5, table)
    print(f"# all-ROT (100 active slots/ind): {t_rot * 1e3:.2f} ms "
          f"-> {t_rot / (POP * 100) * 1e6:.2f} us per active slot")
    print(f"# all-ID (100 off slots/ind):     {t_id * 1e3:.2f} ms "
          f"-> {t_id / (POP * 100) * 1e6:.2f} us per off slot (incl. shared floor)")

    # CROT-heavy: 10 CU3 pairs per layer
    crot_gt = np.zeros_like(gt)
    crot_ctrl = np.full_like(ctrl, -1)
    for q in range(0, N, 2):
        crot_gt[:, :, q] = 2      # control slot
        crot_gt[:, :, q + 1] = 3  # CU3 target
        crot_ctrl[:, :, q + 1] = q
    t_crot = timed(crot_gt, crot_ctrl, ang, lm5, table)
    print(f"# all-CROT (50 active + 50 ctrl slots/ind): {t_crot * 1e3:.2f} ms")


if __name__ == "__main__":
    main()


def lane_vs_row() -> None:
    packed, z_masks, coeffs = bench.build_workload()
    table = jnp.asarray(bench.build_table(z_masks, coeffs, N))
    ang = packed.angles
    lm5 = np.zeros_like(packed.layer_mask)
    lm5[:, :5] = True
    ctrl = np.full_like(packed.controls, -1)
    t0 = timed(np.zeros_like(packed.gate_types), ctrl, ang, lm5, table)
    lane_gt = np.zeros_like(packed.gate_types)
    lane_gt[:, :, :7] = 1  # ROT on the 7 lane-axis qubits only
    t_lane = timed(lane_gt, ctrl, ang, lm5, table)
    row_gt = np.zeros_like(packed.gate_types)
    row_gt[:, :, 7:14] = 1  # ROT on 7 row-axis qubits only
    t_row = timed(row_gt, ctrl, ang, lm5, table)
    per_lane = (t_lane - t0) / (POP * 35) * 1e6 + 6.8  # vs off-slot swap
    per_row = (t_row - t0) / (POP * 35) * 1e6 + 6.8
    print(f"# 35 lane-axis ROTs/ind: {t_lane * 1e3:.2f} ms -> ~{per_lane:.1f} us/gate (marginal over off)")
    print(f"# 35 row-axis ROTs/ind:  {t_row * 1e3:.2f} ms -> ~{per_row:.1f} us/gate (marginal over off)")


if __name__ == "__main__" and os.environ.get("LANE_VS_ROW") == "1":
    lane_vs_row()
