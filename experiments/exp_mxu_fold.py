"""MXU gate-folding micro-benchmark (VERDICT r2 item 6: measure the
128x128 per-7-qubit-group reformulation on silicon instead of leaving it
as a paper estimate).

Idea: all single-qubit/controlled gates of one layer acting within a
7-qubit axis group compose into one 128x128 unitary; applying it is a
complex [8192, 128] @ [128, 128] matmul on the MXU instead of per-gate
VPU roll/select passes.  Three kernels, each applying the SAME 7-gate
lane-group workload ``iters`` times to a VMEM-resident 20-qubit plane
pair:

- ``vpu``:   7 sequential predicated U3 lane slots (the production
  kernel's code path);
- ``mxu``:   one folded complex matmul ``state @ U^T`` (U prebuilt on the
  host — the best case, ignoring the fold-construction cost);
- ``vpu_row`` / ``mxu_row``: the same comparison for a 7-gate ROW-axis
  group (qubits 7..13): VPU roll exchanges vs 64 per-block [128,128]
  complex matmuls on the row axis.

Prints per-application microseconds for each variant.  Run on the TPU:
``python experiments/exp_mxu_fold.py`` (several minutes of remote kernel
compiles).
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from queasars_tpu.sim.pallas_kernels import LANES, LANE_BITS, _apply_u3_slot

N_QUBITS = 20
ROWS = 1 << (N_QUBITS - LANE_BITS)
POP = 32
ITERS = 50


def _variant_kernel(
    angles_ref,   # SMEM [1, 7, 3]
    u_ref,        # VMEM [2, 128, 128] folded group matrix (re, im)
    out_ref,      # VMEM [1, 8, 128] checksum tile
    state_re, state_im,
    *, variant: str,
):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    # dense-ish start state so no arithmetic shortcuts apply (iota must
    # be integer in Mosaic; cast then scale)
    state_re[:] = (
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1).astype(jnp.float32)
        * jnp.float32(1e-3) + jnp.float32(1e-4)
    )
    state_im[:] = (
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0).astype(jnp.float32)
        * jnp.float32(1e-5) + jnp.float32(2e-4)
    )

    def apply_vpu_lane(_):
        for q in range(7):
            _apply_u3_slot(
                state_re, state_im, row_ids, lane_ids, ROWS, q,
                jnp.int32(1), jnp.int32(-1),
                angles_ref[0, q, 0], angles_ref[0, q, 1], angles_ref[0, q, 2],
            )

    def apply_vpu_row(_):
        for q in range(LANE_BITS, LANE_BITS + 7):
            _apply_u3_slot(
                state_re, state_im, row_ids, lane_ids, ROWS, q,
                jnp.int32(1), jnp.int32(-1),
                angles_ref[0, q - LANE_BITS, 0],
                angles_ref[0, q - LANE_BITS, 1],
                angles_ref[0, q - LANE_BITS, 2],
            )

    def make_mxu_lane(precision):
        def apply(_):
            re = state_re[:]
            im = state_im[:]
            # new[r, l] = sum_l' state[r, l'] * U[l, l']: contract lane
            # axes directly (the transpose fuses into the matmul)
            mm = lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            new_re = mm(re, u_ref[0]) - mm(im, u_ref[1])
            new_im = mm(re, u_ref[1]) + mm(im, u_ref[0])
            state_re[:] = new_re
            state_im[:] = new_im
        return apply

    def make_mxu_row(precision):
        def apply(_):
            # V on the row axis of each 128-row block: 64 per-block
            # complex matmuls V @ block
            mm = lambda a, b: jnp.dot(
                a, b, preferred_element_type=jnp.float32, precision=precision
            )
            for h in range(ROWS // LANES):
                sl = slice(h * LANES, (h + 1) * LANES)
                re = state_re[sl, :]
                im = state_im[sl, :]
                new_re = mm(u_ref[0], re) - mm(u_ref[1], im)
                new_im = mm(u_ref[0], im) + mm(u_ref[1], re)
                state_re[sl, :] = new_re
                state_im[sl, :] = new_im
        return apply

    body = {
        "vpu": apply_vpu_lane,
        "mxu": make_mxu_lane(None),
        "mxu_hi": make_mxu_lane(jax.lax.Precision.HIGHEST),
        "vpu_row": apply_vpu_row,
        "mxu_row": make_mxu_row(None),
        "mxu_row_hi": make_mxu_row(jax.lax.Precision.HIGHEST),
    }[variant]

    def step(i, carry):
        body(i)
        # renormalize-ish to keep values bounded across iterations
        state_re[:] = state_re[:] * jnp.float32(0.9999)
        state_im[:] = state_im[:] * jnp.float32(0.9999)
        return carry

    jax.lax.fori_loop(0, ITERS, step, 0)
    prod = state_re[:] * state_re[:] + state_im[:] * state_im[:]
    out_ref[0, :, :] = jnp.sum(prod.reshape(ROWS // 8, 8, LANES), axis=0)


@partial(jax.jit, static_argnames=("variant",))
def run_variant(angles, u, variant):
    kernel = partial(_variant_kernel, variant=variant)
    out = pl.pallas_call(
        kernel,
        grid=(POP,),
        in_specs=[
            pl.BlockSpec((1, 7, 3), lambda p: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, LANES, LANES), lambda p: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((POP, 8, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROWS, LANES), jnp.float32),
            pltpu.VMEM((ROWS, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(angles, u)
    return jnp.sum(out)


def folded_matrix(angles: np.ndarray) -> np.ndarray:
    """Kron-fold 7 U3 gates (qubit q = bit q of the 7-bit lane index)
    into a [2, 128, 128] re/im matrix."""
    u = np.eye(1, dtype=np.complex128)
    for q in range(7):
        theta, phi, lam = angles[q]
        g = np.array(
            [
                [np.cos(theta / 2), -np.exp(1j * lam) * np.sin(theta / 2)],
                [np.exp(1j * phi) * np.sin(theta / 2), np.exp(1j * (phi + lam)) * np.cos(theta / 2)],
            ]
        )
        u = np.kron(g, u)  # qubit q is bit q (little-endian)
    return np.stack([u.real, u.imag]).astype(np.float32)


def main():
    rng = np.random.default_rng(0)
    angles = rng.uniform(0, 2 * np.pi, size=(1, 7, 3)).astype(np.float32)
    u = folded_matrix(angles[0])[None]

    results = {}
    for variant in ("vpu", "mxu", "mxu_hi", "vpu_row", "mxu_row", "mxu_row_hi"):
        value = float(run_variant(angles, u[0], variant))  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(run_variant(angles, u[0], variant))
        per_apply = (time.perf_counter() - t0) / reps / ITERS / POP
        results[variant] = per_apply * 1e6
        print(
            f"{variant:8s}: {per_apply*1e6:8.2f} us per 7-gate group application "
            f"({per_apply*1e6/7:.2f} us/gate)  checksum={value:.4f}"
        )

    print()
    print(f"lane group: MXU/VPU = {results['mxu']/results['vpu']:.2f}x time "
          f"(HIGHEST: {results['mxu_hi']/results['vpu']:.2f}x)")
    print(f"row  group: MXU/VPU = {results['mxu_row']/results['vpu_row']:.2f}x time "
          f"(HIGHEST: {results['mxu_row_hi']/results['vpu_row']:.2f}x)")


if __name__ == "__main__":
    main()
