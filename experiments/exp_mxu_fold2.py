"""MXU gate-folding round 2: the cost/accuracy grid needed to decide the
production fold design (follow-up to exp_mxu_fold.py, which pinned
default-precision and HIGHEST costs for the lane and low-row groups).

Open questions this measures:

- ``Precision.HIGH`` (3-pass) cost and accuracy — HIGHEST (6-pass) was
  0.52-0.66x the VPU time; if HIGH is materially cheaper at ~2^-17
  per-matmul error, it may be the right production setting;
- the Gauss 3-multiplication complex matmul (t1=ar@br, t2=ai@bi,
  t3=(ar+ai)@(br+bi)) — saves 25% of matmul passes over the naive 4;
- whether the TOP row group (qubits 14-19 at n=20: block-index bits of
  the [64, 128, 128] row split) lowers at all as a 3D ``dot_general``
  contracting the leading axis, and what it costs;
- accuracy over a production-scale sequence (24 group applications ~ a
  5-layer circuit's fold count): max |prob diff| vs the VPU path.

Run on the TPU: ``python experiments/exp_mxu_fold2.py`` (several minutes
of remote kernel compiles; each variant is one compile).
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
ROWS = 1 << (N_QUBITS - LANE_BITS)   # 8192
BLOCKS = ROWS // LANES               # 64
POP = 32
ITERS = 50
ITERS_ACC = 24  # ~ a 5-layer circuit's fold count (3 groups x 8 layers)

P_D = None
P_HI3 = jax.lax.Precision.HIGH
P_HI6 = jax.lax.Precision.HIGHEST


def _mm(prec):
    return lambda a, b, dims=(((1,), (0,)), ((), ())): jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32, precision=prec
    )


def _complex_apply_naive(ar, ai, br, bi, mm, dims=(((1,), (1,)), ((), ()))):
    """state [R,128] x U [128,128]: new = state @ U^T (contract lanes)."""
    re = mm(ar, br, dims) - mm(ai, bi, dims)
    im = mm(ar, bi, dims) + mm(ai, br, dims)
    return re, im


def _complex_apply_gauss(ar, ai, br, bi, mm, dims=(((1,), (1,)), ((), ()))):
    t1 = mm(ar, br, dims)
    t2 = mm(ai, bi, dims)
    t3 = mm(ar + ai, br + bi, dims)
    return t1 - t2, t3 - t1 - t2


def _variant_kernel(
    angles_ref,   # SMEM [1, 7, 3]
    u_ref,        # VMEM [2, 128, 128] folded lane/row group matrix
    u2_ref,       # VMEM [2, 64, 64] folded top-group matrix (padded tile)
    out_ref,      # VMEM [1, 8, 128] checksum tile
    state_re, state_im,
    *, variant: str, iters: int,
):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
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

    def apply_vpu_g2(_):
        for q in range(2 * LANE_BITS, N_QUBITS):
            _apply_u3_slot(
                state_re, state_im, row_ids, lane_ids, ROWS, q,
                jnp.int32(1), jnp.int32(-1),
                angles_ref[0, q - 2 * LANE_BITS, 0],
                angles_ref[0, q - 2 * LANE_BITS, 1],
                angles_ref[0, q - 2 * LANE_BITS, 2],
            )

    def make_lane(prec, cmul):
        def apply(_):
            re, im = cmul(state_re[:], state_im[:], u_ref[0], u_ref[1], _mm(prec))
            state_re[:] = re
            state_im[:] = im
        return apply

    def make_row(prec, cmul):
        def apply(_):
            mm = _mm(prec)
            dims = (((1,), (0,)), ((), ()))
            for h in range(BLOCKS):
                sl = slice(h * LANES, (h + 1) * LANES)
                re, im = cmul(u_ref[0], u_ref[1], state_re[sl, :], state_im[sl, :],
                              lambda a, b, d=dims: mm(a, b, d))
                state_re[sl, :] = re
                state_im[sl, :] = im
        return apply

    def make_g2(prec, cmul):
        # qubits 14-19 = block-index bits of the [64, 128, 128] row split:
        # new[b, s, l] = sum_b' U2[b, b'] x[b', s, l]
        def apply(_):
            mm = _mm(prec)
            dims = (((1,), (0,)), ((), ()))
            xr = state_re[:].reshape(BLOCKS, LANES, LANES)
            xi = state_im[:].reshape(BLOCKS, LANES, LANES)
            re, im = cmul(u2_ref[0, :BLOCKS, :BLOCKS], u2_ref[1, :BLOCKS, :BLOCKS],
                          xr, xi, lambda a, b, d=dims: mm(a, b, d))
            state_re[:] = re.reshape(ROWS, LANES)
            state_im[:] = im.reshape(ROWS, LANES)
        return apply

    def row_cmul(ur, ui, xr, xi, mm):
        # U @ x ordering (matrix on the left)
        re = mm(ur, xr) - mm(ui, xi)
        im = mm(ur, xi) + mm(ui, xr)
        return re, im

    def row_cmul_gauss(ur, ui, xr, xi, mm):
        t1 = mm(ur, xr)
        t2 = mm(ui, xi)
        t3 = mm(ur + ui, xr + xi)
        return t1 - t2, t3 - t1 - t2

    def lane_naive(prec):
        return make_lane(prec, _complex_apply_naive)

    def lane_gauss(prec):
        return make_lane(prec, _complex_apply_gauss)

    body = {
        "vpu": apply_vpu_lane,
        "vpu_g2": apply_vpu_g2,
        "lane_d": lane_naive(P_D),
        "lane_hi3": lane_naive(P_HI3),
        "lane_hi6": lane_naive(P_HI6),
        "lane_gauss_hi3": lane_gauss(P_HI3),
        "lane_gauss_hi6": lane_gauss(P_HI6),
        "row_hi3": make_row(P_HI3, row_cmul),
        "row_gauss_hi3": make_row(P_HI3, row_cmul_gauss),
        "g2_d": make_g2(P_D, row_cmul),
        "g2_hi3": make_g2(P_HI3, row_cmul),
        "g2_hi6": make_g2(P_HI6, row_cmul),
    }[variant]

    def step(i, carry):
        body(i)
        state_re[:] = state_re[:] * jnp.float32(0.9999)
        state_im[:] = state_im[:] * jnp.float32(0.9999)
        return carry

    jax.lax.fori_loop(0, iters, step, 0)
    prod = state_re[:] * state_re[:] + state_im[:] * state_im[:]
    out_ref[0, :, :] = jnp.sum(prod.reshape(ROWS // 8, 8, LANES), axis=0)


@partial(jax.jit, static_argnames=("variant", "iters"))
def run_variant(angles, u, u2, variant, iters=ITERS):
    kernel = partial(_variant_kernel, variant=variant, iters=iters)
    out = pl.pallas_call(
        kernel,
        grid=(POP,),
        in_specs=[
            pl.BlockSpec((1, 7, 3), lambda p: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, LANES, LANES), lambda p: (0, 0, 0)),
            pl.BlockSpec((2, BLOCKS, BLOCKS), lambda p: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((POP, 8, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROWS, LANES), jnp.float32),
            pltpu.VMEM((ROWS, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(angles, u, u2)
    return jnp.sum(out)


def folded_matrix(angles: np.ndarray, m: int) -> np.ndarray:
    """Kron-fold m U3 gates (qubit j = bit j of the m-bit index) into a
    [2, 2^m, 2^m] re/im matrix."""
    u = np.eye(1, dtype=np.complex128)
    for j in range(m):
        theta, phi, lam = angles[j]
        g = np.array(
            [
                [np.cos(theta / 2), -np.exp(1j * lam) * np.sin(theta / 2)],
                [np.exp(1j * phi) * np.sin(theta / 2), np.exp(1j * (phi + lam)) * np.cos(theta / 2)],
            ]
        )
        u = np.kron(g, u)
    return np.stack([u.real, u.imag]).astype(np.float32)


def main():
    rng = np.random.default_rng(0)
    angles = rng.uniform(0, 2 * np.pi, size=(1, 7, 3)).astype(np.float32)
    u = folded_matrix(angles[0], 7)
    u2 = folded_matrix(angles[0, : N_QUBITS - 2 * LANE_BITS], N_QUBITS - 2 * LANE_BITS)

    variants = [
        "vpu", "vpu_g2",
        "lane_d", "lane_hi3", "lane_hi6", "lane_gauss_hi3", "lane_gauss_hi6",
        "row_hi3", "row_gauss_hi3",
        "g2_d", "g2_hi3", "g2_hi6",
    ]
    results = {}
    checks = {}
    for variant in variants:
        try:
            value = float(run_variant(angles, u, u2, variant))  # compile
        except Exception as exc:
            print(f"{variant:16s}: FAILED TO COMPILE: {type(exc).__name__}: {str(exc)[:200]}")
            continue
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(run_variant(angles, u, u2, variant))
        per_apply = (time.perf_counter() - t0) / reps / ITERS / POP
        results[variant] = per_apply * 1e6
        checks[variant] = value
        print(
            f"{variant:16s}: {per_apply*1e6:8.2f} us per group application "
            f"checksum={value:.4f}"
        )

    if "vpu" in checks:
        print("\nchecksum rel-err vs vpu (lane-group variants, 50 apps):")
        for v in variants:
            if v in checks and v.startswith("lane"):
                print(f"  {v:16s}: {abs(checks[v]-checks['vpu'])/abs(checks['vpu']):.2e}")
    if "vpu_g2" in checks:
        print("checksum rel-err vs vpu_g2 (top-group variants, 50 apps):")
        for v in variants:
            if v in checks and v.startswith("g2"):
                print(f"  {v:16s}: {abs(checks[v]-checks['vpu_g2'])/abs(checks['vpu_g2']):.2e}")


if __name__ == "__main__":
    main()
