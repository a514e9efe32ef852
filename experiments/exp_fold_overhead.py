"""Pin down the folded kernel's ~175 us/individual of layer-loop
machinery (docs/performance.md "Fold kernel cost decomposition").

Stage-1 findings (this file's first run): launch + operand DMA + plane
init + reshape-sum epilogue together cost only ~25 us/individual
(nothing 24.8 / init 23.5 / init_epi 25.4), while the production kernel
with every body predicated OFF costs ~200 us/individual — so the
overhead is control-flow machinery: ~24 pl.when regions and the diag
fori per individual, ~7 us per region even when NOT taken.

Stage-2 probes (this file now):

- prod full/empty: the production kernel on real / zeroed pipelines
  (in-process reference points; one compile, two datasets)
- regions_trivial: the same 24-region layer-loop skeleton with trivial
  one-vreg bodies, on real / zeroed data -> per-region cost taken and
  not-taken
- fori_trivial: per layer one fori_loop(0, count) with a trivial body,
  real / zeroed data -> per-iteration fori cost
- diag_static: init + 5 diag layers x D=10 UNBRANCHED full-plane slot
  passes + epilogue -> the pure vector+traffic cost of one slot pass
  (dead slots are identity by phase construction, so no predication is
  needed for correctness)
- nowhen_full: the production body with every pl.when removed (groups
  and diag passes applied unconditionally, diag fori kept) -> what the
  kernel costs once region overhead is gone

Run: ``python experiments/exp_fold_overhead.py``.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import N_QUBITS, POPULATION, build_table, build_workload
from queasars_tpu.sim.fold_pipeline import build_fold_pipeline, n_axis_groups
from queasars_tpu.sim.pallas_fold_kernels import (
    LANE_BITS,
    LANES,
    _PRECISIONS,
    _VMEM_LIMIT,
    _apply_diag_pass,
    _apply_kron_layer,
    _packed_accessors,
    _pipeline_specs,
    pallas_energies_exact_folded,
)

ITERS = 40
REPEATS = 3
ROWS = 1 << (N_QUBITS - LANE_BITS)
D_SLOTS = max(N_QUBITS // 2, 1)


def _init_planes(state_re, state_im):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    state_re[:] = jnp.where(
        jnp.logical_and(row_ids == 0, lane_ids == 0), 1.0, 0.0
    ).astype(jnp.float32)
    state_im[:] = jnp.zeros((ROWS, LANES), jnp.float32)


def _epilogue(state_re, state_im, table_ref, out_ref):
    prod = (state_re[:] * state_re[:] + state_im[:] * state_im[:]) * table_ref[:]
    out_ref[0, :, :] = jnp.sum(prod.reshape(ROWS // 8, 8, LANES), axis=0)


def _qubit_bit(q, row_ids, lane_ids):
    q_lane = jnp.clip(q, 0, LANE_BITS - 1)
    q_row = jnp.clip(q - LANE_BITS, 0, 31)
    lane_bit = (lane_ids >> q_lane) & 1
    row_bit = (row_ids >> q_row) & 1
    return jnp.where(q < LANE_BITS, lane_bit, row_bit)


def _kernel(fdata_ref, idata_ref, table_ref, out_ref, state_re, state_im,
            *, variant, n_kron):
    fac, ph, ctrl, tgt, cnt, ga = _packed_accessors(
        fdata_ref, idata_ref, N_QUBITS, n_kron, D_SLOTS
    )
    n_groups = n_axis_groups(N_QUBITS)
    _init_planes(state_re, state_im)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    if variant == "regions_trivial":
        for k in range(n_kron):
            for g in range(n_groups):

                @pl.when(ga(k, g) != 0)
                def _():
                    state_re[0:8, :] = state_re[0:8, :] + 1.0

            if k < n_kron - 1:

                @pl.when(cnt(k) > 0)
                def _():
                    state_im[0:8, :] = state_im[0:8, :] + 1.0

    elif variant == "fori_trivial":
        for k in range(n_kron - 1):
            def body(j, carry):
                state_im[0:8, :] = state_im[0:8, :] + ph(k, j, 0, 0)
                return carry

            jax.lax.fori_loop(0, cnt(k), body, 0)

    elif variant == "diag_static":
        # D unbranched full-plane slot passes per diag layer; dead slots
        # carry identity phases so no predication is needed
        for k in range(n_kron - 1):
            for j in range(D_SLOTS):
                c = ctrl(k, j)
                t = tgt(k, j)
                p0r, p0i = ph(k, j, 0, 0), ph(k, j, 0, 1)
                p1r, p1i = ph(k, j, 1, 0), ph(k, j, 1, 1)
                cbit = _qubit_bit(c, row_ids, lane_ids)
                tbit = _qubit_bit(t, row_ids, lane_ids)
                pr = jnp.where(tbit == 1, p1r, p0r)
                pi = jnp.where(tbit == 1, p1i, p0i)
                re = state_re[:]
                im = state_im[:]
                new_re = pr * re - pi * im
                new_im = pr * im + pi * re
                active = cbit == 1
                state_re[:] = jnp.where(active, new_re, re)
                state_im[:] = jnp.where(active, new_im, im)

    elif variant == "nowhen_full":
        precision = _PRECISIONS["high"]
        from queasars_tpu.sim.pallas_fold_kernels import _build_group_fold, _gauss_mm

        for k in range(n_kron):
            # lane group (unconditional)
            u_re, u_im = _build_group_fold(fac, k, 0, LANE_BITS)
            re, im = _gauss_mm(
                state_re[:], state_im[:], u_re, u_im,
                (((1,), (1,)), ((), ())), precision,
            )
            state_re[:] = re
            state_im[:] = im
            # row group
            m1 = min(LANE_BITS, N_QUBITS - LANE_BITS)
            s1 = 1 << m1
            u_re, u_im = _build_group_fold(fac, k, LANE_BITS, m1)
            for h in range(ROWS // s1):
                sl = slice(h * s1, (h + 1) * s1)
                re, im = _gauss_mm(
                    u_re, u_im, state_re[sl, :], state_im[sl, :],
                    (((1,), (0,)), ((), ())), precision,
                )
                state_re[sl, :] = re
                state_im[sl, :] = im
            # top group
            m2 = N_QUBITS - 2 * LANE_BITS
            blocks = 1 << m2
            u_re, u_im = _build_group_fold(fac, k, 2 * LANE_BITS, m2)
            xr = state_re[:].reshape(blocks, LANES, LANES)
            xi = state_im[:].reshape(blocks, LANES, LANES)
            re, im = _gauss_mm(
                u_re, u_im, xr, xi, (((1,), (0,)), ((), ())), precision
            )
            state_re[:] = re.reshape(ROWS, LANES)
            state_im[:] = im.reshape(ROWS, LANES)
            if k < n_kron - 1:
                _apply_diag_pass(
                    state_re, state_im, row_ids, lane_ids,
                    ctrl, tgt, ph, cnt(k), k, D_SLOTS,
                )
    else:
        raise ValueError(variant)

    _epilogue(state_re, state_im, table_ref, out_ref)


def probe(pipe, table, variant):
    pop = pipe.factors.shape[0]
    in_specs, operands, n_kron, d_slots = _pipeline_specs(pipe)
    assert d_slots == D_SLOTS
    in_specs.append(pl.BlockSpec((ROWS, LANES), lambda p: (0, 0)))
    operands.append(table.reshape(ROWS, LANES))
    return pl.pallas_call(
        partial(_kernel, variant=variant, n_kron=n_kron),
        grid=(pop,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, LANES), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((pop, 8, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROWS, LANES), jnp.float32),
            pltpu.VMEM((ROWS, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*operands).sum(axis=(1, 2))


def timed(pipe, table, fn):
    @partial(jax.jit, static_argnames=("iters",))
    def run(pipe, tab, iters):
        def step(c, k):
            p = pipe._replace(factors=pipe.factors + 1e-6 * k.astype(jnp.float32))
            return c + fn(p, tab), None

        out, _ = jax.lax.scan(
            step, jnp.zeros(pipe.factors.shape[0], jnp.float32), jnp.arange(iters)
        )
        return out

    np.asarray(run(pipe, table, ITERS))
    np.asarray(run(pipe, table, ITERS))
    s = time.perf_counter()
    for _ in range(REPEATS):
        np.asarray(run(pipe, table, ITERS))
    return 1000.0 * (time.perf_counter() - s) / REPEATS / ITERS


def main():
    packed, z_masks, coeffs = build_workload()
    table = jnp.asarray(build_table(z_masks, coeffs, N_QUBITS))
    pipe = jax.tree.map(
        jnp.asarray,
        build_fold_pipeline(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            N_QUBITS,
        ),
    )
    empty = pipe._replace(
        diag_count=jnp.zeros_like(pipe.diag_count),
        group_active=jnp.zeros_like(pipe.group_active),
    )
    ga = np.asarray(pipe.group_active)
    cn = np.asarray(pipe.diag_count)
    print(f"# group_active fraction: {ga.mean():.3f} "
          f"({ga.sum()} of {ga.size}); diag slots used: {cn.sum()} "
          f"({cn.sum() / (cn.shape[0] * cn.shape[1]):.2f}/layer, "
          f"capacity {D_SLOTS})", flush=True)

    prod = lambda p, t: pallas_energies_exact_folded(p, t, N_QUBITS, precision="high")
    for label, data, fn in (
        ("prod full", pipe, prod),
        ("prod empty", empty, prod),
        ("regions full", pipe, lambda p, t: probe(p, t, "regions_trivial")),
        ("regions empty", empty, lambda p, t: probe(p, t, "regions_trivial")),
        ("fori full", pipe, lambda p, t: probe(p, t, "fori_trivial")),
        ("fori empty", empty, lambda p, t: probe(p, t, "fori_trivial")),
        ("diag_static", pipe, lambda p, t: probe(p, t, "diag_static")),
        ("nowhen_full", pipe, lambda p, t: probe(p, t, "nowhen_full")),
    ):
        ms = timed(data, table, fn)
        print(f"{label:14s}: {ms:7.2f} ms/launch "
              f"({ms * 1000 / POPULATION:6.1f} us/individual)", flush=True)

    # value sanity: nowhen_full must equal the production kernel
    got = np.asarray(probe(pipe, table, "nowhen_full"))
    want = np.asarray(prod(pipe, table))
    print(f"# nowhen vs prod: max |diff| = {np.abs(got - want).max():.3e}")


if __name__ == "__main__":
    main()
