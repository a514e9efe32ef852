"""Hardware probe: does Mosaic lower pltpu.roll with a *dynamic* shift,
on lanes (axis 1) and sublanes (axis 0), and what does it cost vs a
static roll?

Also probes a fori_loop whose trip count is a traced SMEM scalar.

Motivation: the fused kernel visits every (layer, qubit) slot and pays
~70% of a slot's arithmetic even when predicated off (docs/performance.md).
A compacted-gate kernel (loop over the individual's *active* gates only)
needs partner exchanges at a dynamic distance 2^q -- i.e. dynamic roll
shifts -- and a per-individual dynamic trip count.

Run on the TPU: python experiments/exp_dynroll.py
Each pallas_call is a separate remote compile (minutes); results print
as they arrive.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 8192, 128
REPS = 64  # rolls per kernel call (amortizes launch overhead)


def _time(fn, *args, n=5):
    np.asarray(fn(*args))  # warm (compile)
    start = time.perf_counter()
    for _ in range(n):
        np.asarray(fn(*args))
    return (time.perf_counter() - start) / n


def roll_kernel(shifts_ref, x_ref, o_ref, *, axis, dynamic):
    def body(i, acc):
        s = shifts_ref[i] if dynamic else (i % 7) + 1
        return pltpu.roll(acc, s, axis)

    o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])


def build(axis, dynamic):
    kernel = partial(roll_kernel, axis=axis, dynamic=dynamic)
    return jax.jit(
        pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )
    )


def expected(x, shifts, axis, dynamic):
    out = x
    for i in range(REPS):
        s = int(shifts[i]) if dynamic else (i % 7) + 1
        out = np.roll(out, s, axis)
    return out


def dyn_count_kernel(n_ref, x_ref, o_ref):
    def body(i, acc):
        return acc + x_ref[:]

    o_ref[:] = jax.lax.fori_loop(0, n_ref[0], body, jnp.zeros_like(x_ref))


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(ROWS, LANES)).astype(np.float32)
    shifts = rng.integers(1, 8, size=REPS).astype(np.int32)

    for name, axis, dynamic in [
        ("static lane roll", 1, False),
        ("dynamic lane roll", 1, True),
        ("static sublane roll", 0, False),
        ("dynamic sublane roll", 0, True),
    ]:
        try:
            fn = build(axis, dynamic)
            out = np.asarray(fn(shifts, x))
            want = expected(x, shifts, axis, dynamic)
            ok = np.array_equal(out, want)
            t = _time(fn, shifts, x)
            print(f"{name}: ok={ok}  {t / REPS * 1e6:.2f} us/roll  ({t * 1e3:.2f} ms/call)")
        except Exception as exc:
            print(f"{name}: FAILED -> {type(exc).__name__}: {str(exc)[:300]}")

    # dynamic trip count from an SMEM scalar
    try:
        fn = jax.jit(
            pl.pallas_call(
                dyn_count_kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            )
        )
        small = np.ones((8, LANES), np.float32)
        out = np.asarray(fn(np.array([13], np.int32), small))
        print(f"dynamic fori_loop trip count: ok={bool((out == 13).all())}")
    except Exception as exc:
        print(f"dynamic fori_loop trip count: FAILED -> {type(exc).__name__}: {str(exc)[:300]}")


if __name__ == "__main__":
    main()
