"""Decompose the folded energies kernel launch cost (matmul / diag /
baseline) by zeroing pipeline gating tensors; see docs/performance.md
"Fold kernel cost decomposition".  Run on the TPU:
``python experiments/exp_fold_decompose.py``."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from bench import N_QUBITS, build_table, build_workload
from queasars_tpu.sim.fold_pipeline import build_fold_pipeline
from queasars_tpu.sim.pallas_fold_kernels import pallas_energies_exact_folded

packed, z_masks, coeffs = build_workload()
table = jnp.asarray(build_table(z_masks, coeffs, N_QUBITS))
gt, ctrl, ang, lm = packed.gate_types, packed.controls, packed.angles, packed.layer_mask
pipe = jax.tree.map(jnp.asarray, build_fold_pipeline(gt, ctrl, ang, lm, N_QUBITS))

ITERS = 40; REPEATS = 3

def timed_scan(pipe, precision):
    @partial(jax.jit, static_argnames=("iters",))
    def run(pipe, tab, iters):
        def step(c, k):
            p = pipe._replace(factors=pipe.factors + 1e-6 * k.astype(jnp.float32))
            return c + pallas_energies_exact_folded(p, tab, N_QUBITS, precision=precision), None
        out, _ = jax.lax.scan(step, jnp.zeros(pipe.factors.shape[0], jnp.float32), jnp.arange(iters))
        return out
    np.asarray(run(pipe, table, ITERS)); np.asarray(run(pipe, table, ITERS))
    s = time.perf_counter()
    for _ in range(REPEATS): np.asarray(run(pipe, table, ITERS))
    return 1000.0 * (time.perf_counter() - s) / REPEATS / ITERS

zero_cnt = pipe._replace(diag_count=jnp.zeros_like(pipe.diag_count))
zero_act = pipe._replace(group_active=jnp.zeros_like(pipe.group_active))
empty = zero_act._replace(diag_count=jnp.zeros_like(pipe.diag_count))

full = timed_scan(pipe, "high");      print(f"full high : {full:7.2f} ms", flush=True)
nd   = timed_scan(zero_cnt, "high");  print(f"no diag   : {nd:7.2f} ms (diag ~ {full-nd:.2f})", flush=True)
nm   = timed_scan(zero_act, "high");  print(f"no matmul : {nm:7.2f} ms (mm+build ~ {full-nm:.2f})", flush=True)
em   = timed_scan(empty, "high");     print(f"empty     : {em:7.2f} ms (init+epilogue+grid)", flush=True)
