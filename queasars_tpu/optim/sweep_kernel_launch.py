"""Single-dispatch launchers for the fully-in-kernel last-layer NFT sweep.

Chains prefix simulation and the whole-maxiter sweep kernel inside ONE
jitted program, so the production last-layer search costs exactly one
host->device dispatch.  Two variants share the contract:

- slot (``nft_layer_sweep_launch``): ``pallas_population_states`` +
  ``pallas_nft_layer_sweep`` — per-slot VPU probe application;
- folded (``nft_layer_sweep_folded_launch``): the kron-fold MXU pipeline
  (``pallas_population_states_folded`` + ``pallas_nft_layer_sweep_folded``)
  — each probe applies the swept layer as two group matmuls plus a phase
  pass, with the layer's fold factors rebuilt in-kernel as angles move.

Off the TPU the kernels run in the Pallas interpreter (CPU testing).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from queasars_tpu.sim.pallas_kernels import (
    pallas_nft_layer_sweep,
    pallas_population_states,
)


@partial(
    jax.jit,
    static_argnames=("n_qubits", "maxiter", "reset_interval", "interpret"),
)
def _launch(
    gate_types, controls, angles, prefix_mask, last_layer, coords_qa,
    n_free, active, table,
    *, n_qubits: int, maxiter: int, reset_interval: int, interpret: bool,
):
    prefix = pallas_population_states(
        gate_types, controls, angles, prefix_mask, n_qubits, interpret=interpret
    )
    ll = last_layer[:, None, None]
    gate1 = jnp.take_along_axis(gate_types, ll, axis=1)[:, 0]
    ctrl1 = jnp.take_along_axis(controls, ll, axis=1)[:, 0]
    angles1 = jnp.take_along_axis(angles, ll[..., None], axis=1)[:, 0]
    return pallas_nft_layer_sweep(
        gate1, ctrl1, angles1, coords_qa, n_free, active, prefix, table,
        n_qubits, maxiter, reset_interval, interpret=interpret,
    )


def nft_layer_sweep_launch(
    gate_types, controls, angles, layer_mask, last_layer, coords_qa,
    n_free, active, table,
    *, n_qubits: int, maxiter: int, reset_interval: int,
):
    """Host entry: build the prefix mask and run the fused launch.

    :return: (optimized layer angles [P, n, 3], final energies [P])
    """
    prefix_mask = np.logical_and(
        np.asarray(layer_mask),
        np.arange(np.asarray(layer_mask).shape[1])[None, :] < last_layer[:, None],
    )
    interpret = jax.default_backend() != "tpu"
    return _launch(
        np.asarray(gate_types), np.asarray(controls), np.asarray(angles),
        prefix_mask, np.asarray(last_layer, np.int32),
        np.asarray(coords_qa, np.int32), np.asarray(n_free, np.int32),
        np.asarray(active, bool), jnp.asarray(table),
        n_qubits=n_qubits, maxiter=maxiter, reset_interval=reset_interval,
        interpret=interpret,
    )


@partial(
    jax.jit,
    static_argnames=("n_qubits", "maxiter", "reset_interval", "precision", "interpret"),
)
def _launch_folded(
    gate_types, controls, angles, prefix_mask, last_layer, coords_qa,
    n_free, active, table,
    diag_ctrl, diag_tgt, slot_of_q, diag_count, group_active,
    *,
    n_qubits: int, maxiter: int, reset_interval: int,
    precision: str, interpret: bool,
):
    from queasars_tpu.sim.fold_pipeline import build_fold_pipeline
    from queasars_tpu.sim.pallas_fold_kernels import (
        pallas_nft_layer_sweep_folded,
        pallas_population_states_folded,
    )

    pipeline = build_fold_pipeline(
        gate_types, controls, angles, prefix_mask, n_qubits, absorb_diag=True
    )
    prefix = pallas_population_states_folded(
        pipeline, n_qubits, precision=precision, interpret=interpret
    )
    ll = last_layer[:, None, None]
    gate1 = jnp.take_along_axis(gate_types, ll, axis=1)[:, 0]
    angles1 = jnp.take_along_axis(angles, ll[..., None], axis=1)[:, 0]
    return pallas_nft_layer_sweep_folded(
        gate1, angles1, coords_qa, n_free, active, prefix, table,
        diag_ctrl, diag_tgt, slot_of_q, diag_count, group_active,
        n_qubits, maxiter, reset_interval,
        precision=precision, interpret=interpret,
    )


def nft_layer_sweep_folded_launch(
    gate_types, controls, angles, layer_mask, last_layer, coords_qa,
    n_free, active, table,
    *, n_qubits: int, maxiter: int, reset_interval: int,
    precision: str = "high",
):
    """Host entry for the FOLDED in-kernel sweep: prefix states via the
    folded MXU states kernel, then the whole sweep with folded probes.
    The swept layer's diag/group metadata is static during the sweep and
    precomputed here (``fold_sweep_metadata``).

    :return: (optimized layer angles [P, n, 3], final energies [P])
    """
    from queasars_tpu.sim.pallas_fold_kernels import fold_sweep_metadata

    gate_types = np.asarray(gate_types)
    controls = np.asarray(controls)
    last_layer = np.asarray(last_layer, np.int32)
    layer_mask = np.asarray(layer_mask)
    prefix_mask = np.logical_and(
        layer_mask,
        np.arange(layer_mask.shape[1])[None, :] < last_layer[:, None],
    )
    pop_idx = np.arange(gate_types.shape[0])
    gate1 = gate_types[pop_idx, last_layer]
    ctrl1 = controls[pop_idx, last_layer]
    meta = fold_sweep_metadata(gate1, ctrl1, n_qubits)
    interpret = jax.default_backend() != "tpu"
    return _launch_folded(
        gate_types, controls, np.asarray(angles), prefix_mask, last_layer,
        np.asarray(coords_qa, np.int32), np.asarray(n_free, np.int32),
        np.asarray(active, bool), jnp.asarray(table), *meta,
        n_qubits=n_qubits, maxiter=maxiter, reset_interval=reset_interval,
        precision=precision, interpret=interpret,
    )
