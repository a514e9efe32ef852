"""Single-dispatch launcher for the fully-in-kernel last-layer NFT sweep.

Chains ``pallas_population_states`` (prefix simulation) and
``pallas_nft_layer_sweep`` (the whole maxiter sweep in one kernel) inside
ONE jitted program, so the production last-layer search costs exactly one
host->device dispatch.  Off the TPU the kernels run in the Pallas
interpreter (CPU testing).
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
