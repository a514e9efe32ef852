"""Layer-prefix cache shared by the batched optimizers.

When a parameter sweep only touches each individual's LAST real circuit
layer (the EVQELastLayerParameterSearch hot path — always-on first
pipeline stage, reference evqe.py:199-204), the state after the frozen
prefix layers is probe-independent.  The transform here simulates that
prefix once per sweep (per individual) and rewrites the sweep's operands
so every objective evaluation applies a single layer from the cached
per-individual state instead of the whole circuit.

Mathematically identical to the full-circuit objective; float rounding
may differ at the ulp level.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class PrefixTransform:
    """Rewritten sweep operands (single-layer circuit + cached prefix)."""

    gate_types: np.ndarray   # [P, 1, n]
    controls: np.ndarray     # [P, 1, n]
    layer_mask: np.ndarray   # [P, 1] all-True
    angles: np.ndarray       # [P, 1, n, 3] — the optimized layer's slice
    coords: np.ndarray       # layer column remapped to 0
    initial_state: object    # [P, 2, 2^n] cached prefix states
    full_angles: np.ndarray  # the untransformed [P, L, n, 3] tensor
    last_layer: np.ndarray   # [P] optimized layer index

    def merge(self, out_angles: np.ndarray) -> np.ndarray:
        """Scatter the optimized layer slice back into the full tensor."""
        merged = self.full_angles.copy()
        merged[np.arange(merged.shape[0]), self.last_layer] = np.asarray(out_angles)[:, 0]
        return merged


def prefix_enabled(cache_flag, operands, mesh, last_layer) -> bool:
    """Resolve the cache knob: explicit True/False wins; None enables it
    exactly when the fused Pallas path is active (TPU production runs,
    where no committed CPU trajectory fixtures are in play)."""
    if last_layer is None or mesh is not None:
        return False
    if cache_flag is not None:
        return bool(cache_flag)
    return bool(operands.get("use_pallas", False))


def choose_prefix_engine(use_pallas: bool, n_qubits: int, backend=None) -> str:
    """Pick the engine for frozen-prefix simulation (a trace-time choice).

    - ``"pallas"``: the per-slot VMEM states kernel — within its n<=20
      TPU cap, or at any size in the interpreter off the TPU;
    - ``"fold"``: the folded MXU states kernel
      (``pallas_population_states_folded``, n<=22) — past the slot cap
      this is 1.5-2x the jnp engine the fallback previously used, and it
      keeps SPSA/gradient prefix caches from launching an unsupported
      slot kernel at n=21-22;
    - ``"jnp"``: everything else (CPU defaults, fold opted out).
    """
    if not use_pallas:
        return "jnp"
    import jax

    from queasars_tpu.optim.objective import mxu_fold_enabled, slot_kernels_ok

    backend = jax.default_backend() if backend is None else backend
    if slot_kernels_ok(n_qubits) or backend != "tpu":
        return "pallas"
    if mxu_fold_enabled(None, n_qubits, path="exact", backend=backend):
        return "fold"
    return "jnp"


def simulate_prefix_states(
    gate_types, controls, angles, prefix_mask, n_qubits,
    initial_state=None, mode: str = "jnp",
):
    """Simulate the frozen-prefix states on the chosen engine (see
    :func:`choose_prefix_engine`).  The kernel engines handle no shared
    initial state — ``use_pallas`` operands already imply it is None
    (objective.py) — so a non-None ``initial_state`` always routes to
    the jnp engine, which folds it into the prefix."""
    if mode == "pallas" and initial_state is None:
        from queasars_tpu.sim.pallas_kernels import pallas_population_states

        return pallas_population_states(gate_types, controls, angles, prefix_mask, n_qubits)
    if mode == "fold" and initial_state is None:
        import jax

        from queasars_tpu.sim.fold_pipeline import build_fold_pipeline
        from queasars_tpu.sim.pallas_fold_kernels import pallas_population_states_folded

        pipeline = build_fold_pipeline(
            gate_types, controls, angles, prefix_mask, n_qubits, absorb_diag=True
        )
        return pallas_population_states_folded(
            pipeline, n_qubits, precision="high",
            interpret=jax.default_backend() != "tpu",
        )
    from queasars_tpu.sim.statevector import simulate_circuits

    return simulate_circuits(gate_types, controls, angles, prefix_mask, n_qubits, initial_state)


def build_prefix_transform(packed, angles, coords, operands, last_layer) -> PrefixTransform:
    """Simulate the frozen prefix states and rewrite the sweep operands.

    ``operands`` is the :func:`objective_operands` dict (selects the
    engine and carries any shared initial state, which folds into the
    prefix)."""
    gt, ctrl, lm = packed.gate_types, packed.controls, packed.layer_mask
    a_full = np.asarray(angles)
    ll = np.asarray(last_layer, np.int32)
    prefix_mask = np.logical_and(lm, np.arange(packed.max_layers)[None, :] < ll[:, None])
    mode = choose_prefix_engine(operands.get("use_pallas", False), packed.n_qubits)
    prefix = simulate_prefix_states(
        gt, ctrl, a_full, prefix_mask, packed.n_qubits,
        initial_state=operands["initial_state"], mode=mode,
    )
    coords1 = np.asarray(coords).copy()
    coords1[:, :, 0] = 0
    return PrefixTransform(
        gate_types=np.take_along_axis(gt, ll[:, None, None], axis=1),
        controls=np.take_along_axis(ctrl, ll[:, None, None], axis=1),
        layer_mask=np.ones((packed.n_individuals, 1), dtype=bool),
        angles=np.take_along_axis(a_full, ll[:, None, None, None], axis=1),
        coords=coords1,
        initial_state=prefix,
        full_angles=a_full,
        last_layer=ll,
    )
