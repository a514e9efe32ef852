"""Shared pure-JAX population objectives for the batched optimizers.

One function builds the "angles -> energies" objective used inside
optimizer scans, covering the evaluator modes (exact / CVaR / shot-sampled)
with static flags so each (mode, shape) pair compiles exactly once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from queasars_tpu.sim.expectation import (
    cvar_expectation_from_probs,
    cvar_expectation_from_shot_energies,
    expectation_from_probs,
)
from queasars_tpu.sim.sampling import sample_counts, sample_indices
from queasars_tpu.sim.statevector import probabilities


def population_energies(
    gate_types,
    controls,
    angles,
    layer_mask,
    table,
    sorted_energies,
    energy_order,
    alpha,
    keys,
    *,
    n_qubits: int,
    shots: int,
    use_cvar: bool,
    use_shots: bool,
    initial_state=None,
    use_pallas: bool = False,
    use_general: bool = False,
    precision=None,
    fast_shots=None,
    use_mxu: bool | None = None,
    fold_jnp: bool = False,
):
    """Energies [P] for the population at the given angle tensor.

    Static flags select the branch at trace time; unused operands may be
    dummy arrays.  ``keys`` is a per-individual PRNG key array [P, 2],
    consumed when ``use_shots`` or ``precision`` is set — per-individual
    keys (rather than one key split on the fly) keep the random stream
    identical whether the population axis lives on one device or is
    sharded over a mesh.  ``use_pallas`` routes the simulation through the
    fused VMEM kernel (valid only without an initial state).
    ``use_general`` treats the operands as a general (possibly
    non-diagonal) Pauli sum: ``table`` is then
    ``(coeffs_re, coeffs_im, z_masks, x_masks)`` (exact term scan),
    ``(h_re, h_im)`` (exact dense matvec), or — with ``use_shots`` — the
    QWC grouped-measurement operands
    ``(rot_types, rot_angles, tables, const)``.  ``precision`` (a traced
    scalar, or None to disable at trace time) adds per-individual Gaussian
    noise of that standard deviation — a legacy additive-noise hook: since
    round 4 the estimator ``precision`` knob is realized as shot sampling
    (``objective_operands`` emits sampler operands with Aer's
    ceil(p^-2)-shots rule, the reference's noise law,
    circuit_evaluation.py:210-213), so production paths always pass None
    here.  ``fold_jnp`` routes the
    non-Pallas simulation through the differentiable kron-fold applier
    (``simulate_circuits_folded`` — MXU group matmuls instead of per-slot
    passes; the adjoint-gradient optimizer's production engine).
    """

    def _simulate(a, mask, init):
        from queasars_tpu.sim.fold_pipeline import simulate_circuits_folded
        from queasars_tpu.sim.statevector import simulate_circuits as _sim

        if fold_jnp:
            return simulate_circuits_folded(gate_types, controls, a, mask, n_qubits, init)
        return _sim(gate_types, controls, a, mask, n_qubits, init)

    if use_general:
        if use_shots:
            # shot-sampled general Pauli sum = QWC measurement grouping
            # (sim/grouped_sampling.py): ``table`` is the grouped operand
            # tuple (rot_types, rot_angles, tables, const).  This flag
            # combination is unreachable otherwise — the exact general
            # paths below never sample, and the diagonal sampler path
            # never sets use_general.
            from queasars_tpu.sim.grouped_sampling import (
                grouped_energies_from_states,
                grouped_shot_energies_pallas,
            )

            rot_types, rot_angles, group_tables, const = table
            # slot kernels cap at 20; the folded route (one-launch or
            # per-group) reaches the in-VMEM sampler's n=21 cap
            grouped_cap = 21 if mxu_fold_enabled(use_mxu, n_qubits, path="sampler") else 20
            grouped_pallas = (
                use_pallas
                and (initial_state is None or initial_state.ndim == 3)
                and 14 <= n_qubits <= grouped_cap
            )
            if grouped_pallas:
                # one fused simulate+sample launch per group on the
                # rotated circuit (same keys/uniform stream)
                energies = grouped_shot_energies_pallas(
                    gate_types, controls, angles, layer_mask, keys,
                    rot_types, rot_angles, group_tables, const,
                    n_qubits=n_qubits, shots=shots, initial_state=initial_state,
                    use_mxu=use_mxu,
                )
                return _with_precision_noise(energies, keys, precision)
            states = _simulate(angles, layer_mask, initial_state)
            energies = grouped_energies_from_states(
                states, keys, rot_types, rot_angles, group_tables, const, shots=shots
            )
            return _with_precision_noise(energies, keys, precision)
        if len(table) == 2:
            # dense Hermitian matvec (MXU) — see _energies_dense;
            # precision=HIGHEST: the TPU default's single-bf16-pass f32
            # matmul is ~4e-3 relative, far outside the engine gates
            h_re, h_im = table
            states = _simulate(angles, layer_mask, initial_state)
            ar, ai = states[:, 0, :], states[:, 1, :]
            mm = lambda a, b: jnp.dot(
                a, b, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            out_re = mm(ar, h_re.T) - mm(ai, h_im.T)
            out_im = mm(ai, h_re.T) + mm(ar, h_im.T)
            energies = jnp.sum(ar * out_re + ai * out_im, axis=-1)
        else:
            from queasars_tpu.sim.expectation import general_pauli_expectation_real

            coeffs_re, coeffs_im, z_masks, x_masks = table
            states = _simulate(angles, layer_mask, initial_state)
            fn = lambda s: general_pauli_expectation_real(s, coeffs_re, coeffs_im, z_masks, x_masks)
            # lax.map keeps per-individual reductions shape-independent —
            # required for bit-identical trajectories across mesh sizes
            energies = jax.lax.map(fn, states)
        return _with_precision_noise(energies, keys, precision)
    # the fused kernel handles no initial state (|0...0>) or per-individual
    # start states [P, 2, 2^n] (the layer-prefix cache); a *shared* [2, 2^n]
    # start state falls back to the jnp engine
    pallas_ok = use_pallas and (initial_state is None or initial_state.ndim == 3)
    # MXU kron-fold formulation (sim/fold_pipeline.py): whole circuits as
    # group matmuls + diagonal phase passes.  Default-on for supported
    # TPU sizes; opt out via use_mxu=False or QUEASARS_MXU=0
    # (see mxu_fold_enabled).
    mxu_ok = pallas_ok and mxu_fold_enabled(use_mxu, n_qubits)
    if pallas_ok and not mxu_ok and n_qubits > 20:
        # only the folded kernels reach n=21-22; without them the slot
        # kernels cap at 20 and the jnp engine takes over
        pallas_ok = False

    def _fold_pipeline():
        from queasars_tpu.sim.fold_pipeline import build_fold_pipeline

        # absorb_diag: same-group controlled-diagonal phases row-scale
        # their group matmul instead of running full-state passes
        # (~30% of CROT pairs at n=20; measured in
        # experiments/exp_fold_absorb.py, docs/performance.md)
        return build_fold_pipeline(
            gate_types, controls, angles, layer_mask, n_qubits, absorb_diag=True
        )

    if pallas_ok and not use_cvar and not use_shots:
        if mxu_ok:
            from queasars_tpu.sim.pallas_fold_kernels import pallas_energies_exact_folded

            # precision="high" (emulated bf16x3): 2.5e-7 full-circuit
            # state error (40x inside the 1e-5 engine gate) at 1.31x the
            # HIGHEST rate — measured at n=20/pop-32, docs/performance.md
            energies = pallas_energies_exact_folded(
                _fold_pipeline(), table, n_qubits, precision="high",
                initial=initial_state,
            )
        else:
            from queasars_tpu.sim.pallas_kernels import pallas_energies_exact

            energies = pallas_energies_exact(
                gate_types, controls, angles, layer_mask, table, n_qubits, initial=initial_state
            )
        return _with_precision_noise(energies, keys, precision)
    fast_path = use_shots and (pallas_ok if fast_shots is None else fast_shots)
    # the in-VMEM sampler epilogue reaches n=21 on the folded route
    # (round 4: index emission moved the table out of VMEM); the slot
    # sampler keeps its n=20 cap.  At n=22 the folded probs kernel +
    # XLA-side sampling below covers the shot path instead.
    if fast_path and pallas_ok and 14 <= n_qubits <= (21 if mxu_ok else 20):
        # fully in-kernel sampling: simulation AND the hierarchical
        # inverse-CDF run in one kernel, so the probability plane never
        # leaves VMEM — same draw values as sample_indices (frac *
        # total), so the multiset matches up to CDF-rounding boundary
        # flips; the shot-multiset reduction below is shared
        frac = jax.vmap(lambda k: jax.random.uniform(k, (shots,), jnp.float32))(keys)
        if mxu_ok:
            from queasars_tpu.sim.pallas_fold_kernels import (
                pallas_sampled_shot_energies_folded,
            )

            # precision="default" (single-pass bf16 matmuls, 2.5x the
            # slot kernel vs 1.33x at HIGHEST): the ~1e-3 state error is
            # far below the shot noise this path exists to model
            # (1/sqrt(512) ~ 4e-2); exact paths stay at HIGHEST
            shot_energies = pallas_sampled_shot_energies_folded(
                _fold_pipeline(), table, frac, n_qubits, shots,
                precision="default", initial=initial_state,
            )
        else:
            from queasars_tpu.sim.pallas_kernels import pallas_sampled_shot_energies

            shot_energies = pallas_sampled_shot_energies(
                gate_types, controls, angles, layer_mask, table, frac,
                n_qubits, shots, initial=initial_state,
            )
        if use_cvar:
            energies = cvar_expectation_from_shot_energies(shot_energies, alpha)
        else:
            energies = jnp.mean(shot_energies, axis=-1)
        return _with_precision_noise(energies, keys, precision)
    if pallas_ok and mxu_ok:
        from queasars_tpu.sim.pallas_fold_kernels import pallas_population_probs_folded

        probs = pallas_population_probs_folded(
            _fold_pipeline(), n_qubits, precision="high", initial=initial_state
        )
    elif pallas_ok:
        from queasars_tpu.sim.pallas_kernels import pallas_population_probs

        probs = pallas_population_probs(
            gate_types, controls, angles, layer_mask, n_qubits, initial=initial_state
        )
    elif fold_jnp:
        states = _simulate(angles, layer_mask, initial_state)
        probs = states[:, 0, :] ** 2 + states[:, 1, :] ** 2
    else:
        probs = probabilities(gate_types, controls, angles, layer_mask, n_qubits, initial_state)
    if fast_path:
        # shot-multiset fast path: gather the sampled states' energies and
        # reduce over [P, shots] instead of materializing counts and
        # contracting over [P, 2^n].  Identical random stream (same
        # inverse-CDF draws as sample_counts) and identical semantics up
        # to float summation order; default-on alongside the fused kernel
        # (production runs), opt in/out via ``fast_shots``.
        idx = jax.vmap(lambda k, p: sample_indices(k, p, shots))(keys, probs)
        shot_energies = table[idx]
        if use_cvar:
            energies = cvar_expectation_from_shot_energies(shot_energies, alpha)
        else:
            energies = jnp.mean(shot_energies, axis=-1)
        return _with_precision_noise(energies, keys, precision)
    if use_shots:
        counts = jax.vmap(lambda k, p: sample_counts(k, p, shots))(keys, probs)
        probs = counts.astype(jnp.float32) / shots
    if use_cvar:
        energies = cvar_expectation_from_probs(probs, sorted_energies, energy_order, alpha)
    else:
        energies = expectation_from_probs(probs, table)
    return _with_precision_noise(energies, keys, precision)


def slot_kernels_ok(n_qubits: int) -> bool:
    """True when the per-slot VMEM kernels (states / in-kernel sweep)
    support the size on TPU.  ``use_pallas`` operands can be true past
    the slot kernels' n=20 cap — the folded MXU kernels extend the
    probes' exact/probs paths to n=22 — so prefix simulation and the
    in-kernel sweep must check the SLOT kernels' own cap before
    launching one (past it, the jnp engine simulates the prefix and the
    probes still run folded)."""
    from queasars_tpu.sim.pallas_kernels import pallas_supported

    return pallas_supported(n_qubits, "tpu")


def mxu_fold_enabled(
    use_mxu: bool | None,
    n_qubits: int,
    path: str = "exact",
    backend: str | None = None,
) -> bool:
    """Resolve the MXU kron-fold knob: explicit ``use_mxu`` wins, else the
    ``QUEASARS_MXU`` env var (default ON — the folded kernels measured
    1.73x the slot kernel end-to-end at matching 1e-5 accuracy, see
    docs/performance.md); either way the folded kernels must support the
    ``path`` at the size (exact/probs n in [7, 22]; the folded in-VMEM
    sampler caps at 21, the folded in-kernel sweep at 20) and platform
    (TPU)."""
    import os

    from queasars_tpu.sim.pallas_fold_kernels import fold_supported

    if use_mxu is None:
        use_mxu = os.environ.get("QUEASARS_MXU", "1") == "1"
    if not use_mxu:
        return False
    if backend is None:
        import jax as _jax

        backend = _jax.default_backend()
    # interpret-mode tests run the folded kernels on CPU explicitly; the
    # enablement predicate only opts production TPU paths in
    return fold_supported(n_qubits, backend, path)


def _with_precision_noise(energies, keys, precision):
    """Seeded Gaussian noise of std ``precision`` per energy (None = off)."""
    if precision is None:
        return energies
    noise = jax.vmap(lambda k: jax.random.normal(k, (), jnp.float32))(keys)
    return energies + precision * noise


def objective_operands(evaluator):
    """Extract (table, sorted, order, alpha, shots, use_cvar, use_shots,
    initial_state) operands from an evaluator instance for use with
    :func:`population_energies`.

    Supports StatevectorExpectationEvaluator and
    SamplerExpectationEvaluator — diagonal AND general operators on both
    (the reference likewise optimizes through its estimator/sampler
    evaluators, mutation.py:63-75, but is diagonal-only on the sampler).
    """
    from queasars_tpu.sim.evaluators import (
        SamplerExpectationEvaluator,
        StatevectorExpectationEvaluator,
    )

    import jax

    from queasars_tpu.sim.pallas_fold_kernels import fold_supported
    from queasars_tpu.sim.pallas_kernels import pallas_supported

    def _kernel_ok(n_qubits):
        # slot kernels cap at n=20; the folded (MXU) kernels extend the
        # exact/probs paths to n=21 (population_energies falls back to
        # the jnp engine if the fold is opted out at 21)
        backend = jax.default_backend()
        return pallas_supported(n_qubits, backend) or fold_supported(n_qubits, backend)

    dummy = jnp.zeros(1, dtype=jnp.float32)
    dummy_order = jnp.zeros(1, dtype=jnp.int32)
    if isinstance(evaluator, StatevectorExpectationEvaluator):
        if evaluator._precision_sampler is not None:
            # shot-based estimator precision (Aer's ceil(p^-2)-shots rule):
            # the objective IS the sampler objective at that shot count
            return objective_operands(evaluator._precision_sampler)
        if not evaluator._diagonal:
            # general (non-diagonal) Pauli sum: dense MXU matvec for small
            # systems, matrix-free term scan otherwise.  Mesh runs always
            # use the term scan: the tiny-K dense gemm is not bit-stable
            # across batch sizes, which would break the device-count
            # trajectory-identity invariant (parallel/mesh.py).
            if evaluator._dense and evaluator.mesh is None:
                general_table = (evaluator._h_re, evaluator._h_im)
            else:
                general_table = (evaluator._coeffs_re, evaluator._coeffs_im, evaluator._z, evaluator._x)
            return dict(
                table=general_table,
                sorted_energies=dummy,
                energy_order=dummy_order,
                alpha=jnp.float32(1.0),
                shots=0,
                use_cvar=False,
                use_shots=False,
                initial_state=evaluator._initial,
                use_pallas=False,
                use_general=True,
                precision=None,
            )
        use_cvar = evaluator.alpha < 1.0
        return dict(
            table=evaluator._table,
            sorted_energies=evaluator._sorted if use_cvar else dummy,
            energy_order=evaluator._order if use_cvar else dummy_order,
            alpha=jnp.float32(evaluator.alpha),
            shots=0,
            use_cvar=use_cvar,
            use_shots=False,
            initial_state=evaluator._initial,
            use_pallas=(
                evaluator._use_pallas
                and evaluator._initial is None
                and _kernel_ok(evaluator.n_qubits)
            ),
            precision=None,
        )
    if isinstance(evaluator, SamplerExpectationEvaluator):
        if evaluator._grouped is not None:
            # general (non-diagonal) operator: QWC measurement grouping —
            # the objective simulates once and samples every group in its
            # rotated basis (sim/grouped_sampling.py); plain expectation
            # only (grouped CVaR is rejected at evaluator construction)
            return dict(
                table=evaluator._grouped,
                sorted_energies=dummy,
                energy_order=dummy_order,
                alpha=jnp.float32(1.0),
                shots=(
                    evaluator._group_shots
                    if evaluator._group_shots is not None
                    else evaluator.shots
                ),
                use_cvar=False,
                use_shots=True,
                initial_state=evaluator._initial,
                # fused per-group kernel launches (population_energies'
                # grouped branch gates on 14 <= n <= 20 itself)
                use_pallas=(
                    evaluator._use_pallas
                    and evaluator._initial is None
                    and _kernel_ok(evaluator.n_qubits)
                ),
                use_general=True,
                precision=None,
            )
        use_cvar = evaluator.alpha < 1.0
        return dict(
            table=evaluator._table,
            sorted_energies=evaluator._sorted,
            energy_order=evaluator._order,
            alpha=jnp.float32(evaluator.alpha),
            shots=evaluator.shots,
            use_cvar=use_cvar,
            use_shots=True,
            initial_state=evaluator._initial,
            use_pallas=(
                evaluator._use_pallas
                and evaluator._initial is None
                and _kernel_ok(evaluator.n_qubits)
            ),
            precision=None,
        )
    raise TypeError(f"unsupported evaluator type for batched optimization: {type(evaluator)!r}")
