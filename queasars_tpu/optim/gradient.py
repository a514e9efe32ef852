"""Batched gradient-descent (Adam/SGD) optimizer via adjoint autodiff.

Beyond-reference capability: the reference's optimizer surface is the
gradient-free qiskit-algorithms trio (NFT/SPSA/COBYLA, consumed at
mutation.py:77-81) because its simulator is an opaque RPC endpoint.
Here the simulator is a differentiable JAX program, so exact analytic
gradients of <psi(theta)|H|psi(theta)> come from one adjoint
(reverse-mode) pass — no parameter-shift probes, no stochastic
perturbation.  The whole population descends in lock-step under one
``lax.scan``; the free-parameter subset per individual is the same
[P, K, 3] coordinate table the NFT/SPSA batchers use.

Scope: differentiable objectives only — the exact estimator path
(diagonal or general Pauli sums, optionally with the CVaR tail and/or
Gaussian precision noise, whose gradient contribution is exactly zero).
Shot-sampled objectives are not differentiable; ``minimize`` raises and
points at :class:`~queasars_tpu.optim.spsa.BatchedSPSA`.  The objective
always runs on the jnp engine (the fused Pallas kernels define no VJP);
the layer-prefix cache is still available for last-layer sweeps.

Evaluation-ledger accounting: one Adam step costs a forward plus an
adjoint pass; the ledger charges 2 reference-equivalent evaluations per
step (``GradientDescentConfig.n_circuit_evaluations``), mirroring the
2-evaluations-per-step convention of the SPSA ledger.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim.objective import objective_operands, population_energies


@dataclass(frozen=True)
class GradientDescentConfig:
    """Adam/SGD hyperparameters.

    :param maxiter: gradient steps (each one forward + one adjoint pass)
    :param learning_rate: step size (Adam default 0.05 suits the
        [0, 2pi) angle scale of U3/CU3 parameters)
    :param b1 / b2 / eps: Adam moment decays and denominator floor
        (ignored for ``method="sgd"``)
    :param method: ``"adam"`` or ``"sgd"``
    :param cache_prefix: layer-prefix cache for last-layer-only sweeps
        (same semantics as :class:`~queasars_tpu.optim.nft.NFTConfig`)
    :param use_fold: route the differentiable objective through the
        kron-fold applier (``sim/fold_pipeline.py::simulate_circuits_folded``
        — MXU group matmuls for both the forward and the adjoint pass,
        instead of per-slot elementwise passes).  None = off: measured
        1.27x SLOWER than the slot adjoint at the bench shape (the
        per-step fold rebuild differentiates the eigendecomposition
        chain, which XLA cannot amortize — adjoint-vs-NFT table in
        docs/performance.md), so the fold objective is opt-in.
    """

    maxiter: int = 100
    learning_rate: float = 0.05
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    method: str = "adam"
    cache_prefix: Optional[bool] = None
    use_fold: Optional[bool] = None

    def __post_init__(self):
        if self.method not in ("adam", "sgd"):
            raise ValueError(f"method must be 'adam' or 'sgd', got {self.method!r}")
        if self.maxiter < 1:
            raise ValueError("maxiter must be >= 1")
        if self.learning_rate <= 0.0:
            raise ValueError("learning_rate must be positive")

    def n_circuit_evaluations(self) -> int:
        return 2 * self.maxiter


@partial(
    jax.jit,
    static_argnames=("n_qubits", "maxiter", "use_cvar", "use_general", "method", "fold_jnp"),
)
def _gradient_scan(
    gate_types, controls, layer_mask, angles, coords, coord_mask, active,
    table, sorted_energies, energy_order, alpha, pop_keys, initial_state,
    lr, b1, b2, eps,
    precision=None,
    *, n_qubits, maxiter, use_cvar, use_general, method, fold_jnp=False,
):
    """Adam/SGD over a per-individual free-parameter vector theta [P, K].

    ``theta`` accumulates the total shift applied at each individual's
    coordinate table; differentiating with respect to theta (rather than
    the full angle tensor) keeps padded coordinate slots inert — their
    mask zeroes both the forward contribution and the gradient.
    """
    pop = gate_types.shape[0]
    pop_idx = jnp.arange(pop)[:, None]
    l, q, a_i = coords[..., 0], coords[..., 1], coords[..., 2]
    act = active.astype(jnp.float32)[:, None] * coord_mask

    def energies(a, keys, fold=fold_jnp):
        return population_energies(
            gate_types, controls, a, layer_mask, table, sorted_energies,
            energy_order, alpha, keys, n_qubits=n_qubits, shots=0,
            use_cvar=use_cvar, use_shots=False, initial_state=initial_state,
            use_pallas=False, use_general=use_general, precision=precision,
            fold_jnp=fold,
        )

    def make_grad(fold):
        def loss(theta, keys):
            shifted = angles.at[pop_idx, l, q, a_i].add(theta * coord_mask)
            return jnp.sum(energies(shifted, keys, fold))

        return jax.grad(loss)

    grad_fn = make_grad(fold_jnp)
    # the eigendecomposed fold has no derivative at exactly degenerate
    # CROT angles (a freshly grown layer's zeros: the V/CDiag factors
    # carry kinks that cancel only in the composite), so the FIRST step
    # of a folded descent differentiates through the per-slot engine —
    # one true-gradient step moves every coordinate off the kink, after
    # which the folded adjoint is exact (tests/test_fold_gradient.py).
    grad_warm = make_grad(False) if fold_jnp else grad_fn

    def step(carry, k):
        theta, m, v = carry
        keys = jax.vmap(lambda pk: jax.random.fold_in(pk, k))(pop_keys)
        if fold_jnp:
            g = jax.lax.cond(k == 0, grad_warm, grad_fn, theta, keys) * act
        else:
            g = grad_fn(theta, keys) * act
        if method == "adam":
            m = b1 * m + (1.0 - b1) * g
            v = b2 * v + (1.0 - b2) * g * g
            t = (k + 1).astype(jnp.float32)
            m_hat = m / (1.0 - jnp.power(b1, t))
            v_hat = v / (1.0 - jnp.power(b2, t))
            update = lr * m_hat / (jnp.sqrt(v_hat) + eps)
        else:
            update = lr * g
        theta = theta - update * act
        return (theta, m, v), None

    zeros = jnp.zeros(coords.shape[:2], jnp.float32)
    (theta, _, _), _ = jax.lax.scan(step, (zeros, zeros, zeros), jnp.arange(maxiter))

    out = angles.at[pop_idx, l, q, a_i].add(theta * coord_mask)
    out = jnp.where(active[:, None, None, None], out, angles)
    final_keys = jax.vmap(lambda pk: jax.random.fold_in(pk, 0x7FFFFFFF))(pop_keys)
    return out, energies(out, final_keys)


@partial(
    jax.jit,
    static_argnames=("n_qubits", "maxiter", "use_cvar", "use_general", "method", "fold_jnp"),
)
def _gradient_slots_scan(
    gate_types, controls, layer_mask, angles,
    coords_ps, coord_mask_ps, active_ps, slot_layer_ps, pop_keys_ps,
    table, sorted_energies, energy_order, alpha, initial_state,
    lr, b1, b2, eps,
    precision=None,
    *, n_qubits, maxiter, use_cvar, use_general, method, fold_jnp=False,
):
    """Fused multi-slot Adam/SGD (the EVQEParameterSearch shape): scan over
    layer slots; each slot descends from its cached layer-prefix state with
    adjoint gradients flowing through the suffix layers only.  Slot arrays
    are [P, S, ...] (pop on axis 0 for population-mesh sharding) — see
    :func:`~queasars_tpu.optim.nft._nft_slots_scan`."""
    from queasars_tpu.sim.fold_pipeline import simulate_circuits_folded
    from queasars_tpu.sim.statevector import simulate_circuits

    simulate = simulate_circuits_folded if fold_jnp else simulate_circuits
    pop = gate_types.shape[0]
    pop_idx = jnp.arange(pop)[:, None]
    max_layers = gate_types.shape[1]
    layer_idx = jnp.arange(max_layers)

    def slot_body(angles_s, xs):
        coords, coord_mask, active, keys, slot_layer = xs
        prefix_mask = jnp.logical_and(layer_mask, layer_idx[None, :] < slot_layer[:, None])
        suffix_mask = jnp.logical_and(layer_mask, layer_idx[None, :] >= slot_layer[:, None])
        prefix_state = simulate(
            gate_types, controls, angles_s, prefix_mask, n_qubits, initial_state
        )

        l, q, a_i = coords[..., 0], coords[..., 1], coords[..., 2]
        act = active.astype(jnp.float32)[:, None] * coord_mask

        def energies(a, ks, fold=fold_jnp):
            return population_energies(
                gate_types, controls, a, suffix_mask, table, sorted_energies,
                energy_order, alpha, ks, n_qubits=n_qubits, shots=0,
                use_cvar=use_cvar, use_shots=False, initial_state=prefix_state,
                use_pallas=False, use_general=use_general, precision=precision,
                fold_jnp=fold,
            )

        def make_grad(fold):
            def loss(theta, ks):
                shifted = angles_s.at[pop_idx, l, q, a_i].add(theta * coord_mask)
                return jnp.sum(energies(shifted, ks, fold))

            return jax.grad(loss)

        grad_fn = make_grad(fold_jnp)
        grad_warm = make_grad(False) if fold_jnp else grad_fn  # kink warmup

        def step(carry, k):
            theta, m, v = carry
            ks = jax.vmap(lambda pk: jax.random.fold_in(pk, k))(keys)
            if fold_jnp:
                g = jax.lax.cond(k == 0, grad_warm, grad_fn, theta, ks) * act
            else:
                g = grad_fn(theta, ks) * act
            if method == "adam":
                m_n = b1 * m + (1.0 - b1) * g
                v_n = b2 * v + (1.0 - b2) * g * g
                t = (k + 1).astype(jnp.float32)
                update = lr * (m_n / (1.0 - jnp.power(b1, t))) / (
                    jnp.sqrt(v_n / (1.0 - jnp.power(b2, t))) + eps
                )
            else:
                m_n, v_n = m, v
                update = lr * g
            return (theta - update * act, m_n, v_n), None

        zeros = jnp.zeros(coords.shape[:2], jnp.float32)
        (theta, _, _), _ = jax.lax.scan(step, (zeros, zeros, zeros), jnp.arange(maxiter))
        return angles_s.at[pop_idx, l, q, a_i].add(theta * act), None

    xs = (
        jnp.swapaxes(coords_ps, 0, 1),
        jnp.swapaxes(coord_mask_ps, 0, 1),
        jnp.swapaxes(active_ps, 0, 1),
        jnp.swapaxes(pop_keys_ps, 0, 1),
        jnp.swapaxes(slot_layer_ps, 0, 1),
    )
    angles, _ = jax.lax.scan(slot_body, angles, xs)
    final_keys = jax.vmap(lambda pk: jax.random.fold_in(pk, 0x7FFFFFFF))(pop_keys_ps[:, -1])
    final = population_energies(
        gate_types, controls, angles, layer_mask, table, sorted_energies, energy_order,
        alpha, final_keys, n_qubits=n_qubits, shots=0, use_cvar=use_cvar,
        use_shots=False, initial_state=initial_state, use_pallas=False,
        use_general=use_general, precision=precision, fold_jnp=fold_jnp,
    )
    return angles, final


class BatchedGradientDescent:
    """Population-lock-step Adam/SGD against a differentiable evaluator."""

    def __init__(self, config: GradientDescentConfig = GradientDescentConfig()):
        self.config = config

    def _fold_jnp(self, n_qubits: int) -> bool:
        """Resolve the kron-fold objective knob.  Default OFF: measured
        slower than the slot adjoint at the bench shape (the per-step
        fold rebuild's differentiated eigendecomposition chain costs
        more than the group matmuls save — docs/performance.md,
        adjoint-vs-NFT table), so the fold objective is explicit opt-in
        unlike the forward-only MXU kernels."""
        if self.config.use_fold is not None:
            return bool(self.config.use_fold)
        return False

    def publishes_exact_energies(self, evaluator) -> bool:
        """The returned energies are a jnp-engine forward at the final
        angles; production evaluators may route Pallas/MXU kernels whose
        floats differ at the 1e-7 level, so selection must re-evaluate."""
        return False

    def minimize(
        self,
        evaluator,
        packed: PackedPopulation,
        coords: np.ndarray,
        n_free: np.ndarray,
        active: np.ndarray,
        angles: Optional[np.ndarray] = None,
        seed: int = 0,
        last_layer: Optional[np.ndarray] = None,
    ) -> tuple[np.ndarray, np.ndarray, int]:
        """Run Adam/SGD over the selected free parameters.

        Same contract as :meth:`~queasars_tpu.optim.nft.BatchedNFT.minimize`.
        """
        cfg = self.config
        a = packed.angles if angles is None else angles
        if coords.shape[1] == 0 or not np.any(np.logical_and(active, n_free > 0)):
            return np.asarray(a), np.asarray(evaluator.evaluate_packed(packed, angles=a)), 0
        try:
            operands = objective_operands(evaluator)
        except TypeError as exc:
            raise ValueError(
                "BatchedGradientDescent needs a differentiable device objective "
                "(StatevectorExpectationEvaluator); black-box bitstring objectives "
                "have no gradient — use BatchedNFT or BatchedSPSA"
            ) from exc
        if operands["use_shots"]:
            raise ValueError(
                "shot-sampled objectives are not differentiable; use BatchedSPSA "
                "(stochastic approximation) or an exact estimator evaluator"
            )
        # the fused kernels define no VJP — the gradient objective always
        # runs the jnp engine (prefix simulation below follows suit)
        operands = {**operands, "use_pallas": False}

        coord_mask = (
            np.arange(coords.shape[1])[None, :] < np.asarray(n_free)[:, None]
        ).astype(np.float32)
        pop_keys = np.asarray(jax.random.split(jax.random.PRNGKey(seed), packed.n_individuals))
        precision = operands.get("precision")
        mesh = getattr(evaluator, "mesh", None)

        from queasars_tpu.optim.prefix import build_prefix_transform, prefix_enabled

        use_prefix = prefix_enabled(cfg.cache_prefix, operands, mesh, last_layer)
        a_in = np.asarray(a)
        coords_in = np.asarray(coords)
        initial = operands["initial_state"]
        if use_prefix:
            transform = build_prefix_transform(packed, a_in, coords_in, operands, last_layer)
            a_in = transform.angles
            coords_in = transform.coords
            initial = transform.initial_state
            structure = (transform.gate_types, transform.controls, transform.layer_mask)
        else:
            structure = (packed.gate_types, packed.controls, packed.layer_mask)

        common = dict(
            n_qubits=packed.n_qubits,
            maxiter=cfg.maxiter,
            use_cvar=operands["use_cvar"],
            use_general=operands.get("use_general", False),
            method=cfg.method,
            fold_jnp=self._fold_jnp(packed.n_qubits),
        )
        hyper = (
            jnp.float32(cfg.learning_rate), jnp.float32(cfg.b1),
            jnp.float32(cfg.b2), jnp.float32(cfg.eps),
        )

        def fn(pop_args, rep_args):
            gt, ctrl, lm, ang, crd, cm, act, keys = pop_args
            tab, se, eo, alpha_v, init, prec = rep_args
            return _gradient_scan(
                gt, ctrl, lm, ang, crd, cm, act, tab, se, eo, alpha_v, keys, init,
                *hyper, prec, **common,
            )

        pop_args = (
            *structure, a_in, coords_in, coord_mask, np.asarray(active), pop_keys,
        )
        rep_args = (
            operands["table"], operands["sorted_energies"], operands["energy_order"],
            operands["alpha"], initial, precision,
        )
        if mesh is None:
            out_angles, energies = fn(pop_args, rep_args)
        else:
            from queasars_tpu.parallel.mesh import (
                pad_population_axis,
                population_pad_multiple,
                run_population_sharded,
            )

            multiple = population_pad_multiple(mesh)
            padded = tuple(pad_population_axis(np.asarray(arr), multiple) for arr in pop_args)
            out = run_population_sharded(mesh, fn, padded, rep_args)
            out_angles, energies = (o[: packed.n_individuals] for o in out)

        out_angles = np.asarray(out_angles)
        if use_prefix:
            out_angles = transform.merge(out_angles)
        return out_angles, np.asarray(energies), self.config.n_circuit_evaluations()

    def minimize_slots(
        self,
        evaluator,
        packed: PackedPopulation,
        coords: np.ndarray,
        n_free: np.ndarray,
        active: np.ndarray,
        slot_layers: np.ndarray,
        angles: Optional[np.ndarray] = None,
        seeds: Optional[np.ndarray] = None,
    ) -> Optional[tuple[np.ndarray, np.ndarray, int]]:
        """Fused multi-slot parameter search — same contract as
        :meth:`~queasars_tpu.optim.nft.BatchedNFT.minimize_slots` (one
        compiled scan over all layer slots, per-slot prefix states,
        adjoint gradients through the suffix only; returns None when the
        fused path does not apply and the per-slot loop should run).
        Enabled by ``cache_prefix=True`` or, by default, exactly when the
        production Pallas path is active (the CPU/jnp default keeps the
        per-slot loop — the committed-fixture invariant every fused path
        honors)."""
        if getattr(evaluator, "nft_minimize", None) is not None:
            return None
        try:
            operands = objective_operands(evaluator)
        except TypeError:
            return None
        if operands["use_shots"]:
            return None  # the per-slot path raises the informative error
        flag = self.config.cache_prefix
        enabled = operands.get("use_pallas", False) if flag is None else bool(flag)
        if not enabled:
            return None
        operands = {**operands, "use_pallas": False}

        cfg = self.config
        a_in = np.asarray(packed.angles if angles is None else angles)
        pop, n_slots = n_free.shape
        seeds = np.zeros(n_slots, np.int64) if seeds is None else np.asarray(seeds)
        keys = np.stack(
            [np.asarray(jax.random.split(jax.random.PRNGKey(int(s)), pop)) for s in seeds],
            axis=1,
        )  # [P, S, 2]
        coord_mask = (
            np.arange(coords.shape[2])[None, None, :] < np.asarray(n_free)[:, :, None]
        ).astype(np.float32)

        static_kwargs = dict(
            n_qubits=packed.n_qubits,
            maxiter=cfg.maxiter,
            use_cvar=operands["use_cvar"],
            use_general=operands.get("use_general", False),
            method=cfg.method,
            fold_jnp=self._fold_jnp(packed.n_qubits),
        )
        hyper = (
            jnp.float32(cfg.learning_rate), jnp.float32(cfg.b1),
            jnp.float32(cfg.b2), jnp.float32(cfg.eps),
        )
        pop_args = (
            packed.gate_types, packed.controls, packed.layer_mask, a_in,
            np.asarray(coords), coord_mask, np.asarray(active),
            np.asarray(slot_layers, np.int32), keys,
        )
        rep_args = (
            operands["table"], operands["sorted_energies"], operands["energy_order"],
            operands["alpha"], operands["initial_state"], operands.get("precision"),
        )

        def fn(pa, ra):
            gt, ctrl, lm, ang, crd, cm, act, sl, ks = pa
            tab, se, eo, alpha_v, init, prec = ra
            return _gradient_slots_scan(
                gt, ctrl, lm, ang, crd, cm, act, sl, ks, tab, se, eo, alpha_v, init,
                *hyper, prec, **static_kwargs,
            )

        mesh = getattr(evaluator, "mesh", None)
        if mesh is None:
            out_angles, energies = fn(pop_args, rep_args)
        else:
            from queasars_tpu.parallel.mesh import (
                pad_population_axis,
                population_pad_multiple,
                run_population_sharded,
            )

            multiple = population_pad_multiple(mesh)
            padded = tuple(pad_population_axis(arr, multiple) for arr in pop_args)
            out_angles, energies = run_population_sharded(mesh, fn, padded, rep_args)
            out_angles = out_angles[: packed.n_individuals]
            energies = energies[: packed.n_individuals]
        return np.asarray(out_angles), np.asarray(energies), cfg.n_circuit_evaluations()
