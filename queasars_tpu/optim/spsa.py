"""Batched SPSA optimizer.

Population-lock-step simultaneous-perturbation stochastic approximation
with qiskit-SPSA-compatible power-law schedules and calibration:

  a_k = a / (k + 1 + A)^0.602,   c_k = c / (k + 1)^0.101

Each step costs two batched population evaluations.  Supports an optional
:class:`~queasars_tpu.optim.spsa_termination.SPSATerminationChecker` per
individual in host-stepped mode (one jitted step per iteration) — the
reference wires the same checker into qiskit SPSA's callback
(queasars/utility/spsa_termination.py:48-96).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim.objective import objective_operands, population_energies
from queasars_tpu.optim.prefix import choose_prefix_engine, simulate_prefix_states
from queasars_tpu.optim.spsa_termination import SPSATerminationChecker


@dataclass(frozen=True)
class SPSAConfig:
    """SPSA hyperparameters (qiskit-compatible defaults).

    :param maxiter: gradient steps (2 evaluations each)
    :param learning_rate: ``a``; None triggers magnitude calibration
    :param perturbation: ``c``
    :param calibration_steps: evaluation pairs used to calibrate ``a``
    :param alpha_power / gamma_power: schedule exponents
    :param stability_constant: ``A`` in the a_k schedule
    :param cache_prefix: layer-prefix cache for last-layer-only sweeps
        (same semantics as :class:`~queasars_tpu.optim.nft.NFTConfig`;
        applies when no per-individual termination checkers are used)
    """

    maxiter: int = 100
    learning_rate: Optional[float] = None
    perturbation: float = 0.1
    calibration_steps: int = 25
    alpha_power: float = 0.602
    gamma_power: float = 0.101
    stability_constant: float = 0.0
    target_magnitude: float = 2 * np.pi / 10
    cache_prefix: Optional[bool] = None

    def n_circuit_evaluations(self) -> int:
        calibration = 2 * self.calibration_steps if self.learning_rate is None else 0
        return 2 * self.maxiter + calibration


@partial(
    jax.jit,
    static_argnames=(
        "n_qubits", "shots", "use_cvar", "use_shots", "calibration_steps",
        "use_pallas", "use_general",
    ),
)
def _spsa_calibrate(
    gate_types, controls, layer_mask, angles, coords, coord_mask,
    table, sorted_energies, energy_order, alpha, pop_keys, initial_state, c,
    precision=None,
    *, n_qubits, shots, use_cvar, use_shots, calibration_steps, use_pallas=False, use_general=False,
):
    """Average |f(x+c d) - f(x-c d)| over calibration pairs -> [P].

    All randomness (perturbation directions, shot noise) is derived from
    per-individual keys so it is independent of population sharding.
    """
    pop = gate_types.shape[0]
    pop_idx = jnp.arange(pop)[:, None]
    n_coords = coords.shape[1]

    def objective(a, k):
        return population_energies(
            gate_types, controls, a, layer_mask, table, sorted_energies, energy_order,
            alpha, k, n_qubits=n_qubits, shots=shots, use_cvar=use_cvar,
            use_shots=use_shots, initial_state=initial_state, use_pallas=use_pallas,
            use_general=use_general, precision=precision,
        )

    def step(acc, k):
        def probe_keys(probe_id):
            fold = lambda pk: jax.random.fold_in(jax.random.fold_in(pk, k + 1000), probe_id)
            return jax.vmap(fold)(pop_keys)

        delta = (
            jax.vmap(lambda pk: jax.random.rademacher(pk, (n_coords,), dtype=jnp.float32))(
                probe_keys(0)
            )
            * coord_mask
        )
        l, q, a_i = coords[..., 0], coords[..., 1], coords[..., 2]
        plus = angles.at[pop_idx, l, q, a_i].add(c * delta)
        minus = angles.at[pop_idx, l, q, a_i].add(-c * delta)
        diff = jnp.abs(objective(plus, probe_keys(1)) - objective(minus, probe_keys(2)))
        return acc + diff, None

    total, _ = jax.lax.scan(step, jnp.zeros(pop, jnp.float32), jnp.arange(calibration_steps))
    return total / calibration_steps


@partial(
    jax.jit,
    static_argnames=("n_qubits", "maxiter", "shots", "use_cvar", "use_shots", "use_pallas", "use_general"),
)
def _spsa_scan(
    gate_types, controls, layer_mask, angles, coords, coord_mask, active,
    learning_rates, table, sorted_energies, energy_order, alpha, pop_keys, initial_state,
    c, gamma_power, alpha_power, stability_constant, start_iteration,
    precision=None,
    *, n_qubits, maxiter, shots, use_cvar, use_shots, use_pallas=False, use_general=False,
):
    pop = gate_types.shape[0]
    pop_idx = jnp.arange(pop)[:, None]
    n_coords = coords.shape[1]
    l, q, a_i = coords[..., 0], coords[..., 1], coords[..., 2]

    def objective(a, k):
        return population_energies(
            gate_types, controls, a, layer_mask, table, sorted_energies, energy_order,
            alpha, k, n_qubits=n_qubits, shots=shots, use_cvar=use_cvar,
            use_shots=use_shots, initial_state=initial_state, use_pallas=use_pallas,
            use_general=use_general, precision=precision,
        )

    def step(carry, k):
        angles_c = carry
        it = (k + start_iteration).astype(jnp.float32)
        c_k = c / (it + 1.0) ** gamma_power
        a_k = learning_rates / (it + 1.0 + stability_constant) ** alpha_power

        def probe_keys(probe_id):
            fold = lambda pk: jax.random.fold_in(
                jax.random.fold_in(pk, k + start_iteration), probe_id
            )
            return jax.vmap(fold)(pop_keys)

        delta = (
            jax.vmap(lambda pk: jax.random.rademacher(pk, (n_coords,), dtype=jnp.float32))(
                probe_keys(0)
            )
            * coord_mask
        )
        plus = angles_c.at[pop_idx, l, q, a_i].add(c_k * delta)
        minus = angles_c.at[pop_idx, l, q, a_i].add(-c_k * delta)
        f_plus = objective(plus, probe_keys(1))
        f_minus = objective(minus, probe_keys(2))
        gradient = ((f_plus - f_minus) / (2.0 * c_k))[:, None] * delta

        updated = angles_c.at[pop_idx, l, q, a_i].add(-a_k[:, None] * gradient)
        angles_c = jnp.where(active[:, None, None, None], updated, angles_c)
        return angles_c, None

    angles, _ = jax.lax.scan(step, angles, jnp.arange(maxiter))
    final_keys = jax.vmap(lambda pk: jax.random.fold_in(pk, 0x7FFFFFFF))(pop_keys)
    final = population_energies(
        gate_types, controls, angles, layer_mask, table, sorted_energies, energy_order,
        alpha, final_keys, n_qubits=n_qubits, shots=shots, use_cvar=use_cvar,
        use_shots=use_shots, initial_state=initial_state, use_pallas=use_pallas,
        use_general=use_general, precision=precision,
    )
    return angles, final


@partial(
    jax.jit,
    static_argnames=(
        "n_qubits", "maxiter", "calibration_steps", "shots", "use_cvar", "use_shots",
        "use_pallas", "use_general", "calibrate",
    ),
)
def _spsa_slots_scan(
    gate_types, controls, layer_mask, angles,
    coords_ps, coord_mask_ps, active_ps, slot_layer_ps, pop_keys_ps,
    table, sorted_energies, energy_order, alpha, initial_state,
    c, gamma_power, alpha_power, stability_constant, target_magnitude, fixed_lr,
    precision=None,
    *, n_qubits, maxiter, calibration_steps, shots, use_cvar, use_shots,
    use_pallas=False, use_general=False, calibrate=True,
):
    """Fused multi-slot SPSA (the EVQEParameterSearch shape): scan over
    layer slots; each slot calibrates (optionally) and runs its gradient
    steps from that slot's cached layer-prefix state, with probes
    applying only the suffix layers.  Slot arrays are [P, S, ...] (pop on
    axis 0 for population-mesh sharding) — see
    :func:`~queasars_tpu.optim.nft._nft_slots_scan`.
    """
    pop = gate_types.shape[0]
    pop_idx = jnp.arange(pop)[:, None]
    max_layers = gate_types.shape[1]
    layer_idx = jnp.arange(max_layers)
    n_coords = coords_ps.shape[2]

    def slot_body(angles_s, xs):
        coords, coord_mask, active, keys, slot_layer = xs
        prefix_mask = jnp.logical_and(layer_mask, layer_idx[None, :] < slot_layer[:, None])
        suffix_mask = jnp.logical_and(layer_mask, layer_idx[None, :] >= slot_layer[:, None])
        prefix_state = simulate_prefix_states(
            gate_types, controls, angles_s, prefix_mask, n_qubits,
            initial_state=initial_state,
            mode=choose_prefix_engine(use_pallas, n_qubits),
        )

        def objective(a, k):
            return population_energies(
                gate_types, controls, a, suffix_mask, table, sorted_energies,
                energy_order, alpha, k, n_qubits=n_qubits, shots=shots,
                use_cvar=use_cvar, use_shots=use_shots, initial_state=prefix_state,
                use_pallas=use_pallas, use_general=use_general, precision=precision,
            )

        l, q, a_i = coords[..., 0], coords[..., 1], coords[..., 2]

        def probe_keys(k, probe_id, offset=0):
            fold = lambda pk: jax.random.fold_in(jax.random.fold_in(pk, k + offset), probe_id)
            return jax.vmap(fold)(keys)

        def direction(k, offset):
            return (
                jax.vmap(
                    lambda pk: jax.random.rademacher(pk, (n_coords,), dtype=jnp.float32)
                )(probe_keys(k, 0, offset))
                * coord_mask
            )

        if calibrate:
            def cal_step(acc, k):
                delta = direction(k, 1000)
                plus = angles_s.at[pop_idx, l, q, a_i].add(c * delta)
                minus = angles_s.at[pop_idx, l, q, a_i].add(-c * delta)
                diff = jnp.abs(
                    objective(plus, probe_keys(k, 1, 1000))
                    - objective(minus, probe_keys(k, 2, 1000))
                )
                return acc + diff, None

            total, _ = jax.lax.scan(
                cal_step, jnp.zeros(pop, jnp.float32), jnp.arange(calibration_steps)
            )
            magnitude = total / calibration_steps
            learning_rates = target_magnitude / jnp.maximum(magnitude, 1e-6)
        else:
            learning_rates = jnp.full(pop, fixed_lr, jnp.float32)

        def step(carry, k):
            angles_c = carry
            it = k.astype(jnp.float32)
            c_k = c / (it + 1.0) ** gamma_power
            a_k = learning_rates / (it + 1.0 + stability_constant) ** alpha_power
            delta = direction(k, 0)
            plus = angles_c.at[pop_idx, l, q, a_i].add(c_k * delta)
            minus = angles_c.at[pop_idx, l, q, a_i].add(-c_k * delta)
            gradient = (
                (objective(plus, probe_keys(k, 1)) - objective(minus, probe_keys(k, 2)))
                / (2.0 * c_k)
            )[:, None] * delta
            updated = angles_c.at[pop_idx, l, q, a_i].add(-a_k[:, None] * gradient)
            return jnp.where(active[:, None, None, None], updated, angles_c), None

        angles_s, _ = jax.lax.scan(step, angles_s, jnp.arange(maxiter))
        return angles_s, None

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
        alpha, final_keys, n_qubits=n_qubits, shots=shots, use_cvar=use_cvar,
        use_shots=use_shots, initial_state=initial_state, use_pallas=use_pallas,
        use_general=use_general, precision=precision,
    )
    return angles, final


class BatchedSPSA:
    """Population-lock-step SPSA against a diagonal-operator evaluator."""

    def __init__(self, config: SPSAConfig = SPSAConfig()):
        self.config = config

    def minimize(
        self,
        evaluator,
        packed: PackedPopulation,
        coords: np.ndarray,
        n_free: np.ndarray,
        active: np.ndarray,
        angles: Optional[np.ndarray] = None,
        seed: int = 0,
        termination_checkers: Optional[Sequence[SPSATerminationChecker]] = None,
        last_layer: Optional[np.ndarray] = None,
    ) -> tuple[np.ndarray, np.ndarray, int]:
        """Run SPSA over the selected free parameters.

        Same contract as :meth:`BatchedNFT.minimize`.  With
        ``termination_checkers`` (one per individual), steps run one jitted
        iteration at a time and individuals freeze when their checker
        terminates; the evaluation ledger then reports actual usage.
        ``last_layer`` (see :class:`~queasars_tpu.optim.nft.NFTConfig`'s
        ``cache_prefix``) enables the layer-prefix cache.
        """
        cfg = self.config
        a = packed.angles if angles is None else angles
        if coords.shape[1] == 0 or not np.any(np.logical_and(active, n_free > 0)):
            return np.asarray(a), np.asarray(evaluator.evaluate_packed(packed, angles=a)), 0
        try:
            operands = objective_operands(evaluator)
        except TypeError:
            # evaluators with host-side objectives (external backends,
            # black-box bitstring functions) cannot live inside the device
            # scan — run the same schedules host-stepped against
            # evaluate_packed (the reference's own qiskit-SPSA shape)
            return self._minimize_host(
                evaluator, packed, coords, n_free, active, np.asarray(a), seed,
                termination_checkers,
            )
        coord_mask = (
            np.arange(coords.shape[1])[None, :] < np.asarray(n_free)[:, None]
        ).astype(np.float32)
        common = dict(
            n_qubits=packed.n_qubits,
            shots=operands["shots"],
            use_cvar=operands["use_cvar"],
            use_shots=operands["use_shots"],
            use_pallas=operands.get("use_pallas", False),
            use_general=operands.get("use_general", False),
        )
        pop_keys = np.asarray(jax.random.split(jax.random.PRNGKey(seed), packed.n_individuals))
        precision = operands.get("precision")
        mesh = getattr(evaluator, "mesh", None)

        from queasars_tpu.optim.prefix import build_prefix_transform, prefix_enabled

        use_prefix = termination_checkers is None and prefix_enabled(
            cfg.cache_prefix, operands, mesh, last_layer
        )
        a_in = np.asarray(a)
        coords_in = np.asarray(coords)
        initial = operands["initial_state"]
        if use_prefix:
            transform = build_prefix_transform(packed, a_in, coords_in, operands, last_layer)
            a_in = transform.angles
            coords_in = transform.coords
            initial = transform.initial_state

        def run_sharded(fn, pop_args, rep_args, n_outputs):
            """Dispatch fn((pop_args), (rep_args)) directly or over the mesh."""
            if mesh is None:
                return fn(pop_args, rep_args)
            from queasars_tpu.parallel.mesh import (
                pad_population_axis,
                population_pad_multiple,
                run_population_sharded,
            )

            multiple = population_pad_multiple(mesh)
            padded = tuple(pad_population_axis(np.asarray(arr), multiple) for arr in pop_args)
            out = run_population_sharded(mesh, fn, padded, rep_args)
            if n_outputs == 1:
                return out[: packed.n_individuals]
            return tuple(o[: packed.n_individuals] for o in out)

        if use_prefix:
            structure = (transform.gate_types, transform.controls, transform.layer_mask)
        else:
            structure = (packed.gate_types, packed.controls, packed.layer_mask)
        table_ops = (
            operands["table"], operands["sorted_energies"], operands["energy_order"],
            operands["alpha"], initial, precision,
        )

        if cfg.learning_rate is None:
            def calibrate(pa, ra):
                gt, ctrl, lm, ang, crd, cm, keys = pa
                tab, se, eo, alpha_v, init, prec = ra
                return _spsa_calibrate(
                    gt, ctrl, lm, ang, crd, cm, tab, se, eo, alpha_v, keys, init,
                    jnp.float32(cfg.perturbation), prec,
                    calibration_steps=cfg.calibration_steps, **common,
                )

            magnitude = run_sharded(
                calibrate,
                (*structure, a_in, coords_in, coord_mask, pop_keys),
                table_ops, 1,
            )
            learning_rates = cfg.target_magnitude / np.maximum(np.asarray(magnitude), 1e-6)
            learning_rates = learning_rates.astype(np.float32)
            nfev = 2 * cfg.calibration_steps
        else:
            learning_rates = np.full(packed.n_individuals, cfg.learning_rate, np.float32)
            nfev = 0

        schedule_args = (
            jnp.float32(cfg.perturbation),
            jnp.float32(cfg.gamma_power),
            jnp.float32(cfg.alpha_power),
            jnp.float32(cfg.stability_constant),
        )

        def scan_step(maxiter, start_iteration):
            def fn(pa, ra):
                gt, ctrl, lm, ang, crd, cm, act, lr, keys = pa
                tab, se, eo, alpha_v, init, prec = ra
                return _spsa_scan(
                    gt, ctrl, lm, ang, crd, cm, act, lr, tab, se, eo, alpha_v, keys, init,
                    *schedule_args, jnp.int32(start_iteration), prec,
                    maxiter=maxiter, **common,
                )

            return fn

        if termination_checkers is None:
            out_angles, energies = run_sharded(
                scan_step(cfg.maxiter, 0),
                (*structure, a_in, coords_in, coord_mask,
                 np.asarray(active), learning_rates, pop_keys),
                table_ops, 2,
            )
            out_angles = np.asarray(out_angles)
            if use_prefix:
                out_angles = transform.merge(out_angles)
            return out_angles, np.asarray(energies), nfev + 2 * cfg.maxiter

        # host-stepped with per-individual termination
        current = np.asarray(a)
        return self._run_host_stepped_device(
            run_sharded, scan_step, structure, coords, coord_mask, table_ops,
            current, active, learning_rates, pop_keys, nfev, termination_checkers,
            evaluator, packed,
        )

    def _run_host_stepped_device(
        self, run_sharded, scan_step, structure, coords, coord_mask, table_ops,
        current, active, learning_rates, pop_keys, nfev, termination_checkers,
        evaluator, packed,
    ):
        cfg = self.config
        live = np.asarray(active, bool).copy()
        for k in range(cfg.maxiter):
            if not live.any():
                break
            current_j, energies_j = run_sharded(
                scan_step(1, k),
                (*structure, np.asarray(current), np.asarray(coords), coord_mask,
                 live, learning_rates, pop_keys),
                table_ops, 2,
            )
            current = np.asarray(current_j)
            energies = np.asarray(energies_j)
            nfev += 2
            for i, checker in enumerate(termination_checkers):
                if live[i] and checker.termination_check(
                    n_function_evaluations=nfev,
                    parameter_values=current[i],
                    function_value=float(energies[i]),
                    step_size=float(cfg.perturbation),
                    accepted=True,
                ):
                    live[i] = False
        final = np.asarray(evaluator.evaluate_packed(packed, angles=current))
        return current, final, nfev

    def _minimize_host(
        self, evaluator, packed, coords, n_free, active, angles, seed,
        termination_checkers=None,
    ):
        """Host-stepped SPSA for evaluators whose objective cannot be
        traced (external backends / black-box functions): identical
        power-law schedules and calibration; perturbation directions come
        from a host numpy RNG instead of the device key stream (external
        backends have no stream-identity contract with the device path).
        One batched ``evaluate_packed`` call per probe — the reference's
        own qiskit-SPSA evaluation shape (mutation.py:63-81)."""
        cfg = self.config
        pop = packed.n_individuals
        pop_idx = np.arange(pop)[:, None]
        coords = np.asarray(coords)
        n_coords = coords.shape[1]
        coord_mask = (
            np.arange(n_coords)[None, :] < np.asarray(n_free)[:, None]
        ).astype(np.float64)
        l, q, a_i = coords[..., 0], coords[..., 1], coords[..., 2]
        rng = np.random.default_rng(seed)
        current = np.array(angles, dtype=np.float32, copy=True)
        apply = np.logical_and(np.asarray(active, bool), np.asarray(n_free) > 0)

        def objective(a):
            return np.asarray(
                evaluator.evaluate_packed(packed, angles=a.astype(np.float32)),
                dtype=np.float64,
            )

        def shifted(a, delta, scale):
            out = np.array(a, copy=True)
            out[pop_idx, l, q, a_i] += (scale * delta).astype(np.float32)
            return out

        def direction():
            return (rng.integers(0, 2, size=(pop, n_coords)) * 2 - 1) * coord_mask

        nfev = 0
        if cfg.learning_rate is None:
            total = np.zeros(pop, np.float64)
            for _ in range(cfg.calibration_steps):
                delta = direction()
                total += np.abs(
                    objective(shifted(current, delta, cfg.perturbation))
                    - objective(shifted(current, delta, -cfg.perturbation))
                )
                nfev += 2
            magnitude = total / cfg.calibration_steps
            learning_rates = cfg.target_magnitude / np.maximum(magnitude, 1e-6)
        else:
            learning_rates = np.full(pop, cfg.learning_rate, np.float64)

        live = apply.copy()
        energies = None
        for k in range(cfg.maxiter):
            if not live.any():
                break
            c_k = cfg.perturbation / (k + 1.0) ** cfg.gamma_power
            a_k = learning_rates / (k + 1.0 + cfg.stability_constant) ** cfg.alpha_power
            delta = direction()
            f_plus = objective(shifted(current, delta, c_k))
            f_minus = objective(shifted(current, delta, -c_k))
            nfev += 2
            gradient = ((f_plus - f_minus) / (2.0 * c_k))[:, None] * delta
            updated = np.array(current, copy=True)
            updated[pop_idx, l, q, a_i] -= (a_k[:, None] * gradient).astype(np.float32)
            current = np.where(live[:, None, None, None], updated, current)
            energies = np.minimum(f_plus, f_minus)
            if termination_checkers is not None:
                for i, checker in enumerate(termination_checkers):
                    if live[i] and checker.termination_check(
                        n_function_evaluations=nfev,
                        parameter_values=current[i],
                        function_value=float(energies[i]),
                        step_size=float(c_k),
                        accepted=True,
                    ):
                        live[i] = False
        final = np.asarray(evaluator.evaluate_packed(packed, angles=current))
        return current, final, nfev + 1

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
        :meth:`BatchedNFT.minimize_slots` (one compiled scan over all
        layer slots, per-slot prefix caching, suffix-only probes; [P, S]
        slot arrays; returns None when the fused path does not apply)."""
        if getattr(evaluator, "nft_minimize", None) is not None:
            return None
        try:
            operands = objective_operands(evaluator)
        except TypeError:
            return None
        flag = self.config.cache_prefix
        enabled = operands.get("use_pallas", False) if flag is None else bool(flag)
        if not enabled:
            return None
        initial = operands["initial_state"]
        if operands.get("use_pallas", False) and initial is not None:
            return None

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
            calibration_steps=cfg.calibration_steps,
            shots=operands["shots"],
            use_cvar=operands["use_cvar"],
            use_shots=operands["use_shots"],
            use_pallas=operands.get("use_pallas", False),
            use_general=operands.get("use_general", False),
            calibrate=cfg.learning_rate is None,
        )
        schedule_args = (
            jnp.float32(cfg.perturbation),
            jnp.float32(cfg.gamma_power),
            jnp.float32(cfg.alpha_power),
            jnp.float32(cfg.stability_constant),
            jnp.float32(cfg.target_magnitude),
            jnp.float32(cfg.learning_rate if cfg.learning_rate is not None else 0.0),
        )
        pop_args = (
            packed.gate_types, packed.controls, packed.layer_mask, a_in,
            np.asarray(coords), coord_mask, np.asarray(active),
            np.asarray(slot_layers, np.int32), keys,
        )
        rep_args = (
            operands["table"], operands["sorted_energies"], operands["energy_order"],
            operands["alpha"], initial, operands.get("precision"),
        )

        def fn(pa, ra):
            gt, ctrl, lm, ang, crd, cm, act, sl, ks = pa
            tab, se, eo, alpha_v, init, prec = ra
            return _spsa_slots_scan(
                gt, ctrl, lm, ang, crd, cm, act, sl, ks, tab, se, eo, alpha_v, init,
                *schedule_args, prec, **static_kwargs,
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
