"""Batched Nakanishi-Fujii-Todo (NFT) optimizer.

The reference's inner hot loop runs qiskit's NFT per individual per layer
behind futures (mutation.py:28-89): O(maxiter) sequential Python->C++
round trips per individual.  Here the entire population takes NFT steps in
lock-step inside one ``lax.scan``: each step is two (plus periodic reset
three) batched population evaluations, all fused into one compiled device
program.

NFT math (arXiv:1903.12166, matching qiskit's ``nakanishi_fujii_todo``
scipy-style method): the objective is an exact sinusoid in each U3 angle,
  f(theta) = c + a*cos(theta - b),
so from z0=f(x), z1=f(x+pi/2), z3=f(x-pi/2):
  b     = x + atan2((z1-z3)/2, z0-(z1+z3)/2),
  theta* = b + pi      (the minimum),
  f(theta*) = c - a  with  c=(z1+z3)/2, a=sqrt((z0-c)^2+((z1-z3)/2)^2).
The minimum value is recycled as the next step's z0; every
``reset_interval`` steps z0 is re-measured (guards drift under shot noise,
same knob as qiskit NFT's reset_interval=32 default).

Per-individual parameter counts differ: step k updates flat parameter
``k mod n_free_i`` of each individual (the same cyclic rule as qiskit NFT),
with per-individual coordinate tables mapping flat indices to
(layer, qubit, angle) slots.

Exactness caveat (shared with qiskit's NFT, hence the reference): the
single-harmonic assumption is exact for all U3 angles and for CU3 angles
against **diagonal** Hamiltonians (the EVQE/JSSP hot path — cross terms
between control blocks vanish).  For CU3's theta against non-diagonal
Hamiltonians the objective picks up 4pi-periodic half-harmonics (SU(2)
double cover: U3(theta+2pi) = -U3(theta), observable only as a relative
phase under control), so 3-point steps are approximate descent there.  Set
``NFTConfig(five_point=True)`` for the **exact** two-frequency variant
(beyond qiskit): five samples spanning the 4pi period fit
``c + a1 cos(theta-b1) + a2 cos(theta/2 - b2)`` via one shared 5x5 solve
and a dense grid argmin — exact for every gate/Hamiltonian combination,
at 4 evaluations per step instead of 2.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from math import ceil
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim.nft_math import nft_three_point_update
from queasars_tpu.optim.objective import (
    objective_operands,
    population_energies,
    slot_kernels_ok as _slot_kernels_ok,
)
from queasars_tpu.optim.prefix import (
    choose_prefix_engine,
    prefix_enabled,
    simulate_prefix_states,
)


@dataclass(frozen=True)
class NFTConfig:
    """NFT hyperparameters (qiskit NFT-compatible knobs).

    :param maxiter: parameter-update steps (each costs 2 evaluations, plus
        1 extra on reset steps)
    :param reset_interval: re-measure the recycled z0 every this many steps
    :param cache_prefix: when a sweep only optimizes each individual's
        *last* circuit layer (the EVQELastLayerParameterSearch hot path),
        simulate the frozen prefix layers once and re-enter every probe
        from the cached per-individual state — each probe then applies a
        single layer instead of the whole circuit.  Mathematically
        identical (the prefix state does not depend on the probed
        parameters); float rounding may differ at the ulp level from the
        full-circuit evaluation.  None (default) enables it exactly when
        the fused Pallas kernel path is active (TPU production runs);
        True/False forces it for any engine.
    """

    maxiter: int = 40
    reset_interval: int = 32
    five_point: bool = False
    cache_prefix: Optional[bool] = None
    #: run the whole last-layer sweep INSIDE one fused kernel launch
    #: (prefix state resident in VMEM across all probes, 3-point updates
    #: on the scalar core) instead of one kernel launch per probe.
    #: Exact diagonal Pallas objectives only; atan2 is a ~2e-6 polynomial
    #: (Mosaic has no atan lowering), so angles may differ from the
    #: scan path at that level.  None (default) = on whenever the prefix
    #: cache is on the Pallas path; True/False forces it.
    in_kernel_sweep: Optional[bool] = None

    def n_circuit_evaluations(self) -> int:
        """Evaluations used per optimized individual (ledger input for the
        budget enforcement, reference: mutation.py:282-290)."""
        per_step = 4 if self.five_point else 2
        return per_step * self.maxiter + ceil(self.maxiter / self.reset_interval)


def _five_point_inverse() -> np.ndarray:
    """Inverse of the shared 5x5 basis matrix for the two-frequency fit.

    Basis (in the shift variable phi = theta - x, period 4pi):
    {1, cos phi, sin phi, cos phi/2, sin phi/2}, sampled at
    phi in {0, 4pi/5, 8pi/5, 12pi/5, 16pi/5} (uniform over the period —
    a real DFT-like, well-conditioned design).
    """
    deltas = np.array([0.0, 4 * np.pi / 5, 8 * np.pi / 5, 12 * np.pi / 5, 16 * np.pi / 5])
    basis = np.stack(
        [np.ones_like(deltas), np.cos(deltas), np.sin(deltas), np.cos(deltas / 2), np.sin(deltas / 2)],
        axis=1,
    )
    return np.linalg.inv(basis).astype(np.float32)


_FIVE_POINT_INVERSE = jnp.asarray(_five_point_inverse())


@partial(
    jax.jit,
    static_argnames=(
        "n_qubits", "maxiter", "reset_interval", "shots", "use_cvar", "use_shots",
        "use_pallas", "use_general", "five_point", "prefix_mode",
    ),
)
def _nft_scan(
    gate_types,
    controls,
    layer_mask,
    angles,
    coords,
    n_free,
    active,
    table,
    sorted_energies,
    energy_order,
    alpha,
    pop_keys,
    initial_state,
    precision=None,
    prefix_args=None,
    *,
    n_qubits: int,
    maxiter: int,
    reset_interval: int,
    shots: int,
    use_cvar: bool,
    use_shots: bool,
    use_pallas: bool = False,
    use_general: bool = False,
    five_point: bool = False,
    prefix_mode: str = "off",
):
    pop = gate_types.shape[0]
    pop_idx = jnp.arange(pop)

    if prefix_mode != "off":
        # layer-prefix cache, fused into the sweep's compiled program:
        # simulate the frozen prefix once, then every probe re-enters the
        # cached per-individual states (initial_state here may carry a
        # SHARED start state, which folds into the prefix on the jnp mode;
        # the kernel modes — "pallas" slot states to n=20, "fold" MXU
        # states to n=22 — run without one by construction)
        full_gt, full_ctrl, prefix_mask, full_angles = prefix_args
        initial_state = simulate_prefix_states(
            full_gt, full_ctrl, full_angles, prefix_mask, n_qubits,
            initial_state=initial_state, mode=prefix_mode,
        )

    def objective(a, k):
        return population_energies(
            gate_types, controls, a, layer_mask, table, sorted_energies, energy_order,
            alpha, k, n_qubits=n_qubits, shots=shots, use_cvar=use_cvar,
            use_shots=use_shots, initial_state=initial_state, use_pallas=use_pallas,
            use_general=use_general, precision=precision,
        )

    step = _make_nft_step(
        objective, coords, n_free, active, pop_keys, reset_interval, five_point
    )
    init = (angles, jnp.zeros(pop, dtype=jnp.float32))
    (angles, z0), _ = jax.lax.scan(step, init, jnp.arange(maxiter))
    return angles, z0


def _make_nft_step(objective, coords, n_free, active, pop_keys, reset_interval, five_point):
    """Build one NFT update step (the lax.scan body) over a fixed
    objective and per-individual coordinate tables."""
    pop = coords.shape[0]
    pop_idx = jnp.arange(pop)

    def step(carry, k):
        angles_c, z0 = carry

        # per-individual probe keys: fold (step, probe-id) into each
        # individual's own key — shard-local under a population mesh, and
        # identical whether or not the batch is sharded
        def probe_keys(probe_id):
            fold = lambda pk: jax.random.fold_in(jax.random.fold_in(pk, k), probe_id)
            return jax.vmap(fold)(pop_keys)

        z0 = jax.lax.cond(
            (k % reset_interval) == 0,
            lambda: objective(angles_c, probe_keys(0)),
            lambda: z0,
        )

        idx = jnp.where(n_free > 0, k % jnp.maximum(n_free, 1), 0)
        coord = coords[pop_idx, idx]  # [P, 3]
        l, q, a_i = coord[:, 0], coord[:, 1], coord[:, 2]

        if five_point:
            # exact two-frequency fit (see module docstring): sample at
            # four 4pi/5-spaced shifts (z0 recycled at shift 0), solve the
            # shared 5x5 Vandermonde, grid-argmin the fitted curve
            deltas = [4 * jnp.pi / 5, 8 * jnp.pi / 5, 12 * jnp.pi / 5, 16 * jnp.pi / 5]
            z_samples = [z0]
            for step_i, delta in enumerate(deltas):
                shifted = angles_c.at[pop_idx, l, q, a_i].add(delta)
                z_samples.append(objective(shifted, probe_keys(step_i + 1)))
            z_matrix = jnp.stack(z_samples)  # [5, P]
            coeffs = _FIVE_POINT_INVERSE @ z_matrix  # [5, P]

            grid = jnp.linspace(0.0, 4 * jnp.pi, 512, endpoint=False)  # [G]
            fitted = (
                coeffs[0][:, None]
                + coeffs[1][:, None] * jnp.cos(grid)[None, :]
                + coeffs[2][:, None] * jnp.sin(grid)[None, :]
                + coeffs[3][:, None] * jnp.cos(grid / 2)[None, :]
                + coeffs[4][:, None] * jnp.sin(grid / 2)[None, :]
            )  # [P, G]
            best = jnp.argmin(fitted, axis=1)
            shift = grid[best]
            minimum_value = jnp.take_along_axis(fitted, best[:, None], axis=1)[:, 0]
            updated = angles_c.at[pop_idx, l, q, a_i].add(shift)
        else:
            plus = angles_c.at[pop_idx, l, q, a_i].add(jnp.pi / 2)
            minus = angles_c.at[pop_idx, l, q, a_i].add(-jnp.pi / 2)
            z1 = objective(plus, probe_keys(1))
            z3 = objective(minus, probe_keys(2))

            shift, minimum_value = nft_three_point_update(z0, z1, z3)

            updated = angles_c.at[pop_idx, l, q, a_i].add(shift + jnp.pi)
        apply = jnp.logical_and(active, n_free > 0)
        angles_c = jnp.where(apply[:, None, None, None], updated, angles_c)
        z0 = jnp.where(apply, minimum_value, z0)
        return (angles_c, z0), None

    return step


@partial(
    jax.jit,
    static_argnames=(
        "n_qubits", "maxiter", "reset_interval", "shots", "use_cvar", "use_shots",
        "use_pallas", "use_general", "five_point",
    ),
)
def _nft_slots_scan(
    gate_types,
    controls,
    layer_mask,
    angles,
    coords_ps,
    n_free_ps,
    active_ps,
    slot_layer_ps,
    table,
    sorted_energies,
    energy_order,
    alpha,
    pop_keys_ps,
    initial_state,
    precision=None,
    *,
    n_qubits: int,
    maxiter: int,
    reset_interval: int,
    shots: int,
    use_cvar: bool,
    use_shots: bool,
    use_pallas: bool = False,
    use_general: bool = False,
    five_point: bool = False,
):
    """Fused multi-slot parameter search: scan over layer slots, each slot
    an inner NFT scan over its per-individual layer, re-entering every
    probe from that slot's cached layer-prefix state.

    Slot arrays carry the population on axis 0 ([P, S, ...]) so the whole
    call shards over a population mesh like the single-sweep scan; they
    are transposed to scan order ([S, P, ...]) here.  ``slot_layer_ps``
    gives each individual's optimized layer per slot (= the number of
    frozen prefix layers); individuals sitting a slot out carry
    ``max_layers`` so their probes see an empty suffix.

    Replaces the reference's per-layer sequential optimizer loop
    (mutation.py:92-132): one compiled device program for the whole
    operator instead of one dispatch per layer slot, with probe work
    proportional to the suffix instead of the full circuit.
    """
    pop = gate_types.shape[0]
    max_layers = gate_types.shape[1]
    layer_idx = jnp.arange(max_layers)

    def slot_body(angles_c, xs):
        coords, n_free, active, keys, slot_layer = xs
        prefix_mask = jnp.logical_and(layer_mask, layer_idx[None, :] < slot_layer[:, None])
        suffix_mask = jnp.logical_and(layer_mask, layer_idx[None, :] >= slot_layer[:, None])
        prefix_state = simulate_prefix_states(
            gate_types, controls, angles_c, prefix_mask, n_qubits,
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

        step = _make_nft_step(objective, coords, n_free, active, keys, reset_interval, five_point)
        init = (angles_c, jnp.zeros(pop, dtype=jnp.float32))
        (angles_c, z0), _ = jax.lax.scan(step, init, jnp.arange(maxiter))
        return angles_c, z0

    xs = (
        jnp.swapaxes(coords_ps, 0, 1),
        jnp.swapaxes(n_free_ps, 0, 1),
        jnp.swapaxes(active_ps, 0, 1),
        jnp.swapaxes(pop_keys_ps, 0, 1),
        jnp.swapaxes(slot_layer_ps, 0, 1),
    )
    angles_out, z0_slots = jax.lax.scan(slot_body, angles, xs)
    return angles_out, z0_slots[-1]


class BatchedNFT:
    """Population-lock-step NFT against a diagonal-operator evaluator."""

    def __init__(self, config: NFTConfig = NFTConfig()):
        self.config = config

    def publishes_exact_energies(self, evaluator) -> bool:
        """True when this optimizer's returned energies are the exact
        evaluator energies at the final angles — the 3-point sinusoid
        model is exact for the plain diagonal estimator objective (no
        shots, no CVaR tail, no general Pauli terms, no precision noise),
        so selection may reuse them (PopulationEnergyCache)."""
        if self.config.five_point:
            # grid-argmin fit: approximate minimum values
            return False
        if getattr(evaluator, "nft_minimize", None) is not None:
            # amplitude-sharded evaluator: its device sweep is the same
            # 3-point math — exact when it is on the plain energies path
            # against a DIAGONAL operator (for general Pauli sums the
            # sinusoid fit is approximate for CU3 theta, see module
            # docstring)
            return (
                getattr(evaluator, "alpha", 0.0) >= 1.0
                and getattr(evaluator, "shots", -1) is None
                and getattr(evaluator, "precision", 1.0) == 0.0
                and getattr(getattr(evaluator, "operator", None), "is_diagonal", False)
            )
        try:
            operands = objective_operands(evaluator)
        except TypeError:
            return False
        return (
            not operands["use_shots"]
            and not operands["use_cvar"]
            and not operands.get("use_general", False)
            and operands.get("precision") is None
        )

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
        """Run NFT over the selected free parameters.

        :param evaluator: Statevector/Sampler expectation evaluator
            (diagonal operator)
        :param packed: population structure tensors
        :param coords: [P, K, 3] free-parameter coordinates per individual
            (padded arbitrarily where unused)
        :param n_free: [P] number of valid coordinates per individual
        :param active: [P] individuals taking part in this optimization
        :param angles: optional override of the packed angle tensor
        :param seed: RNG seed for the shot-sampling objective path
        :param last_layer: [P] layer indices asserting that every
            individual's free coordinates lie in that layer AND no later
            (real) layer exists — enables the layer-prefix cache (see
            :class:`NFTConfig`)
        :return: (optimized angles [P, L, n, 3], final energies [P],
            evaluations used per active individual)
        """
        a = packed.angles if angles is None else angles
        if coords.shape[1] == 0 or not np.any(np.logical_and(active, n_free > 0)):
            # nothing to optimize (e.g. an all-identity layer)
            return np.asarray(a), np.asarray(evaluator.evaluate_packed(packed, angles=a)), 0
        # evaluators that own their distribution (amplitude sharding) may
        # provide a device-side NFT sweep of their own; None = not
        # applicable for this configuration
        device_nft = getattr(evaluator, "nft_minimize", None)
        if device_nft is not None:
            import inspect

            kwargs = (
                {"last_layer": last_layer}
                if "last_layer" in inspect.signature(device_nft).parameters
                else {}
            )
            device_result = device_nft(
                packed, coords, n_free, active, a, self.config, seed, **kwargs
            )
            if device_result is not None:
                out_angles, energies = device_result
                return out_angles, energies, self.config.n_circuit_evaluations()
        try:
            operands = objective_operands(evaluator)
        except TypeError:
            # evaluators with host-side objectives (e.g. black-box bitstring
            # functions) cannot live inside the device scan — run the same
            # NFT math host-stepped against evaluate_packed
            return self._minimize_host(evaluator, packed, coords, n_free, active, a)
        mesh = getattr(evaluator, "mesh", None)
        use_prefix = prefix_enabled(self.config.cache_prefix, operands, mesh, last_layer)

        gt, ctrl, lm = packed.gate_types, packed.controls, packed.layer_mask
        a_in = np.asarray(a)
        coords_in = np.asarray(coords)
        initial = operands["initial_state"]
        if use_prefix and self._in_kernel_sweep_applies(operands, packed.n_qubits):
            return self._minimize_in_kernel(
                packed, coords_in, n_free, active, a_in, last_layer, operands
            )
        prefix_args = None
        prefix_mode = "off"
        if use_prefix:
            # layer-prefix cache: the frozen prefix simulates ONCE inside
            # the sweep's compiled program (_nft_scan), and every probe
            # applies just the optimized layer from the cached state
            ll = np.asarray(last_layer, np.int32)
            prefix_mask = np.logical_and(
                lm, np.arange(packed.max_layers)[None, :] < ll[:, None]
            )
            prefix_args = (gt, ctrl, prefix_mask, a_in)
            # engine choice: slot states kernel to its n=20 TPU cap, the
            # folded MXU states kernel to n=22 past it, jnp otherwise
            prefix_mode = choose_prefix_engine(
                operands.get("use_pallas", False), packed.n_qubits
            )
            full_angles = a_in
            gt = np.take_along_axis(gt, ll[:, None, None], axis=1)
            ctrl = np.take_along_axis(ctrl, ll[:, None, None], axis=1)
            a_in = np.take_along_axis(a_in, ll[:, None, None, None], axis=1)
            lm = np.ones((packed.n_individuals, 1), dtype=bool)
            coords_in = coords_in.copy()
            coords_in[:, :, 0] = 0

        pop_keys = np.asarray(jax.random.split(jax.random.PRNGKey(seed), packed.n_individuals))
        static_kwargs = dict(
            n_qubits=packed.n_qubits,
            maxiter=self.config.maxiter,
            reset_interval=self.config.reset_interval,
            shots=operands["shots"],
            use_cvar=operands["use_cvar"],
            use_shots=operands["use_shots"],
            use_pallas=operands.get("use_pallas", False),
            use_general=operands.get("use_general", False),
            five_point=self.config.five_point,
            prefix_mode=prefix_mode,
        )
        pop_args = (
            gt, ctrl, lm, a_in,
            coords_in, np.asarray(n_free), np.asarray(active), pop_keys,
        )
        rep_args = (
            operands["table"], operands["sorted_energies"], operands["energy_order"],
            operands["alpha"], initial, operands.get("precision"),
        )

        def fn(pa, ra):
            gt, ctrl, lm, ang, crd, nf, act, keys = pa
            tab, se, eo, alpha_v, init, prec = ra
            return _nft_scan(
                gt, ctrl, lm, ang, crd, nf, act, tab, se, eo, alpha_v, keys, init, prec,
                prefix_args, **static_kwargs,
            )

        if mesh is None:
            out_angles, energies = fn(pop_args, rep_args)
            if use_prefix:
                merged = full_angles.copy()
                merged[np.arange(packed.n_individuals), ll] = np.asarray(out_angles)[:, 0]
                out_angles = merged
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
        return np.asarray(out_angles), np.asarray(energies), self.config.n_circuit_evaluations()

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
        """Run a whole multi-slot parameter search (EVQEParameterSearch:
        one layer per individual per slot, sequential slots) as ONE fused
        device program, with each slot's probes re-entering from that
        slot's cached layer-prefix state.

        Slot arrays are [P, S, ...]: ``coords`` [P, S, K, 3],
        ``n_free``/``active``/``slot_layers`` [P, S], ``seeds`` [S].
        ``slot_layers`` is each individual's optimized layer for the slot;
        pass ``packed.max_layers`` where an individual sits the slot out.

        Returns None when the fused path does not apply (host-side
        objectives, evaluators owning their own distribution, the cache
        knob resolving off, or a shared initial state on the Pallas
        engine) — callers fall back to the per-slot loop.  Identical NFT
        math to that loop; float rounding may differ at the ulp level.

        :return: (optimized angles, last-slot energies, evaluations used
            per active individual per slot)
        """
        device_slots = getattr(evaluator, "nft_minimize_slots", None)
        if device_slots is not None:
            # evaluators owning their distribution (amplitude sharding)
            # provide the fused slot sweep themselves
            a_dev = np.asarray(packed.angles if angles is None else angles)
            seed0 = int(seeds[0]) if seeds is not None and len(seeds) else 0
            result = device_slots(
                packed, coords, n_free, active, slot_layers, a_dev, self.config, seed0
            )
            if result is None:
                return None
            out_angles, energies = result
            return out_angles, energies, self.config.n_circuit_evaluations()
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

        a_in = np.asarray(packed.angles if angles is None else angles)
        pop, n_slots = n_free.shape
        seeds = np.zeros(n_slots, np.int64) if seeds is None else np.asarray(seeds)
        keys = np.stack(
            [
                np.asarray(jax.random.split(jax.random.PRNGKey(int(s)), pop))
                for s in seeds
            ],
            axis=1,
        )  # [P, S, 2]

        static_kwargs = dict(
            n_qubits=packed.n_qubits,
            maxiter=self.config.maxiter,
            reset_interval=self.config.reset_interval,
            shots=operands["shots"],
            use_cvar=operands["use_cvar"],
            use_shots=operands["use_shots"],
            use_pallas=operands.get("use_pallas", False),
            use_general=operands.get("use_general", False),
            five_point=self.config.five_point,
        )
        pop_args = (
            packed.gate_types, packed.controls, packed.layer_mask, a_in,
            np.asarray(coords), np.asarray(n_free), np.asarray(active),
            np.asarray(slot_layers, np.int32), keys,
        )
        rep_args = (
            operands["table"], operands["sorted_energies"], operands["energy_order"],
            operands["alpha"], initial, operands.get("precision"),
        )

        def fn(pa, ra):
            gt, ctrl, lm, ang, crd, nf, act, sl, ks = pa
            tab, se, eo, alpha_v, init, prec = ra
            return _nft_slots_scan(
                gt, ctrl, lm, ang, crd, nf, act, sl, tab, se, eo, alpha_v, ks, init,
                prec, **static_kwargs,
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
        return (
            np.asarray(out_angles),
            np.asarray(energies),
            self.config.n_circuit_evaluations(),
        )

    def _in_kernel_sweep_applies(self, operands, n_qubits: int = 0, backend: str | None = None) -> bool:
        """The fully-in-kernel last-layer sweep covers the exact diagonal
        Pallas objective (no shots / CVaR / general terms / precision
        noise / five-point / shared initial state) at the SLOT kernels'
        sizes — on TPU, past their n=20 cap (the folded probe kernels
        reach 22) the scan path with a jnp prefix takes over.  Off the
        TPU the kernels interpret at any size (CPU tests)."""
        flag = self.config.in_kernel_sweep
        if flag is False:
            return False
        if not operands.get("use_pallas", False) and flag is not True:
            return False
        backend = jax.default_backend() if backend is None else backend
        if backend == "tpu" and not _slot_kernels_ok(n_qubits):
            return False
        return (
            not operands["use_shots"]
            and not operands["use_cvar"]
            and not operands.get("use_general", False)
            and operands.get("precision") is None
            and operands["initial_state"] is None
            and not self.config.five_point
        )

    def _minimize_in_kernel(
        self, packed, coords, n_free, active, a_in, last_layer, operands
    ):
        """One kernel launch for the whole last-layer sweep: prefix
        simulation + the sweep kernel inside a single jit (one host
        dispatch), merged back into the full angle tensor.  Uses the
        folded (MXU) probe kernel when the kron-fold knob resolves on
        (measured faster than the slot probes, docs/performance.md);
        the VPU slot kernel otherwise."""
        from queasars_tpu.optim.objective import mxu_fold_enabled
        from queasars_tpu.optim.sweep_kernel_launch import (
            nft_layer_sweep_folded_launch,
            nft_layer_sweep_launch,
        )

        launch = (
            nft_layer_sweep_folded_launch
            if mxu_fold_enabled(None, packed.n_qubits, path="sweep")
            else nft_layer_sweep_launch
        )
        ll = np.asarray(last_layer, np.int32)
        pop = packed.n_individuals
        out_layer_angles, energies = launch(
            packed.gate_types, packed.controls, a_in, packed.layer_mask,
            ll, coords[:, :, 1:3], np.asarray(n_free), np.asarray(active),
            operands["table"],
            n_qubits=packed.n_qubits,
            maxiter=self.config.maxiter,
            reset_interval=self.config.reset_interval,
        )
        merged = a_in.copy()
        merged[np.arange(pop), ll] = np.asarray(out_layer_angles)
        return merged, np.asarray(energies), self.config.n_circuit_evaluations()

    def _minimize_host(self, evaluator, packed, coords, n_free, active, angles):
        """Host-stepped NFT for evaluators whose objective cannot be traced
        (identical update math; one evaluator call per probe)."""
        cfg = self.config
        pop = packed.n_individuals
        pop_idx = np.arange(pop)
        current = np.array(angles, copy=True)
        z0 = np.zeros(pop, dtype=np.float64)
        apply = np.logical_and(np.asarray(active, bool), np.asarray(n_free) > 0)
        for k in range(cfg.maxiter):
            if k % cfg.reset_interval == 0:
                z0 = np.asarray(evaluator.evaluate_packed(packed, angles=current), dtype=np.float64)
            idx = np.where(n_free > 0, k % np.maximum(n_free, 1), 0)
            coord = coords[pop_idx, idx]
            l, q, a_i = coord[:, 0], coord[:, 1], coord[:, 2]
            plus = current.copy()
            plus[pop_idx, l, q, a_i] += np.pi / 2
            minus = current.copy()
            minus[pop_idx, l, q, a_i] -= np.pi / 2
            z1 = np.asarray(evaluator.evaluate_packed(packed, angles=plus), dtype=np.float64)
            z3 = np.asarray(evaluator.evaluate_packed(packed, angles=minus), dtype=np.float64)
            shift, minimum_value = nft_three_point_update(z0, z1, z3, xp=np)
            updated = current.copy()
            updated[pop_idx, l, q, a_i] += shift + np.pi
            current = np.where(apply[:, None, None, None], updated, current)
            z0 = np.where(apply, minimum_value, z0)
        return current, z0.astype(np.float32), self.config.n_circuit_evaluations()
