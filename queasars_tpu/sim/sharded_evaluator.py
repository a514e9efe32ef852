"""Amplitude-sharded population evaluator: EVQE beyond one chip's memory.

Capability the reference does not have (SURVEY.md §2.3 P4): each
statevector is split across the mesh's ``amp`` axis
(``sim/sharded_statevector.py``) — the factorization to use when 2^n
amplitudes no longer fit a single chip.  Exposes the same
``evaluate_packed`` contract as the single-chip evaluators, so the whole
solver stack runs unchanged on top — and provides device-side NFT sweeps
(:meth:`AmplitudeShardedExpectationEvaluator.nft_minimize`,
:meth:`~AmplitudeShardedExpectationEvaluator.nft_minimize_slots`) so the
exact optimization hot path runs as compiled SPMD scans over the mesh.

**Population x amplitude composition (2-D mesh).** The mesh factors as
``(pop, amp)``: the population axis shards individuals (the reference's
one scaling axis, selection.py:75-84 — preserved at any qubit count),
the amplitude axis shards each individual's 2^n state.  A v5e-8 at 22
qubits runs as (4 pop groups) x (2 amp shards) instead of devoting all
eight chips to one individual at a time.  Passing a 1-D mesh keeps the
round-2 behavior (all devices on the amplitude axis); ``amp_devices=``
picks the factorization explicitly.

**Determinism.** Exact energies (and the device NFT sweeps built on
them) reduce blockwise with a fixed block count
(``sharded_statevector.AMP_BLOCKS``), and finite-shot paths draw
through a fixed-tree blocked inverse-CDF
(``sharded_statevector.blocked_shot_positions``, block count
``SAMPLE_BLOCKS`` over the GLOBAL index space) — so both exact and
shot-based solve trajectories are bit-identical across every
``(pop, amp)`` factorization of the same device set (pinned by
tests/test_pop_amp_mesh.py, including the shots path).

Distribution notes:
- the diagonal energy table is built SHARD-LOCALLY inside the mesh from
  the O(K) term data (``build_device_table``) — no 2^n array is ever
  materialized on the host or on any single device;
- exact alpha=1 energies are fully distributed: blockwise local dots +
  one fixed-order gather — only P scalars leave the mesh;
- general (non-diagonal) Pauli sums are supported on the exact path:
  cross-shard X flips ride one ``ppermute`` per distinct global X mask
  (the same machinery the global-qubit gates use);
- exact shot-free CVaR is fully distributed: the alpha-quantile energy
  level is found by bisection on the cumulative mass (fixed-tree
  blockwise psums per step) — no global sort, no gather of the 2^n
  distribution, no host table, no qubit ceiling (see
  :meth:`AmplitudeShardedExpectationEvaluator._exact_cvar_fn`);
- finite-shot paths (any alpha) are fully distributed: hierarchical
  inverse-CDF sampling over the shards followed by the shot-multiset
  expectation/CVaR reduction — no 2^n array ever leaves the mesh;
- an initial state (array or :class:`EVQEIndividual`) is prepared ONCE
  as an amp-sharded state and every simulation re-enters it
  shard-locally (the reference prepends initial-state circuits on every
  path, circuit_evaluation.py:148-149,201-202,272-273);
- multi-controller meshes are supported on every path.
"""

from __future__ import annotations

from math import lcm
from typing import Optional, Union

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from queasars_tpu.genome.individual import EVQEIndividual
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim.nft_math import nft_three_point_update
from queasars_tpu.paulis import PauliSum
from queasars_tpu.paulis.diagonal import diagonal_energy_table, diagonal_terms
from queasars_tpu.sim.evaluators import BaseCircuitEvaluator, CircuitEvaluatorException
from queasars_tpu.sim.sharded_statevector import (
    AMP_AXIS,
    POP_AXIS,
    _mesh_bits,
    group_general_terms,
    build_device_table,
    make_sharded_general_energies_fn,
    make_sharded_population_energies_fn,
    make_sharded_population_probs_fn,
)

#: population padding quantum (mirrors parallel/mesh.py): population-axis
#: arrays pad to lcm(pop_devices, this), so every factorization with up
#: to 8 population devices compiles the same per-row shapes and solve
#: trajectories stay bit-identical across factorizations
POPULATION_PAD = 8



def _nft_scan_body(objective, angles, coords, n_free, active, pop, pop_idx, maxiter, reset_interval):
    """The 3-point NFT update scan shared by the sharded sweeps (update
    math from :func:`queasars_tpu.optim.nft_math.nft_three_point_update`
    — the same single source of truth as optim/nft.py)."""

    def step(carry, k):
        angles_c, z0 = carry
        z0 = jax.lax.cond((k % reset_interval) == 0, lambda: objective(angles_c), lambda: z0)
        idx = jnp.where(n_free > 0, k % jnp.maximum(n_free, 1), 0)
        coord = coords[pop_idx, idx]
        l, q, a_i = coord[:, 0], coord[:, 1], coord[:, 2]
        plus = angles_c.at[pop_idx, l, q, a_i].add(jnp.pi / 2)
        minus = angles_c.at[pop_idx, l, q, a_i].add(-jnp.pi / 2)
        z1 = objective(plus)
        z3 = objective(minus)
        shift, minimum_value = nft_three_point_update(z0, z1, z3)
        updated = angles_c.at[pop_idx, l, q, a_i].add(shift + jnp.pi)
        apply = jnp.logical_and(active, n_free > 0)
        angles_c = jnp.where(apply[:, None, None, None], updated, angles_c)
        z0 = jnp.where(apply, minimum_value, z0)
        return (angles_c, z0), None

    init = (angles, jnp.zeros(pop, jnp.float32))
    (angles_final, z0), _ = jax.lax.scan(step, init, jnp.arange(maxiter))
    return angles_final, z0


def amplitude_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D mesh over the amplitude axis."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), (AMP_AXIS,))


def pop_amp_mesh(n_pop: int, n_amp: int, devices=None) -> Mesh:
    """A 2-D ``(pop, amp)`` mesh: ``n_pop`` population groups, each
    holding one amplitude-sharded copy of the statevector over ``n_amp``
    devices.  Adjacent devices land on the amp axis so the per-state
    ppermute exchanges ride the closest ICI links."""
    if devices is None:
        devices = jax.devices()[: n_pop * n_amp]
    arr = np.array(devices)
    if arr.size != n_pop * n_amp:
        raise ValueError(f"need {n_pop * n_amp} devices, got {arr.size}")
    return Mesh(arr.reshape(n_pop, n_amp), (POP_AXIS, AMP_AXIS))


def as_amplitude_mesh(mesh: Mesh) -> Mesh:
    """Rebuild any 1-D mesh with the amplitude axis name."""
    if AMP_AXIS in mesh.axis_names:
        return mesh
    return Mesh(mesh.devices.reshape(-1), (AMP_AXIS,))


def _fold_default() -> bool:
    """Default for the evaluator's ``use_fold`` knob: on, unless the
    ``QUEASARS_SHARD_FOLD`` env var says 0."""
    import os

    return os.environ.get("QUEASARS_SHARD_FOLD", "1") == "1"


def as_pop_amp_mesh(mesh: Mesh, amp_devices: Optional[int] = None) -> Mesh:
    """Coerce any mesh to the 2-D ``(pop, amp)`` form.

    A mesh already carrying both axes passes through.  Otherwise its
    devices are flattened and refactored: ``amp_devices=None`` puts ALL
    devices on the amplitude axis (the round-2 behavior of handing a
    population mesh to this evaluator), an explicit count splits
    ``(total // amp_devices, amp_devices)``.
    """
    if POP_AXIS in mesh.axis_names and AMP_AXIS in mesh.axis_names:
        if amp_devices is not None and mesh.shape[AMP_AXIS] != amp_devices:
            raise ValueError(
                f"mesh already factors the amp axis as {mesh.shape[AMP_AXIS]}, "
                f"conflicting with amp_devices={amp_devices}"
            )
        return mesh
    flat = mesh.devices.reshape(-1)
    amp = flat.size if amp_devices is None else int(amp_devices)
    if amp < 1 or flat.size % amp != 0:
        raise ValueError(f"amp_devices={amp} must divide the device count {flat.size}")
    return Mesh(flat.reshape(flat.size // amp, amp), (POP_AXIS, AMP_AXIS))


class AmplitudeShardedExpectationEvaluator(BaseCircuitEvaluator):
    """Expectation evaluator with each statevector sharded across a mesh.

    :param operator: any PauliSum.  Diagonal operators run every path;
        general (X/Y-carrying) operators run the exact estimator path
        (alpha=1, no shots) via cross-shard flips, and the finite-shot
        path via QWC measurement grouping (the sharded twin of
        sim/grouped_sampling.py: per-group basis-rotation layers +
        shard-local rotated-basis tables + the hierarchical inverse-CDF
        sampler).  Only CVaR tails (alpha<1) require a diagonal operator
        — grouped measurements of different bases do not form one
        empirical energy distribution (reference: the estimator is
        operator-agnostic, circuit_evaluation.py:164-219; the reference's
        sampler path is diagonal-only, :94-161)
    :param mesh: the devices to run on.  A 2-D ``(pop, amp)`` mesh is
        used as-is; a 1-D mesh is factored per ``amp_devices``
    :param alpha: CVaR lower-tail mass in (0, 1]
    :param shots: finite measurement shots (None = exact distributions)
    :param seed: RNG seed for the shot sampling / precision shot stream
    :param precision: target standard error of each reported energy,
        realized as ``ceil(precision**-2)`` measurement shots through the
        fully-distributed shot sampler (Aer EstimatorV2's
        precision-to-shots rule — the true multinomial noise law,
        matching StatevectorExpectationEvaluator); mutually exclusive
        with ``shots``
    :param initial_state: optional start state for every circuit — a
        [2^n] complex / [2, 2^n] real-planes array or an
        :class:`EVQEIndividual`; prepared once, amp-sharded, and
        re-entered shard-locally by every simulation
    :param amp_devices: devices per amplitude shard group when ``mesh``
        is 1-D (None = all of them; the remaining factor shards the
        population axis)
    :param table_mode: ``"device"`` (default) builds the diagonal energy
        table shard-locally inside the mesh (f32 term scan; no host 2^n
        array); ``"host"`` builds it on the host with f64 accumulation
        (for small n where the exponential JSSP weights need the extra
        carry) and ships each device only its shard
    :param use_fold: route every diagonal-operator simulation through the
        kron-fold application (sim/sharded_fold.py: group matmuls for the
        shard-local low qubits + per-qubit combines above, instead of one
        barriered pass per genome slot) — the exact estimator path, the
        distributed shot-sampling path, the exact-CVaR quantile
        bisection, and the device NFT sweeps (plain, rest-base prefix,
        fused multi-slot: prefix/base/suffix states all fold).
        Default (None) = on, unless ``QUEASARS_SHARD_FOLD=0``;
        results stay bit-identical across (pop, amp) factorizations
        either way, but the fold's float stream differs from the per-gate
        path's (~1e-6 on probabilities/energies, which can also steer an
        occasional boundary shot sample)
    :param shot_allocation: for non-diagonal finite-shot operators, how
        the QWC measurement groups share the budget — ``"per_group"``
        (default: every group gets ``shots``) or ``"proportional"``
        (``shots`` is the total, split by coefficient L1 norms; see
        ``grouped_sampling.allocate_shots``).  Ignored otherwise
    """

    def __init__(
        self,
        operator: PauliSum,
        mesh: Mesh,
        alpha: float = 1.0,
        shots: Optional[int] = None,
        seed: int = 0,
        precision: float = 0.0,
        initial_state: Union[np.ndarray, EVQEIndividual, None] = None,
        amp_devices: Optional[int] = None,
        table_mode: str = "device",
        use_fold: Optional[bool] = None,
        shot_allocation: str = "per_group",
    ):
        super().__init__(operator.n_qubits)
        if not 0 < alpha <= 1:
            raise ValueError("alpha (the CVaR tail fraction) lies outside (0, 1]")
        if precision < 0:
            raise ValueError("precision must be non-negative")
        if table_mode not in ("device", "host"):
            raise ValueError("table_mode must be 'device' or 'host'")
        if shot_allocation not in ("per_group", "proportional"):
            raise ValueError("shot_allocation must be 'per_group' or 'proportional'")
        self.operator = operator
        self.mesh = as_pop_amp_mesh(mesh, amp_devices)
        self.n_pop_devices = self.mesh.shape[POP_AXIS]
        self.n_amp_devices = self.mesh.shape[AMP_AXIS]
        self._pad_multiple = lcm(self.n_pop_devices, POPULATION_PAD)
        self.alpha = float(alpha)
        self.shots = None if shots is None else int(shots)
        self.precision = float(precision)
        if self.precision > 0.0:
            if self.shots is not None:
                raise ValueError(
                    "precision and shots are mutually exclusive: precision IS "
                    "a shot count (ceil(precision**-2)) through the sampler"
                )
            # shot-based precision (Aer EstimatorV2's rule) through the
            # fully-distributed sampler — true multinomial noise, seeded,
            # bit-identical across (pop, amp) factorizations
            self.shots = int(np.ceil(self.precision ** -2.0))

        self._diagonal = operator.is_diagonal
        if self._diagonal:
            coeffs, z_masks = diagonal_terms(operator)
            if table_mode == "host":
                table = diagonal_energy_table(operator, dtype=np.float32)
                self._table = self._place_table(table)
            else:
                self._table = build_device_table(self.mesh, coeffs, z_masks, self.n_qubits)
            # strict upper bound on |energy| for the exact-CVaR quantile
            # bisection (every diagonal energy is a signed coefficient sum)
            self._energy_bound = float(np.abs(coeffs).sum()) + 1.0
        else:
            if self.alpha < 1.0:
                raise CircuitEvaluatorException(
                    "CVaR (alpha<1) requires a diagonal operator — grouped "
                    "measurements of different bases do not form one "
                    "empirical energy distribution to take a tail of"
                )
            self._table = None
            if self.shots is not None:
                # finite shots: QWC measurement grouping, fully sharded —
                # per-group basis-rotation layers on the host, per-group
                # rotated-basis tables built SHARD-LOCALLY inside the mesh
                # (the sharded twin of sim/grouped_sampling.py)
                from queasars_tpu.sim.grouped_sampling import (
                    allocate_shots,
                    grouped_shard_operands,
                    grouped_weights,
                )
                from queasars_tpu.sim.sharded_statevector import (
                    build_device_tables_batch,
                )

                (
                    self._rot_types,
                    self._rot_angles,
                    g_coeffs,
                    g_masks,
                    self._grouped_const,
                ) = grouped_shard_operands(operator)
                self._grouped_tables = build_device_tables_batch(
                    self.mesh, g_coeffs, g_masks, self.n_qubits
                )
                self._group_shots = (
                    allocate_shots(grouped_weights(operator), self.shots)
                    if shot_allocation == "proportional"
                    else None
                )
            else:
                _, local_bits = _mesh_bits(self.mesh, self.n_qubits)
                self._xg_list, self._terms = group_general_terms(
                    operator.coeffs.real.astype(np.float32),
                    operator.coeffs.imag.astype(np.float32),
                    operator.z[:, 0],
                    operator.x[:, 0],
                    local_bits,
                )

        self._initial = self._prepare_initial_sharded(initial_state)
        # fold applies to every diagonal-operator path (exact estimator,
        # distributed shot sampling, exact CVaR, device NFT sweeps); the
        # general-operator matrix-free path keeps the per-gate engine.
        # The enablement must
        # never depend on the device count (the mesh bit-identity
        # invariant) — it reads only the knob/env
        self._use_fold = (
            (
                (_fold_default() and self.n_qubits >= 10)
                if use_fold is None
                else bool(use_fold)
            )
            and self._diagonal
        )
        self._key = jax.random.PRNGKey(seed)
        self._counter = 0
        self._fns: dict = {}

    # ------------------------------------------------------------------
    # placement helpers
    # ------------------------------------------------------------------

    def set_mesh(self, mesh) -> None:
        """Population-axis attach requests do not apply here (the mesh
        already factors both axes); ignore them."""

    def _place_table(self, table: np.ndarray):
        """Place a host-built table amp-sharded (multi-controller: each
        process materializes only the shards its devices hold)."""
        sharding = NamedSharding(self.mesh, P(AMP_AXIS))
        if jax.process_count() > 1:
            return jax.make_array_from_callback(table.shape, sharding, lambda idx: table[idx])
        return jax.device_put(table, sharding)

    def _prepare_initial_sharded(self, initial_state):
        """Prepare the start state ONCE as an amp-sharded [2, 2^n] array
        (replicated over the pop axis)."""
        if initial_state is None:
            return None
        if isinstance(initial_state, EVQEIndividual):
            if initial_state.n_qubits != self.n_qubits:
                raise CircuitEvaluatorException(
                    "the initial-state circuit acts on a different qubit count than the operator"
                )
            from queasars_tpu.sim.sharded_statevector import make_sharded_circuit_fn

            packed = PackedPopulation.pack([initial_state])
            fn = make_sharded_circuit_fn(self.mesh, self.n_qubits)
            return fn(
                packed.gate_types[0], packed.controls[0], packed.angles[0], packed.layer_mask[0]
            )
        from queasars_tpu.sim.evaluators import _prepare_initial_state

        stacked = np.asarray(_prepare_initial_state(initial_state, self.n_qubits))
        sharding = NamedSharding(self.mesh, P(None, AMP_AXIS))
        if jax.process_count() > 1:
            return jax.make_array_from_callback(
                stacked.shape, sharding, lambda idx: stacked[idx]
            )
        return jax.device_put(stacked, sharding)

    def _pad_pop(self, array) -> np.ndarray:
        """Zero-pad axis 0 to the factorization-independent multiple."""
        arr = np.asarray(array)
        pop = arr.shape[0]
        padded = -(-pop // self._pad_multiple) * self._pad_multiple
        if padded == pop:
            return arr
        return np.pad(arr, [(0, padded - pop)] + [(0, 0)] * (arr.ndim - 1))

    def _globalize(self, arrays, specs):
        """Host arrays -> global arrays when the mesh spans multiple
        controller processes (single-process: pass through; shard_map
        places host arrays itself)."""
        if jax.process_count() <= 1:
            return tuple(arrays)

        out = []
        for value, spec in zip(arrays, specs):
            sharding = NamedSharding(self.mesh, spec)
            arr = np.asarray(value)
            out.append(
                jax.make_array_from_callback(
                    arr.shape, sharding, lambda idx, arr=arr: arr[idx]
                )
            )
        return tuple(out)

    def _pop_args(self, packed, angles, extra=()):
        """Pad + (multi-controller) globalize the population-sharded
        operand tuple ``(gate_types, controls, angles, layer_mask,
        *extra)``."""
        arrays = [
            self._pad_pop(packed.gate_types),
            self._pad_pop(packed.controls),
            self._pad_pop(np.asarray(angles)),
            self._pad_pop(packed.layer_mask),
        ] + [self._pad_pop(e) for e in extra]
        return self._globalize(arrays, [P(POP_AXIS)] * len(arrays))

    # ------------------------------------------------------------------
    # compiled-function caches
    # ------------------------------------------------------------------

    def _shape_fns(self, packed):
        shape = (packed.max_layers, self._initial is not None)
        if shape not in self._fns:
            self._fns[shape] = (
                make_sharded_population_energies_fn(
                    self.mesh, self.n_qubits, with_initial=self._initial is not None
                ),
                make_sharded_population_probs_fn(
                    self.mesh, self.n_qubits, with_initial=self._initial is not None
                ),
            )
        return self._fns[shape]

    def _fold_fn(self, packed):
        """Compiled folded exact-energies function (sharded_fold.py)."""
        key = ("fold", packed.max_layers, self._initial is not None)
        if key not in self._fns:
            from queasars_tpu.sim.sharded_fold import (
                make_folded_population_energies_fn,
            )

            self._fns[key] = make_folded_population_energies_fn(
                self.mesh, self.n_qubits, with_initial=self._initial is not None
            )
        return self._fns[key]

    def _general_fn(self):
        key = ("general", self._initial is not None)
        if key not in self._fns:
            self._fns[key] = make_sharded_general_energies_fn(
                self.mesh, self.n_qubits, self._xg_list,
                with_initial=self._initial is not None,
            )
        return self._fns[key]

    def _map_local_states(self):
        """Per-shard population map for shard_map bodies: returns
        ``map_states(gate_types, controls, angles, layer_mask, device_id,
        extras, per_state, initial_local=None, initial_stack=None)`` which
        simulates each individual's local amplitude shard — with the
        kron-fold engine (``self._use_fold``: group matmuls + diagonal
        phase passes) or the per-gate engine — and stacks
        ``per_state(state, *extras_i)``.  ``initial_local`` is one shard
        state shared by every individual; ``initial_stack`` [P, 2,
        2^local] gives each individual its own start (the device sweeps'
        cached layer-prefix states).  Both engines keep the fixed-tree
        reduction contract, so callers stay bit-identical across
        (pop, amp) factorizations."""
        n_devices, local_bits = _mesh_bits(self.mesh, self.n_qubits)
        n_qubits = self.n_qubits
        if self._use_fold:
            from queasars_tpu.sim.sharded_fold import (
                _simulate_local_folded,
                check_folded_bits,
                default_folded_bits,
            )
            from queasars_tpu.sim.fold_pipeline import build_fold_pipeline

            folded_bits = default_folded_bits(n_qubits)
            check_folded_bits(self.mesh, n_qubits, folded_bits)

            def map_states(gate_types, controls, angles, layer_mask, device_id,
                           extras, per_state, initial_local=None,
                           initial_stack=None):
                pipe = build_fold_pipeline(
                    gate_types, controls, angles, layer_mask, n_qubits
                )
                starts = () if initial_stack is None else (initial_stack,)

                def one(args):
                    factors, d_ctrl, d_tgt, d_phase = args[:4]
                    start = args[4] if initial_stack is not None else initial_local
                    state = _simulate_local_folded(
                        factors, d_ctrl, d_tgt, d_phase,
                        device_id, local_bits, n_devices, n_qubits, folded_bits,
                        initial_local=start,
                    )
                    return per_state(state, *args[4 + len(starts):])

                return jax.lax.map(
                    one,
                    (pipe.factors, pipe.diag_ctrl, pipe.diag_tgt, pipe.diag_phase,
                     *starts, *extras),
                )

        else:
            from queasars_tpu.sim.sharded_statevector import _simulate_local

            def map_states(gate_types, controls, angles, layer_mask, device_id,
                           extras, per_state, initial_local=None,
                           initial_stack=None):
                starts = () if initial_stack is None else (initial_stack,)

                def one(args):
                    gt, ctrl, ang, lm = args[:4]
                    start = args[4] if initial_stack is not None else initial_local
                    state = _simulate_local(
                        gt, ctrl, ang, lm, device_id, local_bits, n_devices,
                        n_qubits, initial_local=start,
                    )
                    return per_state(state, *args[4 + len(starts):])

                return jax.lax.map(
                    one, (gate_types, controls, angles, layer_mask, *starts, *extras)
                )

        return map_states

    def _next_keys(self, pop: int) -> np.ndarray:
        self._counter += 1
        base = jax.random.fold_in(self._key, self._counter)
        return np.asarray(jax.random.split(base, pop))

    # ------------------------------------------------------------------
    # device-side NFT sweeps (the exact optimization hot path)
    # ------------------------------------------------------------------

    def _nft_specs(self, n_pop_operands: int, prefix: bool):
        """(in_specs, out_specs) for the sweep shard_maps: population
        operands pop-sharded, the table amp-sharded, the optional initial
        state amp-sharded on its second axis."""
        pop_specs = (P(POP_AXIS),) * n_pop_operands
        table_spec = (P(AMP_AXIS),)
        initial_spec = (P(None, AMP_AXIS),) if self._initial is not None else ()
        return pop_specs + table_spec + initial_spec, (P(POP_AXIS), P(POP_AXIS))

    def _nft_fn(self, maxiter: int, reset_interval: int, prefix: bool = False):
        """Compiled amplitude-sharded NFT sweep (cached per hyperparams;
        shapes are handled by jit retracing).

        With ``prefix=True`` the sweep runs layer-prefix-cached: the
        frozen prefix layers simulate ONCE (sharded, in the same compiled
        program) and every probe re-enters the cached per-individual shard
        states, applying only the optimized layer (gathered to the [P,1,n]
        tensors by the caller)."""
        from jax import shard_map

        key = ("nft", maxiter, reset_interval, prefix)
        if key in self._fns:
            return self._fns[key]

        n_devices, local_bits = _mesh_bits(self.mesh, self.n_qubits)
        map_states = self._map_local_states()

        if prefix:
            from queasars_tpu.sim.sharded_statevector import (
                _block_counts,
                _tree_reduce_last,
            )

            device_bits = int(np.log2(n_devices))
            total_blocks, blocks_local = _block_counts(n_devices, self.n_qubits)
            local_len = 1 << local_bits

            # Rest-base pair-form sweep: within a layer every slot gate
            # acts on a disjoint qubit set (one role per qubit), so the
            # probed slot's gate G(q) commutes with the REST of the layer
            # and |psi> = G(q) . REST . |prefix>.  Each step simulates
            # BASE = REST|prefix> once (the swept layer with slot q
            # blanked to identity), builds the XOR-2^q partner of the
            # base and of the energy table (a local bit-reverse or one
            # ppermute), and reduces nine masked pair-contractions with
            # the fixed-block tree order of _blockwise_sum.  Every probe
            # energy — and the z0 reset — is then a scalar combination
            # E(t) = F0 + sum_k c_k(U3(t)) F_k: two full layer
            # applications per step become one, and probes cost no
            # amplitude work at all.  Identical update math
            # (nft_three_point_update); energies are the same sums
            # reordered (~1e-6 f32), and stay bit-identical across
            # (pop, amp) factorizations because every reduction follows
            # the fixed-block scheme.

            def _local_partner(x, q):
                """x[..., i] -> x[..., i XOR 2^q] for a LOCAL bit q
                (clamped; callers select away the global case)."""
                fns = []
                for t in range(local_bits):
                    high = local_len >> (t + 1)
                    low = 1 << t

                    def f(xx, high=high, low=low):
                        shaped = xx.reshape(xx.shape[:-1] + (high, 2, low))
                        return shaped[..., ::-1, :].reshape(xx.shape)

                    fns.append(f)
                return jax.lax.switch(
                    jnp.minimum(jnp.maximum(q, 0), local_bits - 1), fns, x
                )

            def nft(
                gate_types, controls, prefix_mask, full_angles,
                gate1, ctrl1, angles, coords, n_free, active, table_local,
                initial_local=None,
            ):
                pop = gate_types.shape[0]
                pop_idx = jnp.arange(pop)
                device_id = jax.lax.axis_index(AMP_AXIS)
                ones_mask = jnp.ones((pop, 1), dtype=prefix_mask.dtype)
                n = gate1.shape[2]

                prefix_local = map_states(
                    gate_types, controls, full_angles, prefix_mask, device_id,
                    (), lambda s: s, initial_local=initial_local,
                )  # [P, 2, 2^local]

                local_idx = jax.lax.broadcasted_iota(jnp.uint32, (1, local_len), 1)[0]

                def amp_bit(b):
                    """[2^local] bit ``b`` of the global amplitude index
                    (local bits from the in-shard index, global bits from
                    the device id — the _control_active convention)."""
                    bu = jnp.maximum(b, 0).astype(jnp.uint32)
                    lb = (local_idx >> jnp.minimum(bu, jnp.uint32(local_bits - 1))) & 1
                    gb = (
                        (device_id >> jnp.maximum(b - local_bits, 0)) & 1
                    ).astype(jnp.uint32)
                    return jnp.where(b < local_bits, lb, gb)

                perms = [
                    [(i, i ^ (1 << b)) for i in range(n_devices)]
                    for b in range(device_bits)
                ]

                def step(carry, k):
                    angles_c, z0 = carry
                    idx = jnp.where(n_free > 0, k % jnp.maximum(n_free, 1), 0)
                    coord = coords[pop_idx, idx]
                    qv, av = coord[:, 1], coord[:, 2]

                    # BASE = REST|prefix>: blank the probed slot to identity
                    slot_ids = jnp.arange(n)[None, None, :]
                    gt_rest = jnp.where(slot_ids == qv[:, None, None], 0, gate1)

                    base = map_states(
                        gt_rest, ctrl1, angles_c, ones_mask, device_id,
                        (), lambda s: s, initial_stack=prefix_local,
                    )  # [P, 2, 2^local]

                    # global-bit partner variants, batched (uniform collectives)
                    if device_bits:
                        gparts = jnp.stack(
                            [jax.lax.ppermute(base, AMP_AXIS, perm) for perm in perms]
                        )  # [B, P, 2, L]
                        tparts = jnp.stack(
                            [
                                jax.lax.ppermute(table_local, AMP_AXIS, perm)
                                for perm in perms
                            ]
                        )  # [B, L]
                        gparts_pi = jnp.moveaxis(gparts, 0, 1)  # [P, B, 2, L]

                    gate_q = gate1[pop_idx, 0, qv]
                    ctrl_q = ctrl1[pop_idx, 0, qv]

                    def per_individual(args):
                        if device_bits:
                            base_i, q, gq, cq, gpart_i = args
                        else:
                            base_i, q, gq, cq = args
                        lp = _local_partner(base_i, q)
                        tp_l = _local_partner(table_local, q)
                        if device_bits:
                            gi = jnp.clip(q - local_bits, 0, device_bits - 1)
                            gp = jax.lax.dynamic_index_in_dim(gpart_i, gi, keepdims=False)
                            tp_g = jax.lax.dynamic_index_in_dim(tparts, gi, keepdims=False)
                            is_local = q < local_bits
                            partner = jnp.where(is_local, lp, gp)
                            tpart = jnp.where(is_local, tp_l, tp_g)
                        else:
                            partner, tpart = lp, tp_l
                        m0 = amp_bit(q) == 0
                        is_crot = gq == 3
                        cbit = amp_bit(cq) == 1
                        cm = jnp.where(is_crot, cbit, True)
                        mask_pair = jnp.logical_and(m0, cm).astype(jnp.float32)
                        mask_f0 = jnp.logical_not(cm).astype(jnp.float32)
                        a_re, a_im = base_i[0], base_i[1]
                        b_re, b_im = partner[0], partner[1]
                        abs_a = a_re * a_re + a_im * a_im
                        abs_b = b_re * b_re + b_im * b_im
                        c_re = a_re * b_re + a_im * b_im
                        c_im = a_im * b_re - a_re * b_im
                        t_a = table_local * mask_pair
                        t_b = tpart * mask_pair
                        planes = jnp.stack(
                            [
                                table_local * mask_f0 * abs_a,
                                t_a * abs_a, t_a * abs_b, t_a * c_re, t_a * c_im,
                                t_b * abs_a, t_b * abs_b, t_b * c_re, t_b * c_im,
                            ]
                        )  # [9, 2^local]
                        blocks = jax.lax.optimization_barrier(planes).reshape(
                            9, blocks_local, -1
                        )
                        return _tree_reduce_last(blocks)  # [9, blocks_local]

                    map_args = (base, qv, gate_q, ctrl_q)
                    if device_bits:
                        map_args = map_args + (gparts_pi,)
                    partials = jax.lax.map(per_individual, map_args)  # [P, 9, bl]
                    gathered = jax.lax.all_gather(partials, AMP_AXIS)  # [A, P, 9, bl]
                    per_pk = jnp.moveaxis(gathered, 0, 2).reshape(pop, 9, total_blocks)
                    F = _tree_reduce_last(per_pk)  # [P, 9], replicated over amp

                    th0 = angles_c[pop_idx, 0, qv, 0]
                    ph_0 = angles_c[pop_idx, 0, qv, 1]
                    la0 = angles_c[pop_idx, 0, qv, 2]
                    theta = angles_c[pop_idx, 0, qv, av]
                    gated = jnp.logical_or(gate_q == 1, gate_q == 3)

                    def form(tval):
                        te = jnp.where(av == 0, tval, th0)
                        pe = jnp.where(av == 1, tval, ph_0)
                        le = jnp.where(av == 2, tval, la0)
                        cos_h, sin_h = jnp.cos(te * 0.5), jnp.sin(te * 0.5)
                        one = jnp.ones_like(tval)
                        zero = jnp.zeros_like(tval)
                        u00r = jnp.where(gated, cos_h, one)
                        u01r = jnp.where(gated, -jnp.cos(le) * sin_h, zero)
                        u01i = jnp.where(gated, -jnp.sin(le) * sin_h, zero)
                        u10r = jnp.where(gated, jnp.cos(pe) * sin_h, zero)
                        u10i = jnp.where(gated, jnp.sin(pe) * sin_h, zero)
                        u11r = jnp.where(gated, jnp.cos(pe + le) * cos_h, one)
                        u11i = jnp.where(gated, jnp.sin(pe + le) * cos_h, zero)
                        two = jnp.float32(2.0)
                        c1 = u00r * u00r
                        c2 = u01r * u01r + u01i * u01i
                        re01 = u00r * u01r
                        im01 = -u00r * u01i
                        c5 = u10r * u10r + u10i * u10i
                        c6 = u11r * u11r + u11i * u11i
                        re11 = u10r * u11r + u10i * u11i
                        im11 = u10i * u11r - u10r * u11i
                        e = F[:, 0]
                        e = e + c1 * F[:, 1]
                        e = e + c2 * F[:, 2]
                        e = e + two * re01 * F[:, 3]
                        e = e - two * im01 * F[:, 4]
                        e = e + c5 * F[:, 5]
                        e = e + c6 * F[:, 6]
                        e = e + two * re11 * F[:, 7]
                        e = e - two * im11 * F[:, 8]
                        return e

                    z0 = jax.lax.cond(
                        (k % reset_interval) == 0, lambda: form(theta), lambda: z0
                    )
                    z1 = form(theta + jnp.pi / 2)
                    z3 = form(theta - jnp.pi / 2)
                    shift, minimum_value = nft_three_point_update(z0, z1, z3)
                    updated = angles_c.at[pop_idx, 0, qv, av].add(shift + jnp.pi)
                    apply = jnp.logical_and(active, n_free > 0)
                    angles_c = jnp.where(apply[:, None, None, None], updated, angles_c)
                    z0 = jnp.where(apply, minimum_value, z0)
                    return (angles_c, z0), None

                init = (angles, jnp.zeros(pop, jnp.float32))
                (angles_final, z0), _ = jax.lax.scan(step, init, jnp.arange(maxiter))
                return angles_final, z0

            in_specs, out_specs = self._nft_specs(10, prefix=True)
        else:

            from queasars_tpu.sim.sharded_statevector import _blockwise_energy

            def nft(
                gate_types, controls, angles, layer_mask, coords, n_free, active,
                table_local, initial_local=None,
            ):
                pop = gate_types.shape[0]
                pop_idx = jnp.arange(pop)
                device_id = jax.lax.axis_index(AMP_AXIS)

                def per_state(state):
                    probs = state[0] ** 2 + state[1] ** 2
                    return _blockwise_energy(
                        probs, table_local, n_devices, self.n_qubits
                    )

                def objective(a):
                    return map_states(
                        gate_types, controls, a, layer_mask, device_id, (),
                        per_state, initial_local=initial_local,
                    )

                return _nft_scan_body(
                    objective, angles, coords, n_free, active, pop, pop_idx,
                    maxiter, reset_interval,
                )

            in_specs, out_specs = self._nft_specs(7, prefix=False)

        mapped = jax.jit(
            shard_map(
                nft, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        )
        self._fns[key] = mapped
        return mapped

    def _nft_slots_fn(self, maxiter: int, reset_interval: int):
        """Compiled amplitude-sharded fused multi-slot sweep: scan over
        layer slots, each slot simulating its frozen layer prefix once
        (sharded) and probing with only the suffix layers — the >20-qubit
        analog of optim/nft.py's ``_nft_slots_scan``."""
        from jax import shard_map

        key = ("nft_slots", maxiter, reset_interval)
        if key in self._fns:
            return self._fns[key]

        from queasars_tpu.sim.sharded_statevector import _blockwise_energy

        n_devices, local_bits = _mesh_bits(self.mesh, self.n_qubits)
        map_states = self._map_local_states()

        def nft(
            gate_types, controls, angles, layer_mask, coords_ps, n_free_ps,
            active_ps, slot_layer_ps, table_local, initial_local=None,
        ):
            pop = gate_types.shape[0]
            pop_idx = jnp.arange(pop)
            max_layers = gate_types.shape[1]
            layer_idx = jnp.arange(max_layers)
            device_id = jax.lax.axis_index(AMP_AXIS)

            def per_state_energy(state):
                probs = state[0] ** 2 + state[1] ** 2
                return _blockwise_energy(probs, table_local, n_devices, self.n_qubits)

            def slot_body(angles_c, xs):
                coords, n_free, active, slot_layer = xs
                prefix_mask = jnp.logical_and(
                    layer_mask, layer_idx[None, :] < slot_layer[:, None]
                )
                suffix_mask = jnp.logical_and(
                    layer_mask, layer_idx[None, :] >= slot_layer[:, None]
                )

                prefix_local = map_states(
                    gate_types, controls, angles_c, prefix_mask, device_id,
                    (), lambda s: s, initial_local=initial_local,
                )  # [P, 2, 2^local]

                def objective(a):
                    return map_states(
                        gate_types, controls, a, suffix_mask, device_id, (),
                        per_state_energy, initial_stack=prefix_local,
                    )

                return _nft_scan_body(
                    objective, angles_c, coords, n_free, active, pop, pop_idx,
                    maxiter, reset_interval,
                )

            xs = (
                jnp.swapaxes(coords_ps, 0, 1),
                jnp.swapaxes(n_free_ps, 0, 1),
                jnp.swapaxes(active_ps, 0, 1),
                jnp.swapaxes(slot_layer_ps, 0, 1),
            )

            def scan_body(angles_c, x):
                angles_out, z0 = slot_body(angles_c, x)
                return angles_out, z0

            angles_final, z0_slots = jax.lax.scan(scan_body, angles, xs)
            return angles_final, z0_slots[-1]

        in_specs, out_specs = self._nft_specs(8, prefix=False)
        mapped = jax.jit(
            shard_map(
                nft, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        )
        self._fns[key] = mapped
        return mapped

    def _device_sweep_applies(self, config) -> bool:
        """The device sweeps cover the exact diagonal estimator objective
        (same conditions the optimizer's own fusions require)."""
        if not self._diagonal:
            return False
        if self.alpha < 1.0 or self.shots is not None or self.precision > 0.0:
            return False
        if getattr(config, "five_point", False):
            return False
        return True

    def _initial_extra(self):
        return (self._initial,) if self._initial is not None else ()

    def nft_minimize_slots(self, packed, coords, n_free, active, slot_layers, angles, config, seed):
        """Fused multi-slot parameter search over the mesh — same
        contract as ``BatchedNFT.minimize_slots`` device hooks: slot
        arrays are [P, S, ...], ``slot_layers`` carries ``max_layers``
        for sat-out slots (empty suffix), and the whole slot sequence
        runs as ONE compiled SPMD scan.  Returns None when the
        host-stepped path is required (general operators, CVaR, shots,
        precision noise, five-point) or the cache knob is explicitly
        off."""
        if not self._device_sweep_applies(config):
            return None
        cache_flag = getattr(config, "cache_prefix", None)
        if cache_flag is not None and not cache_flag:
            return None
        pop = packed.n_individuals
        fn = self._nft_slots_fn(config.maxiter, config.reset_interval)
        args = self._pop_args(
            packed, angles,
            extra=(
                np.asarray(coords), np.asarray(n_free), np.asarray(active),
                np.asarray(slot_layers, np.int32),
            ),
        )
        out_angles, energies = fn(*args, self._table, *self._initial_extra())
        return np.asarray(out_angles)[:pop], np.asarray(energies)[:pop]

    def nft_minimize(self, packed, coords, n_free, active, angles, config, seed, last_layer=None):
        """Device-side NFT sweep for BatchedNFT's evaluator hook: the whole
        maxiter scan (simulation, collective reductions, parameter
        updates) runs as ONE compiled SPMD program over the (pop, amp)
        mesh — instead of one host dispatch per probe.  Returns None when
        this evaluator configuration needs the host-stepped path (general
        operators, CVaR tails, finite shots, precision noise, five-point
        NFT).

        ``last_layer`` (see NFTConfig.cache_prefix) enables the
        layer-prefix-cached sweep: the frozen prefix simulates once
        (sharded, inside the same compiled program) and every probe
        applies only the optimized layer from the cached shard states —
        default-on for this evaluator (the >20-qubit production path),
        opt out with ``NFTConfig(cache_prefix=False)``."""
        if not self._device_sweep_applies(config):
            return None
        cache_flag = getattr(config, "cache_prefix", None)
        use_prefix = last_layer is not None and (cache_flag is None or cache_flag)
        pop = packed.n_individuals
        a_full = np.asarray(angles)
        if use_prefix:
            ll = np.asarray(last_layer, np.int32)
            prefix_mask = np.logical_and(
                packed.layer_mask, np.arange(packed.max_layers)[None, :] < ll[:, None]
            )
            gt1 = np.take_along_axis(packed.gate_types, ll[:, None, None], axis=1)
            ctrl1 = np.take_along_axis(packed.controls, ll[:, None, None], axis=1)
            a1 = np.take_along_axis(a_full, ll[:, None, None, None], axis=1)
            coords1 = np.asarray(coords).copy()
            coords1[:, :, 0] = 0
            fn = self._nft_fn(config.maxiter, config.reset_interval, prefix=True)
            arrays = [
                self._pad_pop(packed.gate_types), self._pad_pop(packed.controls),
                self._pad_pop(prefix_mask), self._pad_pop(a_full),
                self._pad_pop(gt1), self._pad_pop(ctrl1), self._pad_pop(a1),
                self._pad_pop(coords1), self._pad_pop(np.asarray(n_free)),
                self._pad_pop(np.asarray(active)),
            ]
            args = self._globalize(arrays, [P(POP_AXIS)] * len(arrays))
            out_a1, energies = fn(*args, self._table, *self._initial_extra())
            merged = a_full.copy()
            merged[np.arange(pop), ll] = np.asarray(out_a1)[:pop, 0]
            return merged, np.asarray(energies)[:pop]
        fn = self._nft_fn(config.maxiter, config.reset_interval)
        args = self._pop_args(
            packed, a_full,
            extra=(np.asarray(coords), np.asarray(n_free), np.asarray(active)),
        )
        out_angles, energies = fn(*args, self._table, *self._initial_extra())
        return np.asarray(out_angles)[:pop], np.asarray(energies)[:pop]

    # ------------------------------------------------------------------
    # finite-shot sampling (fully distributed)
    # ------------------------------------------------------------------

    def _sampled_energies_fn(self, shots: int, use_cvar: bool):
        """Compiled fully-distributed shot sampling: width-invariant
        hierarchical inverse-CDF over the amplitude shards
        (``sharded_statevector.blocked_shot_positions`` — the CDF tree
        is built over fixed global-index blocks, so draws are
        bit-identical across (pop, amp) factorizations; the shard
        containing a draw resolves it locally and a psum assembles the
        per-shot energies), then the shot-multiset expectation/CVaR
        reduction over [P, shots].  No full 2^n array ever leaves the
        mesh — multi-controller safe."""
        from jax import shard_map

        key = ("sampled", shots, use_cvar)
        if key in self._fns:
            return self._fns[key]

        from queasars_tpu.sim.expectation import cvar_expectation_from_shot_energies
        from queasars_tpu.sim.sharded_statevector import blocked_shot_positions

        n_amp, _local_bits = _mesh_bits(self.mesh, self.n_qubits)
        map_states = self._map_local_states()

        def sampled(gate_types, controls, angles, layer_mask, keys, alpha, table_local,
                    initial_local=None):
            device_id = jax.lax.axis_index(AMP_AXIS)

            def per_state(state, k):
                local_probs = state[0] ** 2 + state[1] ** 2
                # fixed-tree CDF over global-index blocks: draws and
                # resolved states are bit-identical across (pop, amp)
                # factorizations (sharded_statevector.blocked_shot_positions)
                pos, in_shard = blocked_shot_positions(
                    local_probs, k, shots, device_id, n_amp
                )
                contrib = jnp.where(in_shard, table_local[pos], 0.0)
                return jax.lax.psum(contrib, AMP_AXIS)  # [shots]

            shot_energies = map_states(
                gate_types, controls, angles, layer_mask, device_id, (keys,),
                per_state, initial_local=initial_local,
            )  # [P, shots]
            if use_cvar:
                return cvar_expectation_from_shot_energies(shot_energies, alpha)
            return jnp.mean(shot_energies, axis=-1)

        initial_spec = (P(None, AMP_AXIS),) if self._initial is not None else ()
        mapped = jax.jit(
            shard_map(
                sampled,
                mesh=self.mesh,
                in_specs=(P(POP_AXIS),) * 5 + (P(), P(AMP_AXIS)) + initial_spec,
                out_specs=P(POP_AXIS),
                check_vma=False,
            )
        )
        self._fns[key] = mapped
        return mapped

    def _grouped_sampled_fn(self, shots):
        """Compiled distributed QWC grouped sampling (general operators,
        finite shots): each individual's shard simulates ONCE, then every
        measurement group applies its basis-rotation layer (one genome
        layer of ID/ROT slots — shard-local below the boundary, one
        ppermute per global qubit) and shot-samples the rotated
        distribution via the same hierarchical inverse-CDF as the
        diagonal sampler path, against its shard-local rotated-basis
        table.  Energy = identity constant + sum of group shot means.
        Per-individual keys with per-group fold-ins keep the shot stream
        independent of the population sharding and the group loop order
        (the single-chip grouped sampler's scheme,
        sim/grouped_sampling.py).  ``shots`` is an int (same budget per
        group; traced ``lax.map`` over groups) or a per-group tuple from
        ``allocate_shots`` (unrolled group loop — shapes differ)."""
        from jax import shard_map

        key = ("grouped_sampled", shots)
        if key in self._fns:
            return self._fns[key]

        from queasars_tpu.sim.sharded_statevector import (
            _simulate_local,
            blocked_shot_positions,
        )

        n_devices, local_bits = _mesh_bits(self.mesh, self.n_qubits)
        n_qubits = self.n_qubits
        const = np.float32(self._grouped_const)
        map_states = self._map_local_states()

        def sampled(gate_types, controls, angles, layer_mask, keys,
                    rot_types, rot_angles, tables_local, initial_local=None):
            device_id = jax.lax.axis_index(AMP_AXIS)
            ctrl1 = jnp.full((1, n_qubits), -1, jnp.int32)
            mask1 = jnp.ones((1,), bool)
            n_groups = tables_local.shape[0]

            def per_state(state, k):
                def group_energy(g_types, g_angles, g_table, g_idx, g_shots):
                    rotated = _simulate_local(
                        g_types[None], ctrl1, g_angles[None], mask1,
                        device_id, local_bits, n_devices, n_qubits,
                        initial_local=state,
                    )
                    local_probs = rotated[0] ** 2 + rotated[1] ** 2
                    g_key = jax.random.fold_in(k, g_idx)
                    # width-invariant blocked inverse-CDF (bit-identical
                    # across mesh factorizations)
                    pos, in_shard = blocked_shot_positions(
                        local_probs, g_key, g_shots, device_id, n_devices
                    )
                    contrib = jnp.where(in_shard, g_table[pos], 0.0)
                    shot_energies = jax.lax.psum(contrib, AMP_AXIS)  # [g_shots]
                    return jnp.mean(shot_energies)

                if isinstance(shots, (tuple, list)):
                    total = jnp.float32(0.0)
                    for g in range(len(shots)):
                        total = total + group_energy(
                            rot_types[g], rot_angles[g], tables_local[g],
                            g, int(shots[g]),
                        )
                    return const + total

                group_energies = jax.lax.map(
                    lambda xs: group_energy(*xs, shots),
                    (rot_types, rot_angles, tables_local, jnp.arange(n_groups)),
                )  # [G]
                return const + group_energies.sum()

            return map_states(
                gate_types, controls, angles, layer_mask, device_id, (keys,),
                per_state, initial_local=initial_local,
            )

        initial_spec = (P(None, AMP_AXIS),) if self._initial is not None else ()
        mapped = jax.jit(
            shard_map(
                sampled,
                mesh=self.mesh,
                in_specs=(P(POP_AXIS),) * 5 + (P(), P(), P(None, AMP_AXIS)) + initial_spec,
                out_specs=P(POP_AXIS),
                check_vma=False,
            )
        )
        self._fns[key] = mapped
        return mapped

    # ------------------------------------------------------------------
    # exact (shot-free) CVaR, fully distributed
    # ------------------------------------------------------------------

    def _exact_cvar_fn(self):
        """Compiled distributed exact CVaR: no global sort, no gather of
        the 2^n distribution, no host table — so no qubit ceiling and
        multi-controller safe.

        Per individual, the alpha-quantile energy level V is found by
        bisection on the cumulative mass ``M(tau) = sum p_i [E_i < tau]``
        (one fixed-tree blockwise psum per step, so every amp shard holds
        identical replicated bounds).  The loop contracts the interval
        until no representable f32 separates its ends; the invariant
        ``M(lo) < alpha <= M(hi)`` then forces ``lo`` to be EXACTLY the
        marginal energy level (some state has energy == lo, else
        ``M(hi) == M(lo)`` contradicts the invariant).  The tail value is
        the reference's sequential accumulation semantics
        (expectation_calculation.py:14-32) pooled by level:
        ``(sum_{E<V} pE + (alpha - M(V)) * V) / alpha``.

        Cross-factorization bit-identity holds because every reduction is
        a :func:`_blockwise_sum` fixed tree and the iteration sequence
        depends only on those replicated sums."""
        from jax import shard_map

        key = "exact_cvar"
        if key in self._fns:
            return self._fns[key]

        from queasars_tpu.sim.sharded_statevector import _blockwise_sum

        n_amp = self.n_amp_devices
        n_qubits = self.n_qubits
        bound = np.float32(self._energy_bound)
        map_states = self._map_local_states()

        def exact_cvar(gate_types, controls, angles, layer_mask, alpha, table_local,
                       initial_local=None):
            device_id = jax.lax.axis_index(AMP_AXIS)

            def per_state(state):
                p = state[0] ** 2 + state[1] ** 2

                def mass_below(tau):
                    return _blockwise_sum(
                        jnp.where(table_local < tau, p, 0.0), n_amp, n_qubits
                    )

                def not_adjacent(carry):
                    lo, hi = carry
                    mid = 0.5 * (lo + hi)
                    return jnp.logical_and(mid != lo, mid != hi)

                def halve(carry):
                    lo, hi = carry
                    mid = 0.5 * (lo + hi)
                    below = mass_below(mid) < alpha
                    return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

                lo, _ = jax.lax.while_loop(
                    not_adjacent, halve, (jnp.float32(-bound), jnp.float32(bound))
                )
                tail = table_local < lo
                m_below = _blockwise_sum(jnp.where(tail, p, 0.0), n_amp, n_qubits)
                s_below = _blockwise_sum(
                    jnp.where(tail, p * table_local, 0.0), n_amp, n_qubits
                )
                return (s_below + (alpha - m_below) * lo) / alpha

            return map_states(
                gate_types, controls, angles, layer_mask, device_id, (),
                per_state, initial_local=initial_local,
            )

        initial_spec = (P(None, AMP_AXIS),) if self._initial is not None else ()
        mapped = jax.jit(
            shard_map(
                exact_cvar,
                mesh=self.mesh,
                in_specs=(P(POP_AXIS),) * 4 + (P(), P(AMP_AXIS)) + initial_spec,
                out_specs=P(POP_AXIS),
                check_vma=False,
            )
        )
        self._fns[key] = mapped
        return mapped

    # ------------------------------------------------------------------
    # the evaluate_packed contract
    # ------------------------------------------------------------------

    def evaluate_packed(self, packed, angles=None):
        a = packed.angles if angles is None else angles
        pop = packed.n_individuals
        if not self._diagonal:
            if self.shots is not None:
                # QWC grouped measurement, fully sharded (rotation layers
                # replicated, per-group tables amp-sharded)
                fn = self._grouped_sampled_fn(
                    self._group_shots if self._group_shots is not None else self.shots
                )
                keys = self._next_keys(pop)
                args = self._pop_args(packed, a, extra=(keys,))
                rot = self._globalize(
                    (self._rot_types, self._rot_angles), [P(), P()]
                )
                out = fn(*args, *rot, self._grouped_tables, *self._initial_extra())
                return np.asarray(out)[:pop]
            fn = self._general_fn()
            args = self._pop_args(packed, a)
            terms = self._globalize(
                (
                    self._terms["coeffs_re"], self._terms["coeffs_im"],
                    self._terms["z_local"], self._terms["x_local"],
                    self._terms["z_global"], self._terms["group_id"],
                ),
                [P()] * 6,
            )
            out = fn(*args, *terms, *self._initial_extra())
            return np.asarray(out)[:pop]
        energies_fn, _ = self._shape_fns(packed)
        if self.alpha >= 1.0 and self.shots is None:
            if self._use_fold:
                energies_fn = self._fold_fn(packed)
            args = self._pop_args(packed, a)
            out = energies_fn(*args, self._table, *self._initial_extra())
            return np.asarray(out)[:pop]
        if self.shots is not None:
            # fully distributed shot sampling (hierarchical inverse-CDF
            # over shards) + shot-multiset expectation/CVaR — no 2^n
            # array leaves the mesh, multi-controller safe
            fn = self._sampled_energies_fn(self.shots, self.alpha < 1.0)
            keys = self._next_keys(pop)
            args = self._pop_args(packed, a, extra=(keys,))
            out = fn(*args, jnp.float32(self.alpha), self._table, *self._initial_extra())
            return np.asarray(out)[:pop]
        # exact (shot-free) CVaR: distributed quantile bisection — no
        # global sort or gather, no qubit ceiling, multi-controller safe
        fn = self._exact_cvar_fn()
        args = self._pop_args(packed, a)
        out = fn(*args, jnp.float32(self.alpha), self._table, *self._initial_extra())
        return np.asarray(out)[:pop]
