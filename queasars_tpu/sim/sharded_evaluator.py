"""Amplitude-sharded population evaluator: EVQE beyond one chip's memory.

Capability the reference does not have (SURVEY.md §2.3 P4): one
statevector is split across the mesh (``sim/sharded_statevector.py``) and
the population loops per device — the factorization to use when 2^n
amplitudes no longer fit a single chip (n >~ 30 at f32 pairs on 16 GB
HBM; configurable lower for headroom).  Exposes the same
``evaluate_packed`` contract as the single-chip evaluators, so the whole
solver stack runs unchanged on top — and provides a device-side NFT sweep
(:meth:`AmplitudeShardedExpectationEvaluator.nft_minimize`) so the exact
optimization hot path runs as one compiled SPMD scan over the mesh.

Distribution notes:
- exact alpha=1 energies are fully distributed: local diagonal dot +
  one ``psum`` — only P scalars leave the mesh;
- the exact shot-free CVaR path operates on the amplitude-sharded
  probability array with global ops (the energy-order gather crosses
  shards; XLA inserts the collectives) — correct, cheapest below ~24
  qubits;
- finite-shot paths (any alpha) are fully distributed: hierarchical
  inverse-CDF sampling over the shards (each shard owns its CDF mass
  interval; one psum assembles the per-shot energies) followed by the
  shot-multiset expectation/CVaR reduction — no 2^n array ever leaves
  the mesh;
- multi-controller meshes are supported for the exact (alpha=1, no
  shots) energies path, the finite-shot paths and the device-side NFT
  sweeps: tables globalize via ``make_array_from_callback`` (each
  process materializes its local shards) and replicated genome tensors
  via the same mechanism; only the exact shot-free CVaR path (an
  energy-order gather of the full distribution) stays
  single-controller.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from queasars_tpu.paulis import PauliSum
from queasars_tpu.paulis.diagonal import diagonal_energy_table
from queasars_tpu.sim.evaluators import BaseCircuitEvaluator, CircuitEvaluatorException
from queasars_tpu.sim.expectation import cvar_expectation_from_probs
from queasars_tpu.sim.sharded_statevector import (
    AMP_AXIS,
    make_population_energies_body,
    make_sharded_population_energies_fn,
    make_sharded_population_probs_fn,
)


def _nft_scan_body(objective, angles, coords, n_free, active, pop, pop_idx, maxiter, reset_interval):
    """The 3-point NFT update scan shared by the full-circuit and
    prefix-cached sharded sweeps (same math as optim/nft.py)."""

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
        mid = (z1 + z3) / 2
        shift = jnp.arctan2((z1 - z3) / 2, z0 - mid)
        minimum_value = mid - jnp.sqrt((z0 - mid) ** 2 + ((z1 - z3) / 2) ** 2)
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


def as_amplitude_mesh(mesh: Mesh) -> Mesh:
    """Rebuild any 1-D mesh with the amplitude axis name."""
    if AMP_AXIS in mesh.axis_names:
        return mesh
    return Mesh(mesh.devices.reshape(-1), (AMP_AXIS,))


class AmplitudeShardedExpectationEvaluator(BaseCircuitEvaluator):
    """Expectation evaluator with the statevector sharded across a mesh.

    :param operator: diagonal PauliSum (the EVQE/JSSP hot path; general
        operators would need cross-shard X-flips — not supported here)
    :param mesh: mesh whose devices hold the amplitude shards (any 1-D
        mesh; the axis is renamed to ``amp``)
    :param alpha: CVaR lower-tail mass in (0, 1]
    :param shots: finite measurement shots (None = exact distributions)
    :param seed: RNG seed for the shot sampling / precision noise
    :param precision: standard error of each reported energy (seeded
        Gaussian noise, matching StatevectorExpectationEvaluator)
    """

    def __init__(
        self,
        operator: PauliSum,
        mesh: Mesh,
        alpha: float = 1.0,
        shots: Optional[int] = None,
        seed: int = 0,
        precision: float = 0.0,
    ):
        super().__init__(operator.n_qubits)
        if not operator.is_diagonal:
            raise CircuitEvaluatorException(
                "amplitude sharding supports diagonal operators only "
                "(general Pauli terms need cross-shard amplitude flips)"
            )
        if not 0 < alpha <= 1:
            raise ValueError("alpha must be in the range (0, 1]!")
        if precision < 0:
            raise ValueError("precision must be non-negative")
        self.operator = operator
        self.amp_mesh = as_amplitude_mesh(mesh)
        self.alpha = float(alpha)
        self.shots = None if shots is None else int(shots)
        self.precision = float(precision)
        self._noise_rng = np.random.default_rng(seed)
        table = diagonal_energy_table(operator, dtype=np.float32)
        self._table_host = jnp.asarray(table)  # transferred once
        table_sharding = NamedSharding(self.amp_mesh, P(AMP_AXIS))
        if jax.process_count() > 1:
            # multi-controller: every process materializes only the table
            # shards its local devices hold
            self._table = jax.make_array_from_callback(
                table.shape, table_sharding, lambda idx: table[idx]
            )
        else:
            self._table = jax.device_put(table, table_sharding)
        if self.alpha < 1.0:
            order = np.argsort(table, kind="stable").astype(np.int32)
            self._order = jnp.asarray(order)
            self._sorted = jnp.asarray(table[order])
        self._key = jax.random.PRNGKey(seed)
        self._counter = 0
        self._fns: dict = {}

    def set_mesh(self, mesh) -> None:
        """Population-axis sharding does not apply here (the mesh already
        holds the amplitude axis); ignore attach requests."""

    def _globalize(self, *arrays):
        """Host arrays -> global replicated arrays when the mesh spans
        multiple controller processes (single-process: pass through)."""
        if jax.process_count() <= 1:
            return arrays
        sharding = NamedSharding(self.amp_mesh, P())

        def build(value):
            arr = np.asarray(value)
            return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])

        return tuple(build(a) for a in arrays)

    def _shape_fns(self, packed):
        shape = (packed.n_individuals, packed.max_layers)
        if shape not in self._fns:
            self._fns[shape] = (
                make_sharded_population_energies_fn(self.amp_mesh, self.n_qubits),
                make_sharded_population_probs_fn(self.amp_mesh, self.n_qubits),
            )
        return self._fns[shape]

    def _next_keys(self, pop: int) -> jnp.ndarray:
        self._counter += 1
        base = jax.random.fold_in(self._key, self._counter)
        return jax.random.split(base, pop)

    def _nft_fn(self, maxiter: int, reset_interval: int, prefix: bool = False):
        """Compiled amplitude-sharded NFT sweep (cached per hyperparams;
        shapes are handled by jit retracing).

        With ``prefix=True`` the sweep runs layer-prefix-cached: the
        frozen prefix layers simulate ONCE (sharded, in the same compiled
        program) and every probe re-enters the cached per-individual shard
        states, applying only the optimized layer (gathered to the [P,1,n]
        tensors by the caller)."""
        import jax

        from jax import shard_map
        from jax.sharding import PartitionSpec

        key = ("nft", maxiter, reset_interval, prefix)
        if key in self._fns:
            return self._fns[key]

        body = make_population_energies_body(self.amp_mesh, self.n_qubits)
        if prefix:
            from queasars_tpu.sim.sharded_statevector import _mesh_bits, _simulate_local

            n_devices, local_bits = _mesh_bits(self.amp_mesh, self.n_qubits)

            def nft(
                gate_types, controls, prefix_mask, full_angles,
                gate1, ctrl1, angles, coords, n_free, active, table_local,
            ):
                pop = gate_types.shape[0]
                pop_idx = jnp.arange(pop)
                device_id = jax.lax.axis_index(AMP_AXIS)
                ones_mask = jnp.ones((1,), dtype=prefix_mask.dtype)

                def simulate_prefix(args):
                    gt, ctrl, ang, lm = args
                    return _simulate_local(
                        gt, ctrl, ang, lm, device_id, local_bits, n_devices, self.n_qubits
                    )

                prefix_local = jax.lax.map(
                    simulate_prefix, (gate_types, controls, full_angles, prefix_mask)
                )  # [P, 2, 2^local]

                def objective(a):
                    def one(args):
                        start, gt, ctrl, ang = args
                        state = _simulate_local(
                            gt, ctrl, ang, ones_mask, device_id, local_bits,
                            n_devices, self.n_qubits, initial_local=start,
                        )
                        probs = state[0] ** 2 + state[1] ** 2
                        return jnp.dot(probs, table_local, preferred_element_type=jnp.float32)

                    partials = jax.lax.map(one, (prefix_local, gate1, ctrl1, a))
                    return jax.lax.psum(partials, AMP_AXIS)

                return _nft_scan_body(
                    objective, angles, coords, n_free, active, pop, pop_idx,
                    maxiter, reset_interval,
                )

            mapped = jax.jit(
                shard_map(
                    nft,
                    mesh=self.amp_mesh,
                    in_specs=(PartitionSpec(),) * 10 + (PartitionSpec(AMP_AXIS),),
                    out_specs=(PartitionSpec(), PartitionSpec()),
                    check_vma=False,
                )
            )
            self._fns[key] = mapped
            return mapped

        def nft(gate_types, controls, layer_mask, angles, coords, n_free, active, table_local):
            pop = gate_types.shape[0]
            pop_idx = jnp.arange(pop)

            def objective(a):
                return body(gate_types, controls, a, layer_mask, table_local)

            return _nft_scan_body(
                objective, angles, coords, n_free, active, pop, pop_idx,
                maxiter, reset_interval,
            )

        mapped = jax.jit(
            shard_map(
                nft,
                mesh=self.amp_mesh,
                in_specs=(PartitionSpec(),) * 7 + (PartitionSpec(AMP_AXIS),),
                out_specs=(PartitionSpec(), PartitionSpec()),
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
        import jax

        from jax import shard_map
        from jax.sharding import PartitionSpec

        key = ("nft_slots", maxiter, reset_interval)
        if key in self._fns:
            return self._fns[key]

        from queasars_tpu.sim.sharded_statevector import _mesh_bits, _simulate_local

        n_devices, local_bits = _mesh_bits(self.amp_mesh, self.n_qubits)

        def nft(gate_types, controls, layer_mask, angles, coords_ps, n_free_ps, active_ps, slot_layer_ps, table_local):
            pop = gate_types.shape[0]
            pop_idx = jnp.arange(pop)
            max_layers = gate_types.shape[1]
            layer_idx = jnp.arange(max_layers)
            device_id = jax.lax.axis_index(AMP_AXIS)

            def slot_body(angles_c, xs):
                coords, n_free, active, slot_layer = xs
                prefix_mask = jnp.logical_and(
                    layer_mask, layer_idx[None, :] < slot_layer[:, None]
                )
                suffix_mask = jnp.logical_and(
                    layer_mask, layer_idx[None, :] >= slot_layer[:, None]
                )

                def simulate_prefix(args):
                    gt, ctrl, ang, lm = args
                    return _simulate_local(
                        gt, ctrl, ang, lm, device_id, local_bits, n_devices, self.n_qubits
                    )

                prefix_local = jax.lax.map(
                    simulate_prefix, (gate_types, controls, angles_c, prefix_mask)
                )  # [P, 2, 2^local]

                def objective(a):
                    def one(args):
                        start, gt, ctrl, ang, sm = args
                        state = _simulate_local(
                            gt, ctrl, ang, sm, device_id, local_bits,
                            n_devices, self.n_qubits, initial_local=start,
                        )
                        probs = state[0] ** 2 + state[1] ** 2
                        return jnp.dot(probs, table_local, preferred_element_type=jnp.float32)

                    partials = jax.lax.map(
                        one, (prefix_local, gate_types, controls, a, suffix_mask)
                    )
                    return jax.lax.psum(partials, AMP_AXIS)

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

        mapped = jax.jit(
            shard_map(
                nft,
                mesh=self.amp_mesh,
                in_specs=(PartitionSpec(),) * 8 + (PartitionSpec(AMP_AXIS),),
                out_specs=(PartitionSpec(), PartitionSpec()),
                check_vma=False,
            )
        )
        self._fns[key] = mapped
        return mapped

    def nft_minimize_slots(self, packed, coords, n_free, active, slot_layers, angles, config, seed):
        """Fused multi-slot parameter search over the amplitude mesh —
        same contract as ``BatchedNFT.minimize_slots`` device hooks: slot
        arrays are [P, S, ...], ``slot_layers`` carries ``max_layers``
        for sat-out slots (empty suffix), and the whole slot sequence
        runs as ONE compiled SPMD scan.  Returns None when the
        host-stepped path is required (CVaR, shots, precision noise,
        five-point) or the cache knob is explicitly off."""
        if self.alpha < 1.0 or self.shots is not None or self.precision > 0.0:
            return None
        if getattr(config, "five_point", False):
            return None
        cache_flag = getattr(config, "cache_prefix", None)
        if cache_flag is not None and not cache_flag:
            return None
        fn = self._nft_slots_fn(config.maxiter, config.reset_interval)
        args = self._globalize(
            packed.gate_types, packed.controls, packed.layer_mask, np.asarray(angles),
            np.asarray(coords), np.asarray(n_free), np.asarray(active),
            np.asarray(slot_layers, np.int32),
        )
        out_angles, energies = fn(*args, self._table)
        return np.asarray(out_angles), np.asarray(energies)

    def nft_minimize(self, packed, coords, n_free, active, angles, config, seed, last_layer=None):
        """Device-side NFT sweep for BatchedNFT's evaluator hook: the whole
        maxiter scan (simulation, psum reductions, parameter updates) runs
        as ONE compiled SPMD program over the amplitude mesh — instead of
        one host dispatch per probe.  Returns None when this evaluator
        configuration needs the host-stepped path (CVaR tails, finite
        shots, precision noise, five-point NFT).

        ``last_layer`` (see NFTConfig.cache_prefix) enables the
        layer-prefix-cached sweep: the frozen prefix simulates once
        (sharded, inside the same compiled program) and every probe
        applies only the optimized layer from the cached shard states —
        default-on for this evaluator (the >20-qubit production path),
        opt out with ``NFTConfig(cache_prefix=False)``."""
        if self.alpha < 1.0 or self.shots is not None or self.precision > 0.0:
            return None
        if getattr(config, "five_point", False):
            return None
        cache_flag = getattr(config, "cache_prefix", None)
        use_prefix = last_layer is not None and (cache_flag is None or cache_flag)
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
            args = self._globalize(
                packed.gate_types, packed.controls, prefix_mask, a_full,
                gt1, ctrl1, a1, coords1, n_free, active,
            )
            out_a1, energies = fn(*args, self._table)
            merged = a_full.copy()
            merged[np.arange(packed.n_individuals), ll] = np.asarray(out_a1)[:, 0]
            return merged, np.asarray(energies)
        fn = self._nft_fn(config.maxiter, config.reset_interval)
        args = self._globalize(
            packed.gate_types, packed.controls, packed.layer_mask,
            np.asarray(angles), np.asarray(coords), np.asarray(n_free), np.asarray(active),
        )
        out_angles, energies = fn(*args, self._table)
        return np.asarray(out_angles), np.asarray(energies)

    def _sampled_energies_fn(self, shots: int, use_cvar: bool):
        """Compiled fully-distributed shot sampling: hierarchical
        inverse-CDF over the amplitude shards (each shard owns the CDF
        interval [offset_d, offset_{d+1}) given by the running sum of
        shard masses; the shard containing a draw resolves it locally and
        a psum assembles the per-shot energies), then the shot-multiset
        expectation/CVaR reduction over [P, shots].  No full 2^n array
        ever leaves the mesh — multi-controller safe."""
        import jax

        from jax import shard_map
        from jax.sharding import PartitionSpec

        key = ("sampled", shots, use_cvar)
        if key in self._fns:
            return self._fns[key]

        from queasars_tpu.sim.expectation import cvar_expectation_from_shot_energies
        from queasars_tpu.sim.sharded_statevector import _mesh_bits, _simulate_local

        n_devices, local_bits = _mesh_bits(self.amp_mesh, self.n_qubits)

        def sampled(gate_types, controls, angles, layer_mask, keys, alpha, table_local):
            device_id = jax.lax.axis_index(AMP_AXIS)

            def one(args):
                gt, ctrl, ang, lm, k = args
                state = _simulate_local(
                    gt, ctrl, ang, lm, device_id, local_bits, n_devices, self.n_qubits
                )
                local_probs = state[0] ** 2 + state[1] ** 2
                local_cdf = jnp.cumsum(local_probs)
                # every shard computes the same offsets vector from the
                # gathered masses, so the intervals exactly tile [0, total)
                masses = jax.lax.all_gather(local_cdf[-1], AMP_AXIS)  # [D]
                offsets = jnp.concatenate([jnp.zeros(1, jnp.float32), jnp.cumsum(masses)])
                lo = offsets[device_id]
                hi = offsets[device_id + 1]
                u = jax.random.uniform(k, (shots,), jnp.float32, maxval=offsets[-1])
                in_shard = jnp.logical_and(u >= lo, u < hi)
                pos = jnp.searchsorted(local_cdf, u - lo, side="right")
                pos = jnp.clip(pos, 0, local_probs.shape[0] - 1)
                contrib = jnp.where(in_shard, table_local[pos], 0.0)
                return jax.lax.psum(contrib, AMP_AXIS)  # [shots]

            shot_energies = jax.lax.map(
                one, (gate_types, controls, angles, layer_mask, keys)
            )  # [P, shots]
            if use_cvar:
                return cvar_expectation_from_shot_energies(shot_energies, alpha)
            return jnp.mean(shot_energies, axis=-1)

        mapped = jax.jit(
            shard_map(
                sampled,
                mesh=self.amp_mesh,
                in_specs=(PartitionSpec(),) * 6 + (PartitionSpec(AMP_AXIS),),
                out_specs=PartitionSpec(),
                check_vma=False,
            )
        )
        self._fns[key] = mapped
        return mapped

    def _apply_precision_noise(self, energies: np.ndarray) -> np.ndarray:
        if self.precision == 0.0:
            return energies
        return energies + self._noise_rng.normal(0.0, self.precision, size=energies.shape).astype(
            energies.dtype
        )

    def evaluate_packed(self, packed, angles=None):
        a = packed.angles if angles is None else angles
        energies_fn, probs_fn = self._shape_fns(packed)
        if self.alpha >= 1.0 and self.shots is None:
            args = self._globalize(packed.gate_types, packed.controls, a, packed.layer_mask)
            out = energies_fn(*args, self._table)
            return self._apply_precision_noise(np.asarray(out))
        if self.shots is not None:
            # fully distributed shot sampling (hierarchical inverse-CDF
            # over shards) + shot-multiset expectation/CVaR — no 2^n
            # array leaves the mesh, multi-controller safe
            fn = self._sampled_energies_fn(self.shots, self.alpha < 1.0)
            keys = np.asarray(self._next_keys(packed.n_individuals))
            args = self._globalize(
                packed.gate_types, packed.controls, a, packed.layer_mask, keys
            )
            out = fn(*args, jnp.float32(self.alpha), self._table)
            return self._apply_precision_noise(np.asarray(out))
        if jax.process_count() > 1:
            raise CircuitEvaluatorException(
                "the exact (shot-free) CVaR amplitude-sharded path gathers the "
                "full probability array by energy order and is single-process "
                "only; use alpha=1 exact energies or finite shots on "
                "multi-controller meshes"
            )
        probs = probs_fn(packed.gate_types, packed.controls, a, packed.layer_mask)
        out = cvar_expectation_from_probs(
            probs, self._sorted, self._order, jnp.float32(self.alpha)
        )
        return self._apply_precision_noise(np.asarray(out))
