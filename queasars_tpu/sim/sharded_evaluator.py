"""Amplitude-sharded population evaluator: EVQE beyond one chip's memory.

Capability the reference does not have (SURVEY.md §2.3 P4): one
statevector is split across the mesh (``sim/sharded_statevector.py``) and
the population loops per device — the factorization to use when 2^n
amplitudes no longer fit a single chip (n >~ 30 at f32 pairs on 16 GB
HBM; configurable lower for headroom).  Exposes the same
``evaluate_packed`` contract as the single-chip evaluators, so the whole
solver stack (selection, host-stepped NFT, budget ledger) runs unchanged
on top.

Distribution notes:
- exact alpha=1 energies are fully distributed: local diagonal dot +
  one ``psum`` — only P scalars leave the mesh;
- CVaR / shot paths operate on the amplitude-sharded probability array
  with global ops (the energy-order gather crosses shards; XLA inserts
  the collectives) — correct everywhere, cheapest below ~24 qubits;
- single-controller meshes only for now: population sharding
  (parallel/mesh.py) is multi-controller aware, amplitude sharding is
  not yet (its table placement uses direct device_put).
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
from queasars_tpu.sim.expectation import cvar_expectation_from_probs, expectation_from_probs
from queasars_tpu.sim.sampling import sample_counts
from queasars_tpu.sim.sharded_statevector import (
    AMP_AXIS,
    make_sharded_population_energies_fn,
    make_sharded_population_probs_fn,
)


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
        self._table = jax.device_put(
            table, NamedSharding(self.amp_mesh, P(AMP_AXIS))
        )
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
            out = energies_fn(
                packed.gate_types, packed.controls, a, packed.layer_mask, self._table
            )
            return self._apply_precision_noise(np.asarray(out))
        probs = probs_fn(packed.gate_types, packed.controls, a, packed.layer_mask)
        if self.shots is not None:
            keys = self._next_keys(packed.n_individuals)
            counts = jax.vmap(lambda k, p: sample_counts(k, p, self.shots))(keys, probs)
            probs = counts.astype(jnp.float32) / self.shots
        if self.alpha >= 1.0:
            out = expectation_from_probs(probs, self._table_host)
        else:
            out = cvar_expectation_from_probs(
                probs, self._sorted, self._order, jnp.float32(self.alpha)
            )
        return self._apply_precision_noise(np.asarray(out))
