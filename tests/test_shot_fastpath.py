"""Shot-multiset fast path: gather sampled energies instead of
materializing counts over 2^n.

Same inverse-CDF random stream as the counts path, identical
expectation/CVaR semantics up to float summation order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim.objective import objective_operands, population_energies
from queasars_tpu.paulis import PauliSum
from queasars_tpu.sim.evaluators import SamplerExpectationEvaluator
from queasars_tpu.sim.expectation import (
    cvar_expectation_from_probs,
    cvar_expectation_from_shot_energies,
)
from queasars_tpu.sim.sampling import sample_counts, sample_indices


def _operator(n_qubits: int = 5, seed: int = 7) -> PauliSum:
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(6):
        z = int(rng.integers(1, 1 << n_qubits))
        label = "".join("Z" if (z >> q) & 1 else "I" for q in range(n_qubits))[::-1]
        parts.append(PauliSum.from_label(label, float(rng.normal())))
    return PauliSum.sum(parts)


def test_indices_and_counts_share_the_stream():
    key = jax.random.PRNGKey(3)
    probs = np.abs(np.random.default_rng(0).normal(size=32)).astype(np.float32)
    probs /= probs.sum()
    idx = np.asarray(sample_indices(key, jnp.asarray(probs), 100))
    counts = np.asarray(sample_counts(key, jnp.asarray(probs), 100))
    np.testing.assert_array_equal(np.bincount(idx, minlength=32), counts)


def test_cvar_from_shot_energies_matches_counts_formulation():
    rng = np.random.default_rng(5)
    table = rng.normal(size=64).astype(np.float32)
    order = np.argsort(table, kind="stable").astype(np.int32)
    for alpha in (0.25, 0.5, 1.0):
        samples = rng.integers(0, 64, size=500)
        counts = np.bincount(samples, minlength=64).astype(np.float32)
        probs = counts / 500
        via_probs = float(
            cvar_expectation_from_probs(
                jnp.asarray(probs), jnp.asarray(table[order]), jnp.asarray(order),
                jnp.float32(alpha),
            )
        )
        via_shots = float(
            cvar_expectation_from_shot_energies(
                jnp.asarray(table[samples][None, :]), jnp.float32(alpha)
            )[0]
        )
        assert abs(via_probs - via_shots) < 1e-5


def _objective_args(alpha):
    op = _operator()
    population = EVQEPopulation.random_population(5, 2, 4, True, random_seed=11)
    packed = PackedPopulation.pack(list(population.individuals))
    evaluator = SamplerExpectationEvaluator(op, shots=512, seed=0, alpha=alpha)
    operands = objective_operands(evaluator)
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(9), packed.n_individuals))
    kwargs = dict(
        n_qubits=packed.n_qubits,
        shots=operands["shots"],
        use_cvar=operands["use_cvar"],
        use_shots=True,
        initial_state=None,
        use_pallas=False,
    )
    args = (
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
        operands["table"], operands["sorted_energies"], operands["energy_order"],
        operands["alpha"], keys,
    )
    return args, kwargs


def test_fast_path_matches_counts_path():
    for alpha in (0.5, 1.0):
        args, kwargs = _objective_args(alpha)
        counts_path = np.asarray(population_energies(*args, **kwargs, fast_shots=False))
        fast_path = np.asarray(population_energies(*args, **kwargs, fast_shots=True))
        np.testing.assert_allclose(fast_path, counts_path, rtol=1e-5, atol=1e-5)


def test_fast_path_deterministic():
    args, kwargs = _objective_args(0.5)
    a = np.asarray(population_energies(*args, **kwargs, fast_shots=True))
    b = np.asarray(population_energies(*args, **kwargs, fast_shots=True))
    np.testing.assert_array_equal(a, b)


def test_fast_path_mesh_bit_identical():
    """The shot-multiset fast path must be invariant to population
    sharding (per-individual keys; no cross-individual reductions)."""
    from queasars_tpu.parallel.mesh import (
        pad_population_axis,
        population_mesh,
        population_pad_multiple,
        run_population_sharded,
    )

    args, kwargs = _objective_args(0.5)
    gt, ctrl, ang, lm, table, sorted_e, order, alpha, keys = args

    def fn(pop_args, rep_args):
        gt, ctrl, ang, lm, keys = pop_args
        table, sorted_e, order, alpha = rep_args
        return population_energies(
            gt, ctrl, ang, lm, table, sorted_e, order, alpha, keys,
            **kwargs, fast_shots=True,
        )

    single = np.asarray(fn((gt, ctrl, ang, lm, keys), (table, sorted_e, order, alpha)))
    mesh = population_mesh(8)
    multiple = population_pad_multiple(mesh)
    pop = gt.shape[0]
    padded = tuple(
        pad_population_axis(np.asarray(a), multiple) for a in (gt, ctrl, ang, lm, keys)
    )
    sharded = np.asarray(
        run_population_sharded(mesh, fn, padded, (table, sorted_e, order, alpha))
    )[:pop]
    np.testing.assert_array_equal(single, sharded)
