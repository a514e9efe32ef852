"""In-kernel shot sampling (round 3): the fused simulate+measure kernel
must reproduce the flat searchsorted stream and its statistics.

Runs in the Pallas interpreter on the CPU mesh; the hardware measurement
lives in docs/performance.md (821 evals/s at the n=20/pop-32 sampler
bench configuration, from 694 with the XLA-side sampling).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.sim.pallas_kernels import pallas_sampled_shot_energies
from queasars_tpu.sim.sampling import sample_indices
from queasars_tpu.sim.statevector import probabilities, simulate_circuits


def _workload(n=14, pop=3, layers=2, seed=0):
    population = EVQEPopulation.random_population(n, layers, pop, True, random_seed=seed)
    packed = PackedPopulation.pack(list(population.individuals))
    rng = np.random.default_rng(1)
    table = rng.normal(size=1 << n).astype(np.float32)
    return packed, table


@pytest.mark.parametrize("shots", [512, 300])
def test_matches_flat_searchsorted_stream(shots):
    """Same uniforms -> same sampled multiset as the shot-multiset fast
    path (boundary draws may flip at the CDF-rounding level; none do on
    this workload)."""
    packed, table = _workload()
    keys = jax.random.split(jax.random.PRNGKey(7), packed.n_individuals)
    frac = np.stack(
        [np.asarray(jax.random.uniform(k, (shots,), jnp.float32)) for k in keys]
    )
    e = np.asarray(
        pallas_sampled_shot_energies(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            table, frac, packed.n_qubits, shots, interpret=True,
        )
    )
    probs = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            packed.n_qubits,
        )
    )
    idx = np.stack(
        [np.asarray(sample_indices(k, jnp.asarray(p), shots)) for k, p in zip(keys, probs)]
    )
    e_ref = table[idx]
    assert (e == e_ref).mean() > 0.995


def test_sampled_mean_statistics():
    packed, table = _workload(pop=4, seed=3)
    shots = 2048
    keys = jax.random.split(jax.random.PRNGKey(9), packed.n_individuals)
    frac = np.stack(
        [np.asarray(jax.random.uniform(k, (shots,), jnp.float32)) for k in keys]
    )
    e = np.asarray(
        pallas_sampled_shot_energies(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            table, frac, packed.n_qubits, shots, interpret=True,
        )
    )
    probs = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            packed.n_qubits,
        )
    )
    exact = probs @ table
    std = np.sqrt(np.maximum(probs @ (table**2) - exact**2, 0) / shots)
    z = (e.mean(axis=1) - exact) / np.maximum(std, 1e-9)
    assert np.all(np.abs(z) < 5)


def test_deterministic_given_fracs():
    packed, table = _workload(pop=2)
    frac = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (2, 256), jnp.float32)
    )
    run = lambda: np.asarray(
        pallas_sampled_shot_energies(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            table, frac, packed.n_qubits, 256, interpret=True,
        )
    )
    np.testing.assert_array_equal(run(), run())


def test_prefix_initial_state_honored():
    """With the layer-prefix cache the kernel starts from the cached
    per-individual states; sampling statistics must follow the FULL
    circuit's distribution."""
    packed, table = _workload(pop=2, layers=2, seed=5)
    n = packed.n_qubits
    # prefix = first layer only; probe = second layer
    prefix_mask = packed.layer_mask.copy()
    prefix_mask[:, 1:] = False
    suffix_mask = packed.layer_mask.copy()
    suffix_mask[:, :1] = False
    prefix_states = simulate_circuits(
        packed.gate_types, packed.controls, packed.angles, prefix_mask, n
    )
    shots = 4096
    keys = jax.random.split(jax.random.PRNGKey(2), packed.n_individuals)
    frac = np.stack(
        [np.asarray(jax.random.uniform(k, (shots,), jnp.float32)) for k in keys]
    )
    e = np.asarray(
        pallas_sampled_shot_energies(
            packed.gate_types, packed.controls, packed.angles, suffix_mask,
            table, frac, n, shots, interpret=True, initial=jnp.asarray(prefix_states),
        )
    )
    probs = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    exact = probs @ table
    std = np.sqrt(np.maximum(probs @ (table**2) - exact**2, 0) / shots)
    z = (e.mean(axis=1) - exact) / np.maximum(std, 1e-9)
    assert np.all(np.abs(z) < 5)


def test_objective_routes_in_kernel_on_cpu_interpret():
    """population_energies takes the in-kernel branch when use_pallas is
    set and n >= 14 (the branch is exercised in interpret mode by the
    evaluator tests; here we pin the routing + CVaR reduction)."""
    from queasars_tpu.sim.expectation import cvar_expectation_from_shot_energies

    packed, table = _workload(pop=2)
    shots = 256
    keys = jnp.asarray(jax.random.split(jax.random.PRNGKey(4), packed.n_individuals))
    frac = jax.vmap(lambda k: jax.random.uniform(k, (shots,), jnp.float32))(keys)
    e = pallas_sampled_shot_energies(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
        table, np.asarray(frac), packed.n_qubits, shots, interpret=True,
    )
    cvar = np.asarray(cvar_expectation_from_shot_energies(e, jnp.float32(0.5)))
    mean = np.asarray(e).mean(axis=1)
    assert np.all(cvar <= mean + 1e-5)
