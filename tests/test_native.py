"""Native C++ kernel tests: cross-check against the pure-numpy oracle."""

import numpy as np
import pytest

from queasars_tpu.paulis import PauliSum
from queasars_tpu.utils.native import (
    load_native,
    native_diag_argmin,
    native_diag_energies_at,
    native_diagonal_energy_table,
)

pytestmark = pytest.mark.skipif(load_native() is None, reason="native library unavailable")


def numpy_table(coeffs, z_masks, n):
    idx = np.arange(1 << n, dtype=np.uint64)
    table = np.zeros(1 << n, dtype=np.float64)
    for c, z in zip(coeffs, z_masks):
        parity = np.bitwise_count(idx & z).astype(np.int64) & 1
        table += c * (1.0 - 2.0 * parity)
    return table


@pytest.fixture()
def random_terms():
    rng = np.random.default_rng(0)
    n = 10
    k = 40
    coeffs = rng.normal(size=k)
    z_masks = rng.integers(0, 1 << n, size=k, dtype=np.uint64)
    return coeffs, z_masks, n


def test_native_table_matches_numpy(random_terms):
    coeffs, z_masks, n = random_terms
    native = native_diagonal_energy_table(coeffs, z_masks, n)
    np.testing.assert_allclose(native, numpy_table(coeffs, z_masks, n), atol=1e-12)


def test_native_argmin(random_terms):
    coeffs, z_masks, n = random_terms
    table = numpy_table(coeffs, z_masks, n)
    idx, value = native_diag_argmin(coeffs, z_masks, n)
    assert idx == int(np.argmin(table))
    assert value == pytest.approx(float(table.min()), abs=1e-12)


def test_native_energies_at(random_terms):
    coeffs, z_masks, n = random_terms
    table = numpy_table(coeffs, z_masks, n)
    states = np.array([0, 1, 5, (1 << n) - 1], dtype=np.uint64)
    energies = native_diag_energies_at(coeffs, z_masks, states)
    np.testing.assert_allclose(energies, table[states.astype(np.int64)], atol=1e-12)


def test_diagonal_energy_table_uses_native_and_agrees():
    """The public table builder (native-backed) matches the explicit numpy
    path on a real PauliSum."""
    rng = np.random.default_rng(1)
    n = 8
    op = PauliSum.sum(
        [
            PauliSum.from_label("".join(rng.choice(["I", "Z"]) for _ in range(n)), rng.normal())
            for _ in range(12)
        ]
    )
    from queasars_tpu.paulis import diagonal_energy_table
    from queasars_tpu.paulis.diagonal import diagonal_terms

    table = diagonal_energy_table(op)
    coeffs, z_masks = diagonal_terms(op)
    np.testing.assert_allclose(table, numpy_table(coeffs, z_masks, n), atol=1e-12)


def test_cpp_statevector_matches_jnp_engine():
    """The vendored C++ statevector (the benchmark's Aer stand-in,
    csrc/statevector_sim.cpp) agrees with the jnp engine on random
    genomes — pinning the baseline denominator's correctness."""
    import pytest

    from queasars_tpu.genome import EVQEPopulation
    from queasars_tpu.genome.packing import PackedPopulation
    from queasars_tpu.sim.evaluators import _energies_exact
    from queasars_tpu.utils.native import native_population_energies, native_probabilities

    n = 7
    rng = np.random.default_rng(5)
    table = rng.normal(size=1 << n).astype(np.float32)
    population = EVQEPopulation.random_population(n, 3, 6, True, random_seed=2)
    packed = PackedPopulation.pack(list(population.individuals))

    cpp = native_population_energies(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, table, n
    )
    if cpp is None:
        pytest.skip("native toolchain unavailable")
    jnp_energies = np.asarray(
        _energies_exact(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, table, n
        )
    )
    np.testing.assert_allclose(cpp, jnp_energies, atol=5e-4)

    probs = native_probabilities(
        packed.gate_types[0], packed.controls[0], packed.angles[0], packed.layer_mask[0], n
    )
    assert probs is not None
    assert abs(float(probs.sum()) - 1.0) < 1e-5
