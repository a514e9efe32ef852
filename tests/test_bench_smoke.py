"""bench.py plumbing smoke test (tiny shapes, CPU).

Keeps the driver-facing benchmark from rotting: workload construction,
the sustained scan measurement, the C++ Aer-proxy baseline and the
correctness-gate comparator all execute on small sizes.
"""

import numpy as np
import pytest

import bench


@pytest.fixture()
def small_bench(monkeypatch):
    monkeypatch.setattr(bench, "N_QUBITS", 8)
    monkeypatch.setattr(bench, "POPULATION", 4)
    monkeypatch.setattr(bench, "LAYERS", 2)
    monkeypatch.setattr(bench, "N_TERMS", 16)
    packed, z_masks, coeffs = bench.build_workload(n_qubits=8, population=4, layers=2)
    table = bench.build_table(z_masks % (1 << 8), coeffs, 8)
    return packed, table


def test_measure_rate_scan_runs(small_bench):
    packed, table = small_bench
    rate = bench.measure_rate(packed, table, repeats=1, warmup=1, scan_iters=2)
    assert rate > 0


def test_cpp_baseline_agrees_with_engine(small_bench):
    packed, table = small_bench
    stats = bench.measure_cpp_rate(packed, table, windows=2)
    if stats is None:
        pytest.skip("native toolchain unavailable")
    assert stats["median"] > 0
    assert stats["min"] <= stats["median"] <= stats["max"]
    assert stats["max"] > 0
    # the baseline simulator itself must agree with the engine
    from queasars_tpu.sim.evaluators import _energies_exact
    from queasars_tpu.utils.native import native_population_energies

    cpp = native_population_energies(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
        np.asarray(table, np.float32), 8,
    )
    engine = np.asarray(
        _energies_exact(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            np.asarray(table, np.float32), 8,
        )
    )
    np.testing.assert_allclose(cpp, engine, atol=5e-4)
