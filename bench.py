"""Headline benchmark: population circuit-evaluations/sec on one chip.

Measures the framework's hot path — batched EVQE population evaluation
(simulate every individual's circuit from the tensor genome, contract
measurement probabilities against the diagonal JSSP-style Hamiltonian
energy table) — at the BASELINE.json north-star configuration: 20 qubits,
population 32.

Baseline: the reference delegates this exact work to qiskit-aer's CPU
statevector simulator (one circuit per dask/thread future).  Aer is not
installed here, so the baseline proxy is this same engine's single-core
CPU rate measured in a subprocess (a statevector simulator on one CPU
core, which is what Aer gives each reference worker).  ``vs_baseline`` is
the TPU-chip rate over that CPU-core rate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

N_QUBITS = 20
POPULATION = 32
LAYERS = 5
N_TERMS = 512  # diagonal Hamiltonian terms (JSSP instances at 20q are O(100-1000))


def build_workload():
    from queasars_tpu.genome import EVQEPopulation
    from queasars_tpu.genome.packing import PackedPopulation

    rng = np.random.default_rng(0)
    population = EVQEPopulation.random_population(N_QUBITS, LAYERS, POPULATION, True, random_seed=0)
    packed = PackedPopulation.pack(list(population.individuals))
    # synthetic diagonal energy table standing in for a packed JSSP
    # Hamiltonian (the table's origin does not affect evaluation cost)
    z_masks = rng.integers(0, 1 << N_QUBITS, size=N_TERMS, dtype=np.uint64)
    coeffs = rng.normal(size=N_TERMS)
    return packed, z_masks, coeffs


def measure_rate(repeats: int, warmup: int = 2) -> float:
    """Time repeated jitted batched evaluations (fresh angles each call so
    nothing is cached away); returns circuit-evals/sec.

    Uses the fused Pallas VMEM kernel on TPU (state resident on-chip for
    the whole circuit) and the jnp engine on CPU.
    """
    import jax
    import jax.numpy as jnp

    from queasars_tpu.paulis.diagonal import _energy_table_scan
    from queasars_tpu.sim.evaluators import _energies_exact as _energies_jnp
    from queasars_tpu.sim.pallas_kernels import pallas_energies_exact, pallas_supported

    if pallas_supported(N_QUBITS, jax.default_backend()) and os.environ.get(
        "QUEASARS_BENCH_NO_PALLAS"
    ) != "1":
        def _energies_exact(gt, c, a, lm, tab, n):
            return pallas_energies_exact(gt, c, a, lm, tab, n)
    else:
        _energies_exact = _energies_jnp

    packed, z_masks, coeffs = build_workload()
    table = _energy_table_scan(
        jnp.asarray(z_masks.astype(np.uint32)), jnp.asarray(coeffs, dtype=jnp.float32), N_QUBITS
    )
    table.block_until_ready()

    angle_variants = [
        packed.angles + np.float32(0.001 * i) for i in range(max(repeats, warmup))
    ]
    # NOTE: synchronization is via host transfer (np.asarray) — on this
    # platform block_until_ready can return before execution finishes,
    # which silently inflates rates by orders of magnitude.
    for i in range(warmup):
        np.asarray(
            _energies_exact(
                packed.gate_types, packed.controls, angle_variants[i], packed.layer_mask,
                table, N_QUBITS,
            )
        )

    start = time.perf_counter()
    for i in range(repeats):
        np.asarray(
            _energies_exact(
                packed.gate_types, packed.controls, angle_variants[i], packed.layer_mask,
                table, N_QUBITS,
            )
        )
    elapsed = time.perf_counter() - start
    return POPULATION * repeats / elapsed


def main() -> None:
    if os.environ.get("QUEASARS_BENCH_CPU_PROXY") == "1":
        # subprocess mode: single-CPU-core Aer-proxy baseline
        import jax

        jax.config.update("jax_platforms", "cpu")
        rate = measure_rate(repeats=2, warmup=1)
        print(json.dumps({"cpu_rate": rate}))
        return

    try:
        tpu_rate = measure_rate(repeats=20)
    except Exception:
        # pallas path unavailable (e.g. compile-service failure) — fall
        # back to the jnp engine so the benchmark always reports
        os.environ["QUEASARS_BENCH_NO_PALLAS"] = "1"
        tpu_rate = measure_rate(repeats=5)

    env = dict(os.environ)
    env["QUEASARS_BENCH_CPU_PROXY"] = "1"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_PLATFORMS", None)
    cpu_rate = None
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                cpu_rate = json.loads(line).get("cpu_rate")
    except Exception:
        cpu_rate = None

    result = {
        "metric": "population_circuit_evals_per_sec_20q_pop32",
        "value": round(tpu_rate, 2),
        "unit": "evals/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2) if cpu_rate else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
