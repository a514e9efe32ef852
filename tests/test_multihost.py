"""Multi-host runtime smoke test: two REAL controller processes.

The TPU analog of the reference's dask LocalCluster multi-process tests
(test_evqe_operators.py:25-29): two OS processes join one JAX runtime via
``initialize_multihost`` and run a cross-process ``psum`` over a global
mesh — verifying the multi-controller path the framework documents for
pod-scale solves (parallel/multihost.py) with actual processes, no mocks.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from queasars_tpu.parallel import initialize_multihost, is_multihost, process_info

coordinator, rank = sys.argv[1], int(sys.argv[2])
initialize_multihost(coordinator_address=coordinator, num_processes=2, process_id=rank)
assert is_multihost()
pid, count = process_info()
assert (pid, count) == (rank, 2)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devices = jax.devices()          # GLOBAL device list across both processes
assert len(devices) == 2, devices
mesh = Mesh(np.array(devices), ("pop",))

local = jnp.full((1,), float(rank + 1))
local = jax.device_put(local, jax.local_devices()[0])
garr = jax.make_array_from_single_device_arrays(
    (2,), NamedSharding(mesh, P("pop")), [local]
)
total = jax.jit(
    jax.shard_map(
        lambda x: jax.lax.psum(x.sum(), "pop"),
        mesh=mesh, in_specs=P("pop"), out_specs=P(),
    )
)(garr)
# psum over both processes: 1 + 2 = 3
assert float(total) == 3.0, float(total)
print(f"RANK{rank}_OK", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        return sock.getsockname()[1]


def test_two_process_global_psum(tmp_path):
    coordinator = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coordinator, str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for rank in range(2)
    ]
    outputs = []
    try:
        for proc in procs:
            out, err = proc.communicate(timeout=240)
            outputs.append((proc.returncode, out, err))
    except subprocess.TimeoutExpired:
        for proc in procs:
            proc.kill()
        pytest.fail("multihost worker processes timed out")
    for rank, (code, out, err) in enumerate(outputs):
        assert code == 0, f"rank {rank} failed:\n{err[-2000:]}"
        assert f"RANK{rank}_OK" in out


SOLVE_WORKER = """
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from queasars_tpu.parallel import initialize_multihost, population_mesh

coordinator, rank = sys.argv[1], int(sys.argv[2])
initialize_multihost(coordinator_address=coordinator, num_processes=2, process_id=rank)
assert len(jax.devices()) == 2

from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum, pauli_z_string
from queasars_tpu.solver import (
    ConfiguredEstimator, EVQEMinimumEigensolver, EVQEMinimumEigensolverConfiguration)

hamiltonian = PauliSum.sum([pauli_z_string(q, 4) * float(q + 1) for q in range(4)])
config = EVQEMinimumEigensolverConfiguration(
    configured_estimator=ConfiguredEstimator(), configured_sampler=None,
    optimizer=BatchedNFT(NFTConfig(maxiter=4)), optimizer_n_circuit_evaluations=None,
    max_generations=2, max_circuit_evaluations=None, termination_criterion=None,
    random_seed=6, population_size=4, speciation_genetic_distance_threshold=2,
    selection_alpha_penalty=0.1, selection_beta_penalty=0.1,
    parameter_search_probability=0.5, topological_search_probability=0.5,
    layer_removal_probability=0.1, use_tournament_selection=True, tournament_size=2,
    mesh=population_mesh(),  # spans BOTH processes' devices
)
result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)
trajectory = [list(g.expectation_values) for g in result.population_evaluation_results]
print("RESULT" + json.dumps({"rank": rank, "eigenvalue": result.eigenvalue,
                             "trajectory": trajectory}), flush=True)
"""


def test_two_process_evqe_solve_matches_single_process():
    """A FULL EVQE solve across two controller processes: the mesh spans
    both hosts' devices, every generation runs as one SPMD program, and
    both controllers produce the trajectory a single-process 2-device
    mesh produces — bit-identically."""
    import json

    coordinator = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", SOLVE_WORKER, coordinator, str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for rank in range(2)
    ]
    payloads = {}
    for rank, proc in enumerate(procs):
        out, err = proc.communicate(timeout=280)
        assert proc.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                payloads[rank] = json.loads(line[len("RESULT"):])
    assert set(payloads) == {0, 1}
    # both controllers observed the identical solve
    assert payloads[0] == {**payloads[1], "rank": 0}

    # and it matches a single-process solve over a 2-device mesh exactly
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.parallel import population_mesh
    from queasars_tpu.paulis import PauliSum, pauli_z_string
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    hamiltonian = PauliSum.sum([pauli_z_string(q, 4) * float(q + 1) for q in range(4)])
    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(), configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=4)), optimizer_n_circuit_evaluations=None,
        max_generations=2, max_circuit_evaluations=None, termination_criterion=None,
        random_seed=6, population_size=4, speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1, selection_beta_penalty=0.1,
        parameter_search_probability=0.5, topological_search_probability=0.5,
        layer_removal_probability=0.1, use_tournament_selection=True, tournament_size=2,
        mesh=population_mesh(2),
    )
    local = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)
    assert payloads[0]["eigenvalue"] == local.eigenvalue
    assert payloads[0]["trajectory"] == [
        list(g.expectation_values) for g in local.population_evaluation_results
    ]


AMP_WORKER = """
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from queasars_tpu.parallel import initialize_multihost

coordinator, rank = sys.argv[1], int(sys.argv[2])
initialize_multihost(coordinator_address=coordinator, num_processes=2, process_id=rank)
assert len(jax.devices()) == 2

import numpy as np
from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.optim.nft import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum, pauli_z_string
from queasars_tpu.sim.sharded_evaluator import (
    AmplitudeShardedExpectationEvaluator, amplitude_mesh)

n_qubits = 5
population = EVQEPopulation.random_population(n_qubits, 2, 3, True, random_seed=9)
packed = PackedPopulation.pack(list(population.individuals))
operator = PauliSum.sum([pauli_z_string(q, n_qubits) * float(q + 1) for q in range(n_qubits)])
evaluator = AmplitudeShardedExpectationEvaluator(operator, mesh=amplitude_mesh(2))

energies = evaluator.evaluate_packed(packed)

coords = np.stack([
    np.pad(packed.param_coordinates(i),
           ((0, int(packed.n_params.max()) - packed.n_params[i]), (0, 0)))
    for i in range(packed.n_individuals)
])
active = np.ones(packed.n_individuals, bool)
optimizer = BatchedNFT(NFTConfig(maxiter=4))
opt_angles, opt_energies, _ = optimizer.minimize(
    evaluator, packed, coords, packed.n_params, active, seed=0)

# sharded QWC grouped sampling of a general operator across both hosts
from queasars_tpu.problems.spin_chains import transverse_field_ising
tfim = transverse_field_ising(n_qubits, coupling=1.0, field=0.9)
grouped = AmplitudeShardedExpectationEvaluator(
    tfim, mesh=amplitude_mesh(2), shots=256, seed=7)
grouped_energies = grouped.evaluate_packed(packed)

print("RESULT" + json.dumps({
    "rank": rank,
    "energies": [float(v) for v in energies],
    "opt_energies": [float(v) for v in opt_energies],
    "grouped_energies": [float(v) for v in grouped_energies],
}), flush=True)
"""


def test_two_process_amplitude_sharded_evaluation():
    """Amplitude sharding across two controller processes: one statevector
    split over both hosts' devices — exact energies and the device-side
    NFT sweep match the single-process 2-device mesh bit-identically."""
    import json

    import numpy as np

    coordinator = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", AMP_WORKER, coordinator, str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for rank in range(2)
    ]
    payloads = {}
    for rank, proc in enumerate(procs):
        out, err = proc.communicate(timeout=280)
        assert proc.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                payloads[rank] = json.loads(line[len("RESULT"):])
    assert set(payloads) == {0, 1}
    assert payloads[0] == {**payloads[1], "rank": 0}

    # single-process reference over a 2-device mesh
    from queasars_tpu.genome import EVQEPopulation
    from queasars_tpu.genome.packing import PackedPopulation
    from queasars_tpu.optim.nft import BatchedNFT, NFTConfig
    from queasars_tpu.paulis import PauliSum, pauli_z_string
    from queasars_tpu.sim.sharded_evaluator import (
        AmplitudeShardedExpectationEvaluator,
        amplitude_mesh,
    )

    n_qubits = 5
    population = EVQEPopulation.random_population(n_qubits, 2, 3, True, random_seed=9)
    packed = PackedPopulation.pack(list(population.individuals))
    operator = PauliSum.sum(
        [pauli_z_string(q, n_qubits) * float(q + 1) for q in range(n_qubits)]
    )
    evaluator = AmplitudeShardedExpectationEvaluator(operator, mesh=amplitude_mesh(2))
    energies = evaluator.evaluate_packed(packed)
    np.testing.assert_array_equal(np.asarray(payloads[0]["energies"], np.float32), energies)

    coords = np.stack([
        np.pad(packed.param_coordinates(i),
               ((0, int(packed.n_params.max()) - packed.n_params[i]), (0, 0)))
        for i in range(packed.n_individuals)
    ])
    active = np.ones(packed.n_individuals, bool)
    _, opt_energies, _ = BatchedNFT(NFTConfig(maxiter=4)).minimize(
        evaluator, packed, coords, packed.n_params, active, seed=0
    )
    np.testing.assert_array_equal(
        np.asarray(payloads[0]["opt_energies"], np.float32), opt_energies
    )

    # grouped sampling of a general operator matches the single-process
    # 2-device mesh (same seed -> same shot stream)
    from queasars_tpu.problems.spin_chains import transverse_field_ising

    tfim = transverse_field_ising(n_qubits, coupling=1.0, field=0.9)
    grouped = AmplitudeShardedExpectationEvaluator(
        tfim, mesh=amplitude_mesh(2), shots=256, seed=7
    )
    np.testing.assert_array_equal(
        np.asarray(payloads[0]["grouped_energies"], np.float32),
        grouped.evaluate_packed(packed),
    )
