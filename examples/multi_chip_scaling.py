"""Population sharding and amplitude sharding over a device mesh.

The dask-cluster counterpart in the reference farms each individual to a
worker process; here both parallel axes are one SPMD program:

- population sharding: individuals split across devices (data parallel),
- amplitude sharding: ONE statevector split across devices — states
  bigger than a single chip's memory (capability the reference lacks).

Forces a virtual 8-device CPU mesh when only one device is present.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
import numpy as np


def ensure_devices() -> None:
    """Force the virtual 8-device CPU mesh (this demo is about multi-device
    layouts; the single-chip TPU environment here cannot show them).  Must
    run before any backend use."""
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    ensure_devices()
    import jax
    from jax.sharding import Mesh

    from queasars_tpu.genome import EVQEPopulation
    from queasars_tpu.genome.packing import PackedPopulation
    from queasars_tpu.parallel import population_mesh, sharded_population_energies
    from queasars_tpu.paulis import PauliSum, diagonal_energy_table, pauli_z_string
    from queasars_tpu.sim.sharded_statevector import (
        AMP_AXIS,
        make_sharded_circuit_fn,
        sharded_expectation,
    )

    print(f"{jax.device_count()} devices on platform {jax.devices()[0].platform}")

    n = 8
    hamiltonian = PauliSum.sum([pauli_z_string(q, n) for q in range(n)])
    table = diagonal_energy_table(hamiltonian, dtype=np.float32)

    # --- population sharding -------------------------------------------
    population = EVQEPopulation.random_population(n, 3, 32, True, random_seed=0)
    packed = PackedPopulation.pack(list(population.individuals))
    mesh = population_mesh(8)
    energies = sharded_population_energies(mesh, packed, table)
    print(f"population of 32 sharded over {mesh.devices.size} devices -> energies mean {energies.mean():.4f}")

    # --- amplitude sharding --------------------------------------------
    amp_mesh = Mesh(np.array(jax.devices()[:8]), (AMP_AXIS,))
    circuit_fn = make_sharded_circuit_fn(amp_mesh, n)
    individual = population.individuals[0]
    single = PackedPopulation.pack([individual])
    state = circuit_fn(
        single.gate_types[0], single.controls[0], single.angles[0], single.layer_mask[0]
    )
    energy = float(sharded_expectation(amp_mesh, state, table))
    print(f"one {n}-qubit state sharded over {amp_mesh.devices.size} devices -> energy {energy:.4f} "
          f"(shards: {sorted({s.data.shape for s in state.addressable_shards})})")

    # --- mesh-integrated EVQE solve ------------------------------------
    # the solver itself runs SPMD: mesh= in the configuration shards every
    # evaluation/optimization step over the devices; trajectories are
    # bit-identical regardless of the device count
    from queasars_tpu.optim import BatchedNFT, NFTConfig
    from queasars_tpu.solver import (
        ConfiguredEstimator,
        EVQEMinimumEigensolver,
        EVQEMinimumEigensolverConfiguration,
    )

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=8)),
        optimizer_n_circuit_evaluations=None,
        max_generations=3,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=16,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.05,
        parameter_search_probability=0.5,
        topological_search_probability=0.5,
        layer_removal_probability=0.1,
        use_tournament_selection=True,
        tournament_size=2,
        mesh=mesh,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)
    print(f"mesh-integrated EVQE solve over {mesh.devices.size} devices: "
          f"best energy {result.eigenvalue:.4f} in {result.generations} generations")

    # --- amplitude-sharded EVQE solve (states beyond one chip) ---------
    # shard_amplitudes=True factors the mesh as (pop, amp): every
    # statevector splits over the amp axis while the population axis keeps
    # sharding individuals.  amp_devices picks the split explicitly (None
    # = automatic: just enough amp width to keep each shard under
    # 2^amp_local_qubits amplitudes).  Exact trajectories are
    # bit-identical across factorizations of the same devices.
    from dataclasses import replace

    amp_result = EVQEMinimumEigensolver(
        replace(
            config, population_size=8, max_generations=2,
            shard_amplitudes=True, amp_devices=2,
        )
    ).compute_minimum_eigenvalue(hamiltonian)
    print(
        "amplitude-sharded EVQE solve on a (4, 2) (pop, amp) mesh: "
        f"best energy {amp_result.eigenvalue:.4f}"
    )


if __name__ == "__main__":
    main()
