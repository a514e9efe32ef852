"""Device-mesh distribution (replaces the reference's dask layer).

The reference scales by farming per-individual futures over a dask
cluster (SURVEY.md §2.3); here the population axis is sharded over a
``jax.sharding.Mesh`` and every evaluation/optimization step is one SPMD
program — collectives ride ICI, no scheduler, no locks.
"""

from queasars_tpu.parallel.multihost import (
    initialize_multihost,
    is_multihost,
    process_info,
)
from queasars_tpu.parallel.mesh import (
    pad_population_axis,
    population_mesh,
    population_pad_multiple,
    run_population_sharded,
    shard_packed,
    sharded_population_energies,
    sharded_training_step,
)

__all__ = [
    "initialize_multihost",
    "is_multihost",
    "process_info",
    "pad_population_axis",
    "population_mesh",
    "population_pad_multiple",
    "run_population_sharded",
    "shard_packed",
    "sharded_population_energies",
    "sharded_training_step",
]
