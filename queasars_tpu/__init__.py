"""QUEASARS-TPU: a TPU-native evolving-ansatz VQE framework.

A from-scratch rebuild of the capabilities of DLR-RB/QUEASARS (reference:
``/root/reference``), designed TPU-first:

- the ansatz genome is data (fixed-shape tensors), not circuit objects,
- the simulator is a jitted pure function (JAX/XLA with Pallas kernels),
- the population is a batch axis (``vmap``),
- the cluster is a device mesh (``jax.sharding`` + collectives over ICI).

Layer map (mirrors the reference's 5 layers, see SURVEY.md §1):

========  ==============================  =====================================
Layer     Reference                        This package
========  ==============================  =====================================
L5        queasars/job_shop_scheduling     queasars_tpu.problems.jssp
L4        queasars/utility                 queasars_tpu.paulis, .utils
L3        minimum_eigensolvers/base        queasars_tpu.solver
L2        minimum_eigensolvers/evqe        queasars_tpu.genome, .evolve
L1        circuit_evaluation (Qiskit/Aer)  queasars_tpu.sim (JAX statevector)
--        dask.distributed                 queasars_tpu.parallel (device mesh)
========  ==============================  =====================================
"""

__version__ = "0.1.0"
