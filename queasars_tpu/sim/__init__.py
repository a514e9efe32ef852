"""JAX statevector simulation engine (reference layer L1 replacement).

Replaces qiskit-aer's C++ simulator behind the reference's
``BaseCircuitEvaluator`` seam (queasars/circuit_evaluation/
circuit_evaluation.py:62-87): circuits never materialize as objects — the
engine consumes packed genome tensors (gate types / control indices /
angles) and evaluates a whole population in one jitted, vmapped program.

Modules:
- statevector: gate application (jnp reference + Pallas fused kernel)
- expectation: diagonal-table, CVaR and general Pauli-sum expectations
- sampling: measurement shot sampling
- grouped_sampling: shot measurement of general Pauli sums via QWC
  groups (rotate into each group's product basis, sample, contract)
- evaluators: the high-level "population -> energies" evaluator classes
- external: pluggable external evaluation backends (the reference's
  BaseEstimatorV2/BaseSamplerV2 injection capability)
"""

from queasars_tpu.sim.statevector import (
    GATE_ID,
    GATE_ROT,
    GATE_CTRL,
    GATE_CROT,
    init_state,
    init_state_real,
    apply_circuit,
    apply_circuit_real,
    simulate_circuits,
    probabilities,
)
from queasars_tpu.sim.expectation import (
    expectation_from_probs,
    cvar_expectation_from_probs,
    general_pauli_expectation,
    general_pauli_expectation_real,
)
from queasars_tpu.sim.qaoa import (
    qaoa_state,
    qaoa_probabilities,
    qaoa_energy,
    qaoa_energies_batch,
)
from queasars_tpu.sim.external import CallbackCircuitEvaluator

__all__ = [
    "GATE_ID",
    "GATE_ROT",
    "GATE_CTRL",
    "GATE_CROT",
    "init_state",
    "init_state_real",
    "apply_circuit",
    "apply_circuit_real",
    "simulate_circuits",
    "probabilities",
    "expectation_from_probs",
    "cvar_expectation_from_probs",
    "general_pauli_expectation",
    "general_pauli_expectation_real",
    "qaoa_state",
    "qaoa_probabilities",
    "qaoa_energy",
    "qaoa_energies_batch",
    "CallbackCircuitEvaluator",
]
