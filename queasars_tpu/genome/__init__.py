"""EVQE circuit genomes: host-side objects + device tensor packing.

Rebuild of the reference genome layer
(queasars/minimum_eigensolvers/evqe/quantum_circuit/ and
evolutionary_algorithm/individual.py, population.py) with one structural
change: genomes never become circuit objects.  The host keeps lightweight
immutable dataclasses (needed for speciation hashing and for reproducing
the reference's ``random.Random`` call order exactly), and
:mod:`~queasars_tpu.genome.packing` lowers a whole population to the
fixed-shape tensors the JAX engine consumes.

Parameter ordering note: the flat ``parameter_values`` vector uses the
canonical order (layers ascending, qubits ascending numerically, then
(theta, phi, lambda) per gate).  The reference inherits qiskit's
alphabetical ``Parameter`` sort, which orders qubit labels lexicographically
("q10" < "q2") and angles as (lambda, phi, theta); since no qiskit circuit
objects exist here, the canonical numeric order is used instead and
documented at the (de)serialization boundary.
"""

from queasars_tpu.genome.gates import (
    EVQEGateType,
    EVQEGate,
    IdentityGate,
    RotationGate,
    ControlGate,
    ControlledGate,
    ControlledRotationGate,
)
from queasars_tpu.genome.circuit_layer import EVQECircuitLayer, EVQECircuitLayerException
from queasars_tpu.genome.individual import EVQEIndividual, EVQEIndividualException
from queasars_tpu.genome.population import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.genome.parameter_order import (
    get_parameter_order,
    parameter_order,
    set_parameter_order,
)

from queasars_tpu.genome.qneat import QNEATGene, QNEATIndividual, QNEATPopulation

__all__ = [
    "get_parameter_order",
    "parameter_order",
    "set_parameter_order",
    "EVQEGateType",
    "EVQEGate",
    "IdentityGate",
    "RotationGate",
    "ControlGate",
    "ControlledGate",
    "ControlledRotationGate",
    "EVQECircuitLayer",
    "EVQECircuitLayerException",
    "EVQEIndividual",
    "EVQEIndividualException",
    "EVQEPopulation",
    "PackedPopulation",
    "QNEATGene",
    "QNEATIndividual",
    "QNEATPopulation",
]
