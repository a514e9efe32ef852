"""Problem domains (reference layer L5)."""

from queasars_tpu.problems.qubo import (
    BoundedIntegerVariable,
    IntegerQuadraticProgram,
    decode_qubo_bits,
    maxcut_hamiltonian,
    qubo_hamiltonian,
)

__all__ = [
    "BoundedIntegerVariable",
    "IntegerQuadraticProgram",
    "decode_qubo_bits",
    "maxcut_hamiltonian",
    "qubo_hamiltonian",
]
