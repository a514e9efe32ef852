"""Pauli-sum algebra on packed bitmask arrays.

TPU-native replacement for the reference's use of Qiskit ``SparsePauliOp``
(reference: queasars/utility/pauli_strings.py, and the SparsePauliOp
compose/sum arithmetic used throughout
queasars/job_shop_scheduling/domain_wall_hamiltonian_encoder.py).
"""

from queasars_tpu.paulis.pauli_sum import PauliSum
from queasars_tpu.paulis.strings import pauli_identity_string, pauli_z_string
from queasars_tpu.paulis.diagonal import (
    diagonal_energy_table,
    diagonal_energy_table_device,
)
from queasars_tpu.paulis.grouping import MeasurementGroup, qwc_groups

__all__ = [
    "PauliSum",
    "pauli_identity_string",
    "pauli_z_string",
    "diagonal_energy_table",
    "diagonal_energy_table_device",
    "MeasurementGroup",
    "qwc_groups",
]
