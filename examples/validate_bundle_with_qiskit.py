"""Validate a queasars-tpu interop bundle in a Qiskit environment.

Self-contained: depends ONLY on qiskit (no queasars_tpu import), so it
runs wherever the reference stack runs.  Loads the bundle produced by
examples/export_to_qiskit.py, rebuilds the circuit from its OpenQASM 2.0
text and the operator from the sparse label list, and asserts the exact
statevector energy matches the bundle's ``expected_energy`` to 1e-6 —
the full evolve-here / run-there loop.

Usage:  python examples/validate_bundle_with_qiskit.py <bundle.json>
"""

import json
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/interop_bundle.json"
    with open(path) as handle:
        bundle = json.load(handle)
    assert bundle["format"] == "queasars-tpu-interop-bundle", "not an interop bundle"

    from qiskit.qasm2 import loads as qasm2_loads
    from qiskit.quantum_info import SparsePauliOp, Statevector

    circuit = qasm2_loads(bundle["qasm"])
    assert circuit.num_qubits == bundle["n_qubits"]

    operator = SparsePauliOp.from_list(
        [(label, complex(re, im)) for label, re, im in bundle["operator_sparse_list"]]
    )
    state = Statevector.from_instruction(circuit)
    energy = float(state.expectation_value(operator).real)

    expected = bundle["expected_energy"]
    print(f"qiskit energy {energy:.8f}  vs bundle expected {expected:.8f}")
    assert abs(energy - expected) < 1e-6, (
        f"energy mismatch: qiskit {energy} vs bundle {expected}"
    )
    print("OK: the exported circuit reproduces the evolved energy in qiskit")


if __name__ == "__main__":
    main()
