"""Committed interop bundle consistency (examples/export_to_qiskit.py).

qiskit is absent in this image (CLAUDE.md), so the qiskit half of the
loop runs via examples/validate_bundle_with_qiskit.py wherever qiskit
exists; HERE the committed fixture is checked end-to-end with this
stack's own tools: the genome JSON rebuilds the individual, the sparse
label list rebuilds the operator, and both reproduce the bundle's
``expected_energy`` — plus the QASM text is structurally audited
against the genome.
"""

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).resolve().parent / "fixtures" / "interop_bundle.json"


@pytest.fixture(scope="module")
def bundle():
    return json.loads(FIXTURE.read_text())


def test_bundle_format(bundle):
    assert bundle["format"] == "queasars-tpu-interop-bundle"
    assert bundle["n_qubits"] >= 2
    assert bundle["qasm"].startswith("OPENQASM 2.0;")
    assert len(bundle["operator_sparse_list"]) > 0


def test_genome_rebuild_reproduces_expected_energy(bundle):
    from queasars_tpu.genome.serialization import EVQEPopulationJSONDecoder
    from queasars_tpu.paulis import PauliSum
    from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator

    individual = json.loads(
        json.dumps(bundle["genome"]), cls=EVQEPopulationJSONDecoder
    )
    operator = PauliSum.sum(
        [
            PauliSum.from_label(label, complex(re, im))
            for label, re, im in bundle["operator_sparse_list"]
        ]
    )
    assert operator.n_qubits == bundle["n_qubits"]
    energy = float(
        StatevectorExpectationEvaluator(operator).evaluate_individuals([individual])[0]
    )
    assert energy == pytest.approx(bundle["expected_energy"], abs=1e-5)
    np.testing.assert_allclose(
        np.asarray(individual.parameter_values, dtype=np.float64),
        np.asarray(bundle["parameter_values"], dtype=np.float64),
        atol=1e-12,
    )


def test_qasm_matches_genome_structure(bundle):
    from queasars_tpu.genome.qasm import individual_to_qasm
    from queasars_tpu.genome.serialization import EVQEPopulationJSONDecoder

    individual = json.loads(
        json.dumps(bundle["genome"]), cls=EVQEPopulationJSONDecoder
    )
    assert individual_to_qasm(individual) == bundle["qasm"]


def test_validation_script_is_queasars_free():
    """The qiskit-side validator must run without this package installed."""
    script = (
        Path(__file__).resolve().parent.parent
        / "examples" / "validate_bundle_with_qiskit.py"
    ).read_text()
    assert "queasars_tpu" not in script.replace(
        "no queasars_tpu import", ""
    ).replace("queasars-tpu interop bundle", "")
