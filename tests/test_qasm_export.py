"""QASM export: structure checks + a hand-parsed simulation cross-check."""

import re

import numpy as np
import pytest

from queasars_tpu.genome import EVQEIndividual, EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.genome.qasm import individual_to_qasm
from queasars_tpu.sim import probabilities


def parse_and_simulate(qasm: str, n: int) -> np.ndarray:
    """Tiny QASM interpreter for u3/cu3 lines (dense kron oracle)."""
    from tests.test_statevector import cu3_dense, embed, u3_dense

    psi = np.zeros(1 << n, dtype=np.complex128)
    psi[0] = 1.0
    for line in qasm.splitlines():
        m = re.match(r"u3\((.*),(.*),(.*)\) q\[(\d+)\];", line)
        if m:
            theta, phi, lam, q = float(m[1]), float(m[2]), float(m[3]), int(m[4])
            psi = embed(u3_dense(theta, phi, lam), q, n) @ psi
            continue
        m = re.match(r"cu3\((.*),(.*),(.*)\) q\[(\d+)\],q\[(\d+)\];", line)
        if m:
            theta, phi, lam, c, t = float(m[1]), float(m[2]), float(m[3]), int(m[4]), int(m[5])
            psi = cu3_dense(theta, phi, lam, control=c, target=t, n=n) @ psi
    return psi


@pytest.mark.parametrize("seed", [0, 1])
def test_qasm_round_trip_simulation(seed):
    n = 4
    individual = EVQEPopulation.random_population(n, 3, 1, True, random_seed=seed).individuals[0]
    qasm = individual_to_qasm(individual)
    assert qasm.startswith("OPENQASM 2.0;")
    assert f"qreg q[{n}];" in qasm

    psi = parse_and_simulate(qasm, n)
    packed = PackedPopulation.pack([individual])
    probs_engine = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )[0]
    np.testing.assert_allclose(np.abs(psi) ** 2, probs_engine, atol=1e-5)


def test_qasm_measurements_block():
    individual = EVQEPopulation.random_population(3, 1, 1, True, random_seed=2).individuals[0]
    qasm = individual_to_qasm(individual, include_measurements=True)
    assert "creg c[3];" in qasm
    assert qasm.count("measure q[") == 3
