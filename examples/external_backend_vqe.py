"""Hardware-in-the-loop evolution through a pluggable external backend.

The reference runs its whole evolution loop against any Qiskit
``BaseEstimatorV2``/``BaseSamplerV2`` — including IBM Runtime real
hardware (reference: examples/using_the_ibm_runtime.ipynb,
circuit_evaluation.py:62-87).  This framework's equivalent is the
``evaluator=`` injection point: wrap any
``evaluate_circuits(circuits, parameter_values) -> energies`` callable in
:class:`CallbackCircuitEvaluator` and EVERY fitness evaluation of the
solve goes through it.

To make the demo honest, the mock backend here round-trips each
evaluation through the interop WIRE FORMAT a real external service would
consume: every probed circuit is rendered to OpenQASM 2.0
(genome/qasm.py — the same exporter behind the interop bundle of
examples/export_to_qiskit.py), and the "remote service" below parses the
QASM text from scratch and simulates it with its own tiny dense numpy
engine.  No internal framework state crosses the boundary — only QASM
text and a sparse Pauli label list, exactly what an IBM-runtime-style
endpoint would receive.

Run (CPU-friendly):  python examples/external_backend_vqe.py
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from queasars_tpu.genome.individual import EVQEIndividual
from queasars_tpu.genome.qasm import individual_to_qasm
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.problems.jssp import (
    JSSPDomainWallHamiltonianEncoder,
    random_job_shop_scheduling_instance,
)
from queasars_tpu.sim.external import CallbackCircuitEvaluator
from queasars_tpu.solver import (
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


# ---------------------------------------------------------------------------
# the "remote service": parses QASM text + sparse Pauli labels, nothing else
# ---------------------------------------------------------------------------

_GATE_RE = re.compile(
    r"(u3|cu3)\(([^,]+),([^,]+),([^)]+)\)\s+q\[(\d+)\](?:,q\[(\d+)\])?;"
)


def _u3(theta: float, phi: float, lam: float) -> np.ndarray:
    c, s = np.cos(theta / 2), np.sin(theta / 2)
    return np.array(
        [[c, -np.exp(1j * lam) * s], [np.exp(1j * phi) * s, np.exp(1j * (phi + lam)) * c]]
    )


class RemoteQasmSimulator:
    """Stands in for an external estimator endpoint: accepts (QASM text,
    sparse Pauli label list) jobs and returns energies.  Shares no code
    with the framework's engines."""

    def __init__(self, sparse_labels):
        self.n_qubits = len(sparse_labels[0][0])
        dim = 1 << self.n_qubits
        # diagonal operator: energies per basis state from Z/I labels
        # (label position 0 = highest qubit index, the qiskit convention)
        self.diagonal = np.zeros(dim)
        for label, re_c, im_c in sparse_labels:
            signs = np.ones(dim)
            for pos, ch in enumerate(label):
                qubit = self.n_qubits - 1 - pos
                if ch == "Z":
                    bits = (np.arange(dim) >> qubit) & 1
                    signs *= 1.0 - 2.0 * bits
                elif ch != "I":
                    raise ValueError("this mock endpoint measures diagonal operators only")
            self.diagonal += re_c * signs
        self.jobs = 0

    def run(self, qasm_programs) -> list[float]:
        self.jobs += 1
        energies = []
        for program in qasm_programs:
            state = np.zeros(1 << self.n_qubits, dtype=complex)
            state[0] = 1.0
            for match in _GATE_RE.finditer(program):
                name, theta, phi, lam = match.group(1), *map(float, match.group(2, 3, 4))
                if name == "u3":
                    target = int(match.group(5))
                    state = self._apply(state, _u3(theta, phi, lam), target, control=None)
                else:  # cu3
                    control, target = int(match.group(5)), int(match.group(6))
                    state = self._apply(state, _u3(theta, phi, lam), target, control)
            energies.append(float(np.abs(state) ** 2 @ self.diagonal))
        return energies

    def _apply(self, state, u, target, control):
        dim = state.shape[0]
        idx = np.arange(dim)
        bit = (idx >> target) & 1
        partner = idx ^ (1 << target)
        apply_mask = np.ones(dim, bool) if control is None else ((idx >> control) & 1) == 1
        lo = np.where(bit == 0, idx, partner)  # the |0>-side index of each pair
        out = state.copy()
        new0 = u[0, 0] * state[lo] + u[0, 1] * state[lo ^ (1 << target)]
        new1 = u[1, 0] * state[lo] + u[1, 1] * state[lo ^ (1 << target)]
        out[apply_mask & (bit == 0)] = new0[apply_mask & (bit == 0)]
        out[apply_mask & (bit == 1)] = new1[apply_mask & (bit == 1)]
        return out


def main() -> None:
    instance = random_job_shop_scheduling_instance(
        "external", n_jobs=2, n_machines=2, relative_op_amount=1.0,
        op_duration=1, random_seed=7,
    )
    encoder = JSSPDomainWallHamiltonianEncoder(jssp_instance=instance, makespan_limit=3)
    hamiltonian = encoder.get_problem_hamiltonian()

    sparse_labels = [
        [label, coeff.real, coeff.imag] for label, coeff in hamiltonian.to_labels()
    ]
    service = RemoteQasmSimulator(sparse_labels)

    def evaluate_circuits(circuits, parameter_values):
        """The backend callable: bind parameters, render to the QASM wire
        format, submit one batched job to the remote service."""
        programs = [
            individual_to_qasm(EVQEIndividual.change_parameter_values(ind, tuple(p)))
            for ind, p in zip(circuits, parameter_values)
        ]
        return service.run(programs)

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=None,
        configured_sampler=None,
        evaluator=CallbackCircuitEvaluator(evaluate_circuits, encoder.n_qubits),
        optimizer=BatchedNFT(NFTConfig(maxiter=10)),
        optimizer_n_circuit_evaluations=10,
        max_generations=4,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=1,
        population_size=8,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.5,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)

    likeliest = max(result.eigenstate.items(), key=lambda kv: kv[1])[0]
    solution = encoder.translate_result_bitstring(
        format(likeliest, f"0{encoder.n_qubits}b")
    )
    print(f"external-backend solve: eigenvalue {result.eigenvalue:.6f}")
    print(f"remote service handled {service.jobs} batched jobs")
    print(f"decoded schedule valid: {solution.is_valid}, makespan {solution.makespan}")


if __name__ == "__main__":
    main()
