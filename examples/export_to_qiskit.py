"""Interop bundle: evolve an ansatz here, validate it in a Qiskit stack.

The reference's external-backend path serializes results for the IBM
Runtime (reference examples/using_the_ibm_runtime.ipynb "Serialize and
store the results" cells).  This framework's TPU-native answer is a
self-contained JSON bundle a Qiskit environment can load without any
queasars_tpu code:

- the optimized circuit as OpenQASM 2.0 with bound parameters,
- the Hamiltonian as a ``SparsePauliOp.from_list``-compatible sparse
  label list (``PauliSum.to_labels`` unfolds the internal Y phase),
- the flat parameter vector, the genome JSON (so THIS stack can rebuild
  the individual too), the expected energy and the decoded solution.

Run here (CPU-friendly):    python examples/export_to_qiskit.py
Validate where qiskit lives: python examples/validate_bundle_with_qiskit.py <bundle.json>

The committed fixture (tests/fixtures/interop_bundle.json) is checked
for internal consistency — genome rebuild reproduces ``expected_energy``
— by tests/test_interop_bundle.py; the qiskit validation script asserts
the QASM circuit + sparse list reproduce the same energy to 1e-6.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import numpy as np

from queasars_tpu.genome.qasm import individual_to_qasm
from queasars_tpu.genome.serialization import EVQEPopulationJSONEncoder
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.problems.jssp import (
    JSSPDomainWallHamiltonianEncoder,
    random_job_shop_scheduling_instance,
)
from queasars_tpu.sim.evaluators import StatevectorExpectationEvaluator
from queasars_tpu.solver import (
    ConfiguredEstimator,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def build_bundle() -> dict:
    instance = random_job_shop_scheduling_instance(
        "interop", n_jobs=2, n_machines=2, relative_op_amount=1.0,
        op_duration=1, random_seed=7,
    )
    encoder = JSSPDomainWallHamiltonianEncoder(jssp_instance=instance, makespan_limit=3)
    hamiltonian = encoder.get_problem_hamiltonian()

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=None,
        optimizer=BatchedNFT(NFTConfig(maxiter=20)),
        optimizer_n_circuit_evaluations=None,
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
    best = result.best_individual

    # exact energy of the exported circuit, re-evaluated independently of
    # the solve (what the qiskit validation reproduces)
    energy = float(
        StatevectorExpectationEvaluator(hamiltonian).evaluate_individuals([best])[0]
    )

    bundle = {
        "format": "queasars-tpu-interop-bundle",
        "version": 1,
        "n_qubits": encoder.n_qubits,
        "bit_convention": (
            "little-endian: bit q of the basis-state index is qubit q; "
            "QASM qreg q[i] is qubit i (reference queasars/utility/"
            "pauli_strings.py:39)"
        ),
        "qasm": individual_to_qasm(best),
        "parameter_values": [float(v) for v in best.parameter_values],
        "genome": json.loads(json.dumps(best, cls=EVQEPopulationJSONEncoder)),
        "operator_sparse_list": [
            [label, coeff.real, coeff.imag] for label, coeff in hamiltonian.to_labels()
        ],
        "expected_energy": energy,
        "solver_eigenvalue": float(result.eigenvalue),
        "problem": "2-job x 2-machine JSSP, makespan_limit 3, seed 7",
    }
    return bundle


def main() -> None:
    bundle = build_bundle()
    out = Path("/tmp/interop_bundle.json")
    out.write_text(json.dumps(bundle, indent=1))
    print(
        f"wrote {out}: {bundle['n_qubits']} qubits, "
        f"{len(bundle['operator_sparse_list'])} Pauli terms, "
        f"expected energy {bundle['expected_energy']:.6f}"
    )
    if "--write-fixture" in sys.argv:
        fixture = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "interop_bundle.json"
        fixture.write_text(json.dumps(bundle, indent=1))
        print(f"wrote {fixture}")
    print("validate in a qiskit environment with:")
    print(f"  python examples/validate_bundle_with_qiskit.py {out}")


if __name__ == "__main__":
    main()
