"""Build and execute the example notebooks.

The reference ships its examples as Jupyter notebooks
(reference: examples/*.ipynb); the script counterparts live in
``examples/``.  This builder regenerates the committed ``.ipynb`` files
— each is executed top-to-bottom on the CPU backend at tiny sizes, so
the stored outputs are real.

Run from the repo root:  python notebooks/build_notebooks.py [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import nbformat
from nbclient import NotebookClient

HERE = Path(__file__).resolve().parent

SETUP = """\
import sys
from pathlib import Path

sys.path.insert(0, str(Path.cwd().parent))  # repo root
import jax

jax.config.update("jax_platforms", "cpu")  # tiny demo sizes: skip the TPU
%matplotlib inline"""

CONFIG_NOTE = """\
The configuration surface matches the reference solver knob-for-knob
(reference: evqe.py:34-177).  `BatchedNFT` runs the whole population's
parameter search in lock-step on the device — one compiled scan instead
of the reference's per-individual optimizer round trips."""

PLOT_DISTRIBUTION = """\
import matplotlib.pyplot as plt

dist = result.eigenstate
states = sorted(dist, key=dist.get, reverse=True)[:16]
fig, ax = plt.subplots(figsize=(7, 3))
ax.bar(range(len(states)), [dist[s] for s in states], color="#4477aa")
ax.set_xticks(range(len(states)))
ax.set_xticklabels([format(s, f"0{n_qubits}b") for s in states], rotation=70)
ax.set_ylabel("probability")
ax.set_title("measured distribution of the best individual")
plt.tight_layout()
fig"""


def _jssp_sample_cells(title, seed, makespan_limit, max_generations=8):
    """One complete JSSP sample: instance -> Gantt -> Hamiltonian ->
    solve -> distribution -> decode -> solution Gantt."""
    return [
        ("md", f"# {title}"),
        ("md", "### Create the JSSP problem instance"),
        (
            "code",
            f"""\
from queasars_tpu.problems.jssp import (
    JSSPDomainWallHamiltonianEncoder,
    random_job_shop_scheduling_instance,
)

instance = random_job_shop_scheduling_instance(
    "sample", n_jobs=2, n_machines=2, relative_op_amount=1.0,
    op_duration=1, random_seed={seed},
)
instance""",
        ),
        ("md", "### Visualize the created problem instance (optional)"),
        (
            "code",
            """\
from queasars_tpu.problems.jssp.visualization import plot_jssp_problem_instance_gantt

plot_jssp_problem_instance_gantt(instance)""",
        ),
        ("md", "### Convert the problem instance to a Hamiltonian"),
        (
            "code",
            f"""\
encoder = JSSPDomainWallHamiltonianEncoder(jssp_instance=instance, makespan_limit={makespan_limit})
hamiltonian = encoder.get_problem_hamiltonian()
n_qubits = encoder.n_qubits
print(f"{{n_qubits}} qubits, {{hamiltonian.n_terms}} Pauli terms")""",
        ),
        ("md", "### Configure the EVQEMinimumEigensolver\n\n" + CONFIG_NOTE),
        (
            "code",
            f"""\
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.solver import (
    BestIndividualRelativeChangeTolerance,
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)

config = EVQEMinimumEigensolverConfiguration(
    configured_estimator=ConfiguredEstimator(),
    configured_sampler=ConfiguredSampler(shots=2048, seed=0),
    optimizer=BatchedNFT(NFTConfig(maxiter=40)),
    optimizer_n_circuit_evaluations=None,
    max_generations={max_generations},
    max_circuit_evaluations=None,
    termination_criterion=BestIndividualRelativeChangeTolerance(0.005),
    random_seed=0,
    population_size=10,
    speciation_genetic_distance_threshold=2,
    selection_alpha_penalty=0.1,
    selection_beta_penalty=0.1,
    parameter_search_probability=0.25,
    topological_search_probability=0.4,
    layer_removal_probability=0.05,
)
solver = EVQEMinimumEigensolver(config)""",
        ),
        ("md", "### Solve the problem as posed in the Hamiltonian"),
        (
            "code",
            """\
result = solver.compute_minimum_eigenvalue(hamiltonian)
print(f"eigenvalue {result.eigenvalue:.4f} after {result.generations} generations "
      f"({result.total_circuit_evaluations} circuit evaluations)")""",
        ),
        ("md", "### Plot the distribution"),
        ("code", PLOT_DISTRIBUTION),
        ("md", "### Use the encoder to retrieve the solution"),
        (
            "code",
            f"""\
from queasars_tpu.problems.jssp.exact_solver import solve_jssp_exact

best_state = max(result.eigenstate, key=result.eigenstate.get)
schedule = encoder.translate_result_state(best_state)
oracle = solve_jssp_exact(instance, makespan_limit={makespan_limit})
print(f"decoded schedule valid: {{schedule.is_valid}}, makespan: {{schedule.makespan}} "
      f"(exact optimum: {{oracle.makespan}})")
schedule""",
        ),
        ("md", "### Visualize the result (optional)"),
        (
            "code",
            """\
from queasars_tpu.problems.jssp.visualization import plot_jssp_problem_solution_gantt

plot_jssp_problem_solution_gantt(schedule)""",
        ),
    ]


EVQE_OPTIMIZATION = [
    (
        "md",
        """\
# EVQE on a quadratic integer program

Counterpart of the reference's `evqe_optimization.ipynb`.  The reference
builds its model in docplex and converts it through
qiskit-optimization's `IntegerToBinary` + `to_ising`;
`IntegerQuadraticProgram` performs the same lowering natively
(reference fixture: test/minimum_eigensolvers/evqe/model.py:10-23).""",
    ),
    ("code", SETUP),
    ("md", "## Create the quadratic integer model"),
    (
        "code",
        """\
from queasars_tpu.problems.qubo import IntegerQuadraticProgram

# minimize x^2 - y^2 for integers x, y in [0, 3]  (optimum: x=0, y=3)
program = IntegerQuadraticProgram()
x = program.integer_var(0, 3, "x")
y = program.integer_var(0, 3, "y")
program.minimize(quadratic={(x, x): 1.0, (y, y): -1.0})""",
    ),
    ("md", "## Convert the model to an Ising Hamiltonian"),
    (
        "code",
        """\
hamiltonian, offset = program.to_ising()
n_qubits = program.n_qubits
print(f"{n_qubits} qubits, {len(hamiltonian.coeffs)} Pauli terms, offset {offset:+.2f}")""",
    ),
    ("md", "## Configure the EVQEMinimumEigensolver\n\n" + CONFIG_NOTE),
    (
        "code",
        """\
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)

config = EVQEMinimumEigensolverConfiguration(
    configured_estimator=ConfiguredEstimator(),
    configured_sampler=ConfiguredSampler(shots=1000, seed=0),
    optimizer=BatchedNFT(NFTConfig(maxiter=20)),
    optimizer_n_circuit_evaluations=None,
    max_generations=4,
    max_circuit_evaluations=None,
    termination_criterion=None,
    random_seed=0,
    population_size=8,
    speciation_genetic_distance_threshold=3,
    selection_alpha_penalty=0.1,
    selection_beta_penalty=0.1,
    parameter_search_probability=0.3,
    topological_search_probability=0.3,
    layer_removal_probability=0.05,
    use_tournament_selection=True,
    tournament_size=2,
)
solver = EVQEMinimumEigensolver(config)""",
    ),
    ("md", "## Solve the problem as posed in the Hamiltonian"),
    (
        "code",
        """\
result = solver.compute_minimum_eigenvalue(hamiltonian)
print(f"best energy {result.eigenvalue:+.4f} (objective {float(result.eigenvalue) + offset:+.4f})")""",
    ),
    ("md", "## Plot the distribution"),
    ("code", PLOT_DISTRIBUTION),
    ("md", "## Retrieve the integer variables"),
    (
        "code",
        """\
likeliest = max(result.eigenstate.items(), key=lambda kv: kv[1])[0]
values = program.decode(likeliest)
print(f"likeliest assignment: {values} -> objective {program.objective_value(values):+.1f}")
assert values == {"x": 0, "y": 3}""",
    ),
]


JSSP_SMALL = (
    [
        (
            "md",
            """\
# Small Examples for E-VQE

Counterpart of the reference's `evqe_jssp_small_examples.ipynb`: two
complete job-shop-scheduling solves at demonstration size — encode the
instance as a domain-wall Ising Hamiltonian, evolve an ansatz with EVQE,
decode the likeliest bitstring back into a schedule and check it against
the exact branch-and-bound oracle.""",
        ),
        ("code", SETUP),
    ]
    + _jssp_sample_cells("First sample (4 qubits)", seed=42, makespan_limit=3)
    + _jssp_sample_cells("Second sample", seed=7, makespan_limit=3, max_generations=6)
)


JSSP_OPTIMIZATION = [
    (
        "md",
        """\
# JSSP optimization with the sampler path

Counterpart of the reference's `evqe_jssp_optimization.ipynb`: finite
shots, a CVaR objective tail (alpha = 0.5, per
quantum-journal q-2020-04-20-256) and tournament selection.  Sized to
finish quickly on CPU; scale shots / maxiter / problem up on TPU.""",
    ),
    ("code", SETUP),
    ("md", "## Create the JSSP problem instance"),
    (
        "code",
        """\
from queasars_tpu.problems.jssp import (
    JSSPDomainWallHamiltonianEncoder,
    random_job_shop_scheduling_instance,
)

instance = random_job_shop_scheduling_instance(
    "jssp_opt", n_jobs=2, n_machines=2, relative_op_amount=1.0,
    op_duration=1, random_seed=1,
)
instance""",
    ),
    ("md", "## Visualize the created problem instance (optional)"),
    (
        "code",
        """\
from queasars_tpu.problems.jssp.visualization import plot_jssp_problem_instance_gantt

plot_jssp_problem_instance_gantt(instance)""",
    ),
    ("md", "## Convert the problem instance to a Hamiltonian"),
    (
        "code",
        """\
encoder = JSSPDomainWallHamiltonianEncoder(
    jssp_instance=instance,
    makespan_limit=4,
    encoding_penalty=300,
    overlap_constraint_penalty=100,
    precedence_constraint_penalty=100,
    max_opt_value=100,
)
hamiltonian = encoder.get_problem_hamiltonian()
n_qubits = encoder.n_qubits
print(f"{n_qubits} qubits, {hamiltonian.n_terms} Pauli terms")""",
    ),
    (
        "md",
        "## Configure the EVQEMinimumEigensolver\n\nNo estimator here: "
        "`configured_sampler` + `distribution_alpha_tail` select the "
        "shot-based sampler path with a CVaR objective.",
    ),
    (
        "code",
        """\
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.solver import (
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)

config = EVQEMinimumEigensolverConfiguration(
    configured_estimator=None,  # sampler path: finite shots + CVaR
    configured_sampler=ConfiguredSampler(shots=512, seed=0),
    distribution_alpha_tail=0.5,
    optimizer=BatchedNFT(NFTConfig(maxiter=20)),
    optimizer_n_circuit_evaluations=None,
    max_generations=4,
    max_circuit_evaluations=None,
    termination_criterion=None,
    random_seed=0,
    population_size=10,
    speciation_genetic_distance_threshold=2,
    selection_alpha_penalty=2.0,
    selection_beta_penalty=2.0,
    parameter_search_probability=0.25,
    topological_search_probability=0.4,
    layer_removal_probability=0.05,
    use_tournament_selection=True,
    tournament_size=2,
)
solver = EVQEMinimumEigensolver(config)""",
    ),
    ("md", "## Solve the problem as posed in the Hamiltonian"),
    (
        "code",
        """\
result = solver.compute_minimum_eigenvalue(hamiltonian)
print(f"CVaR eigenvalue: {result.eigenvalue:.4f} after {result.generations} generations")""",
    ),
    ("md", "## Plot the distribution"),
    ("code", PLOT_DISTRIBUTION),
    ("md", "## Use the encoder to retrieve the solution"),
    (
        "code",
        """\
from queasars_tpu.problems.jssp.exact_solver import solve_jssp_exact

best_state = max(result.eigenstate, key=result.eigenstate.get)
schedule = encoder.translate_result_state(best_state)
oracle = solve_jssp_exact(instance, makespan_limit=4)
print(f"decoded schedule valid: {schedule.is_valid}, makespan: {schedule.makespan} "
      f"(exact optimum: {oracle.makespan})")
schedule""",
    ),
    ("md", "## Visualize the result (optional)"),
    (
        "code",
        """\
from queasars_tpu.problems.jssp.visualization import plot_jssp_problem_solution_gantt

plot_jssp_problem_solution_gantt(schedule)""",
    ),
]


SERIALIZATION = [
    (
        "md",
        """\
# Serialize, restore and resume solves

Counterpart of the reference's `using_the_ibm_runtime.ipynb`
"Serialize and store the results" workflow (there is no cloud backend
here — evaluation is the on-device engine), plus two resume capabilities
the reference lacks: continuing from a stored final population and
exact-trajectory crash recovery from a full-solver-state checkpoint.""",
    ),
    ("code", SETUP),
    ("md", "## Solve a small problem"),
    (
        "code",
        """\
from queasars_tpu.optim import BatchedNFT, NFTConfig
from queasars_tpu.problems.jssp import (
    JSSPDomainWallHamiltonianEncoder,
    random_job_shop_scheduling_instance,
)
from queasars_tpu.solver import (
    ConfiguredEstimator,
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)

instance = random_job_shop_scheduling_instance(
    "resume_demo", n_jobs=2, n_machines=2, relative_op_amount=1.0,
    op_duration=1, random_seed=7,
)
encoder = JSSPDomainWallHamiltonianEncoder(instance, makespan_limit=3)
hamiltonian = encoder.get_problem_hamiltonian()


def make_config(**overrides):
    defaults = dict(
        configured_estimator=ConfiguredEstimator(),
        configured_sampler=ConfiguredSampler(shots=2048, seed=0),
        optimizer=BatchedNFT(NFTConfig(maxiter=30)),
        optimizer_n_circuit_evaluations=None,
        max_generations=3,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=0,
        population_size=8,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.1,
        selection_beta_penalty=0.1,
        parameter_search_probability=0.25,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
    )
    defaults.update(overrides)
    return EVQEMinimumEigensolverConfiguration(**defaults)


result = EVQEMinimumEigensolver(make_config()).compute_minimum_eigenvalue(hamiltonian)
print(f"eigenvalue {result.eigenvalue:.4f} after {result.generations} generations")""",
    ),
    (
        "md",
        "## Serialize and store the results\n\nThe JSON codec round-trips "
        "the full result object — populations, genomes, quasi-distributions, "
        "per-generation evaluation records (wire-compatible with the "
        "reference's sentinel-key format).",
    ),
    (
        "code",
        """\
import json

from queasars_tpu.solver.serialization import (
    EvolvingAnsatzMinimumEigensolverResultJSONDecoder,
    EvolvingAnsatzMinimumEigensolverResultJSONEncoder,
)

path = "/tmp/evqe_result.json"
with open(path, "w") as fh:
    json.dump(result, fh, cls=EvolvingAnsatzMinimumEigensolverResultJSONEncoder)
print(f"saved {len(open(path).read())} bytes")""",
    ),
    ("md", "## Restore and continue from the stored population"),
    (
        "code",
        """\
with open(path) as fh:
    restored = json.load(fh, cls=EvolvingAnsatzMinimumEigensolverResultJSONDecoder)
final_population = restored.final_population_evaluation_result.population
resumed = EVQEMinimumEigensolver(
    make_config(max_generations=3, initial_population=final_population, random_seed=1)
).compute_minimum_eigenvalue(hamiltonian)
print(f"resumed solve: eigenvalue {resumed.eigenvalue:.4f} "
      f"after {resumed.generations} more generations")
assert resumed.eigenvalue <= restored.eigenvalue + 1e-6""",
    ),
    (
        "md",
        "## Crash recovery from a checkpoint\n\n`checkpoint_path=` "
        "persists the FULL solver state every generation (operator RNG "
        "states, evaluation ledger, best-so-far, shot counters); "
        "`resume_from_checkpoint=` continues the exact trajectory, "
        "bit-identical to the uninterrupted run.",
    ),
    (
        "code",
        """\
checkpoint = "/tmp/evqe_checkpoint.json"
EVQEMinimumEigensolver(
    make_config(max_generations=2, checkpoint_path=checkpoint)
).compute_minimum_eigenvalue(hamiltonian)  # "crashes" after 2 generations

recovered = EVQEMinimumEigensolver(
    make_config(max_generations=4, resume_from_checkpoint=checkpoint)
).compute_minimum_eigenvalue(hamiltonian)
uninterrupted = EVQEMinimumEigensolver(
    make_config(max_generations=4)
).compute_minimum_eigenvalue(hamiltonian)
print(f"recovered eigenvalue:     {recovered.eigenvalue:.6f}")
print(f"uninterrupted eigenvalue: {uninterrupted.eigenvalue:.6f}")
assert float(recovered.eigenvalue) == float(uninterrupted.eigenvalue)""",
    ),
]


NOTEBOOKS = {
    "evqe_optimization.ipynb": EVQE_OPTIMIZATION,
    "evqe_jssp_small_examples.ipynb": JSSP_SMALL,
    "evqe_jssp_optimization.ipynb": JSSP_OPTIMIZATION,
    "serialization_and_restore.ipynb": SERIALIZATION,
}


def build(name: str, cells) -> None:
    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "name": "python3",
        "display_name": "Python 3",
        "language": "python",
    }
    for kind, src in cells:
        if kind == "md":
            nb.cells.append(nbformat.v4.new_markdown_cell(src))
        else:
            nb.cells.append(nbformat.v4.new_code_cell(src))
    client = NotebookClient(
        nb, timeout=900, kernel_name="python3", resources={"metadata": {"path": str(HERE)}}
    )
    client.execute()
    nbformat.write(nb, HERE / name)
    print(f"built {name}: {len(nb.cells)} cells")


def main() -> None:
    selected = sys.argv[1:] or list(NOTEBOOKS)
    for name in selected:
        build(name if name.endswith(".ipynb") else name + ".ipynb", NOTEBOOKS[name.removesuffix(".ipynb") + ".ipynb"])


if __name__ == "__main__":
    main()
