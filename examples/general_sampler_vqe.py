"""Shot-based VQE on a molecular Hamiltonian via QWC measurement grouping.

The reference rejects X/Y operators whenever only a sampler is configured
(evolving_ansatz_minimum_eigensolver.py:240-244) — shot-based solves are
diagonal-only there.  Here the sampler path measures GENERAL Pauli sums
the way hardware does: the operator partitions into qubit-wise-commuting
groups (`paulis/grouping.py`), each group rotates into its product basis
(H / H.Sdg layers) and is sampled with its own shot budget against its
rotated-basis diagonal table (`sim/grouped_sampling.py`).

Demonstrated on the textbook 2-qubit H2 Hamiltonian (STO-3G, parity
mapping with Z2 reduction, bond length 0.735 A — coefficients as tabled
in O'Malley et al., PRX 6, 031007 (2016)), solved with shots only: no
statevector expectation ever reaches the optimizer.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax

# toy sizes are host-dispatch-bound over the remote-TPU tunnel (~40 ms
# per call); the demo runs in seconds on the local CPU backend
jax.config.update("jax_platforms", "cpu")

import numpy as np

from queasars_tpu.optim.nft import BatchedNFT, NFTConfig
from queasars_tpu.paulis import PauliSum, qwc_groups
from queasars_tpu.solver import (
    ConfiguredSampler,
    EVQEMinimumEigensolver,
    EVQEMinimumEigensolverConfiguration,
)


def h2_hamiltonian() -> PauliSum:
    """H2 / STO-3G at 0.735 A, reduced to 2 qubits (parity + Z2 taper)."""
    terms = [
        ("II", -1.052373245772859),
        ("IZ", +0.39793742484318045),
        ("ZI", -0.39793742484318045),
        ("ZZ", -0.01128010425623538),
        ("XX", +0.18093119978423156),
    ]
    op = None
    for label, coeff in terms:
        term = PauliSum.from_label(label, coeff)
        op = term if op is None else op + term
    return op


def main() -> None:
    hamiltonian = h2_hamiltonian()
    exact = float(np.linalg.eigvalsh(hamiltonian.to_dense_matrix()).min())

    const, groups = qwc_groups(hamiltonian)
    print(f"H2 (2 qubits, {hamiltonian.n_terms} Pauli terms)")
    print(f"identity constant {const:+.6f} Ha, {len(groups)} measurement groups:")
    for g in groups:
        x = int(np.bitwise_count(g.x_basis).sum())
        y = int(np.bitwise_count(g.y_basis).sum())
        print(f"  group: {g.diagonal.n_terms} terms, {x} X-basis + {y} Y-basis qubits")

    config = EVQEMinimumEigensolverConfiguration(
        configured_estimator=None,  # sampler ONLY: every energy is shot-sampled
        configured_sampler=ConfiguredSampler(shots=8192, seed=11),
        optimizer=BatchedNFT(NFTConfig(maxiter=16, reset_interval=8)),
        optimizer_n_circuit_evaluations=None,
        max_generations=4,
        max_circuit_evaluations=None,
        termination_criterion=None,
        random_seed=3,
        population_size=8,
        speciation_genetic_distance_threshold=2,
        selection_alpha_penalty=0.02,
        selection_beta_penalty=0.02,
        parameter_search_probability=0.5,
        topological_search_probability=0.4,
        layer_removal_probability=0.05,
        use_tournament_selection=True,  # energies are negative (Hartree)
        tournament_size=2,
    )
    result = EVQEMinimumEigensolver(config).compute_minimum_eigenvalue(hamiltonian)

    print(f"\nexact ground energy     {exact:+.6f} Ha")
    print(f"sampled VQE energy      {float(result.eigenvalue):+.6f} Ha "
          f"(gap {float(result.eigenvalue) - exact:+.4f}, shot noise ~1e-2)")
    print(f"generations: {result.generations}, "
          f"circuit evaluations: {result.total_circuit_evaluations}")

    # chemistry sanity: chemical accuracy is 1.6e-3 Ha; with 8192 shots per
    # group the sampled estimate lands within shot noise of the true minimum
    assert float(result.eigenvalue) < exact + 0.05


if __name__ == "__main__":
    main()
