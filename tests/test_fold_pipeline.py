"""Oracle tests for the kron-fold circuit transform (sim/fold_pipeline.py).

The transform rewrites a genome circuit into L+1 kron layers of 2x2
factors plus L controlled-diagonal phase passes (the MXU formulation).
It must be EXACT (up to f32 trig rounding): the dense reference applier
has to reproduce the statevector engine on arbitrary genomes, including
controlled rotations with any control/target placement, masked layers
and initial states.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from queasars_tpu.genome import EVQEPopulation
from queasars_tpu.genome.packing import PackedPopulation
from queasars_tpu.sim.fold_pipeline import (
    apply_fold_pipeline_reference,
    build_fold_pipeline,
    cu3_slot_factors_reference,
)
from queasars_tpu.sim.statevector import probabilities, simulate_circuits


def _packed(n, layers, pop, seed):
    population = EVQEPopulation.random_population(n, layers, pop, True, random_seed=seed)
    return PackedPopulation.pack(list(population.individuals))


@pytest.mark.parametrize("n,layers,seed", [(4, 2, 0), (5, 3, 1), (6, 4, 2)])
def test_pipeline_matches_engine(n, layers, seed):
    packed = _packed(n, layers, pop=6, seed=seed)
    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
    )
    got = np.asarray(apply_fold_pipeline_reference(pipe, n))
    want = np.asarray(
        simulate_circuits(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    # global phase is physical here (no global-phase gauge in the
    # transform), so states must match directly
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_pipeline_matches_engine_with_masked_layers():
    """Individuals of different depths: padding layers must be identity."""
    n = 5
    pop_obj = EVQEPopulation.random_population(n, 1, 4, True, random_seed=3)
    individuals = list(pop_obj.individuals)
    # deepen two individuals so the pack has real mask variation
    from queasars_tpu.genome.individual import EVQEIndividual

    individuals[0] = EVQEIndividual.random_individual(n, 4, True, random_seed=11)
    individuals[2] = EVQEIndividual.random_individual(n, 3, True, random_seed=12)
    packed = PackedPopulation.pack(individuals)
    assert not bool(np.all(packed.layer_mask))
    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
    )
    got = np.asarray(apply_fold_pipeline_reference(pipe, n))
    want = np.asarray(
        simulate_circuits(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_pipeline_with_initial_state():
    n = 4
    packed = _packed(n, 2, pop=3, seed=5)
    rng = np.random.default_rng(7)
    raw = rng.normal(size=(3, 2, 1 << n)).astype(np.float32)
    norm = np.sqrt((raw**2).sum(axis=(1, 2), keepdims=True))
    initial = jnp.asarray(raw / norm)
    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
    )
    got = np.asarray(apply_fold_pipeline_reference(pipe, n, initial=initial))
    want = np.asarray(
        simulate_circuits(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n,
            initial,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-6)


@pytest.mark.parametrize(
    "theta,phi,lam",
    [
        (0.0, 0.0, 0.0),            # identity
        (0.0, 1.3, -1.3),           # phase-only, s = 0
        (0.0, np.pi, np.pi),        # W ~ -I (s = pi)
        (np.pi, 0.7, 0.2),          # sin(theta/2) = 1
        (1e-6, 0.5, 0.5),           # near-degenerate
        (2.1, -0.9, 2.8),           # generic
    ],
)
def test_eigendecomposition_reconstructs_u3(theta, phi, lam):
    """V diag(p0, p1) V^dag must equal U3 for edge-case angles."""
    v, p0, p1 = cu3_slot_factors_reference(theta, phi, lam)
    u3 = np.array(
        [
            [np.cos(theta / 2), -np.exp(1j * lam) * np.sin(theta / 2)],
            [
                np.exp(1j * phi) * np.sin(theta / 2),
                np.exp(1j * (phi + lam)) * np.cos(theta / 2),
            ],
        ]
    )
    recon = v @ np.diag([p0, p1]) @ v.conj().T
    np.testing.assert_allclose(recon, u3, atol=2e-6)
    np.testing.assert_allclose(v @ v.conj().T, np.eye(2), atol=2e-6)


def test_probabilities_match_at_seven_qubits():
    """A lane-boundary size (n = 7, one full axis group)."""
    n = 7
    packed = _packed(n, 3, pop=4, seed=9)
    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
    )
    states = np.asarray(apply_fold_pipeline_reference(pipe, n))
    got = states[:, 0] ** 2 + states[:, 1] ** 2
    want = np.asarray(
        probabilities(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_group_active_flags():
    """Masked layers must deactivate every group; CROT-only layers keep
    groups active only through their V factors (still active)."""
    n = 5
    pop_obj = EVQEPopulation.random_population(n, 1, 2, True, random_seed=4)
    individuals = list(pop_obj.individuals)
    from queasars_tpu.genome.individual import EVQEIndividual

    individuals[0] = EVQEIndividual.random_individual(n, 3, True, random_seed=21)
    packed = PackedPopulation.pack(individuals)
    pipe = build_fold_pipeline(
        packed.gate_types, packed.controls, packed.angles, packed.layer_mask, n
    )
    active = np.asarray(pipe.group_active)
    counts = np.asarray(pipe.diag_count)
    n_real = packed.layer_mask.sum(axis=1)
    # kron layer k > L_real is identity (its vdag and main parts are both
    # from masked layers)
    for p in range(len(individuals)):
        for k in range(int(n_real[p]) + 1, active.shape[1]):
            assert not active[p, k].any()
        for layer in range(int(n_real[p]), counts.shape[1]):
            assert counts[p, layer] == 0


def test_extend_with_rotation_bit_identical_to_full_rebuild():
    """Appending a measurement-rotation layer to a built pipeline must be
    BIT-identical to rebuilding the fold on the extended circuit (the
    rotation's Vdag factors are exact identities, so every shared kron
    layer and every absorption decision is unchanged) — the invariant
    that lets the grouped sampler build the fold once per evaluation
    instead of once per group (round 4, VERDICT r3 item 6)."""
    from queasars_tpu.paulis.grouping import measurement_rotation_layer, qwc_groups
    from queasars_tpu.problems.spin_chains import heisenberg_chain
    from queasars_tpu.sim.fold_pipeline import extend_fold_pipeline_with_rotation
    from queasars_tpu.sim.grouped_sampling import append_rotation_layer

    n = 6
    packed = _packed(n, 3, 4, seed=11)
    operator = heisenberg_chain(n)
    _const, groups = qwc_groups(operator)
    assert len(groups) >= 2

    for absorb in (False, True):
        base = build_fold_pipeline(
            packed.gate_types, packed.controls, packed.angles, packed.layer_mask,
            n, absorb_diag=absorb,
        )
        for group in groups[:3]:
            rot_type, rot_angle = measurement_rotation_layer(group, n)
            extended = extend_fold_pipeline_with_rotation(
                base, jnp.asarray(rot_type), jnp.asarray(rot_angle), n
            )
            rebuilt = build_fold_pipeline(
                *append_rotation_layer(
                    packed.gate_types, packed.controls, packed.angles,
                    packed.layer_mask, jnp.asarray(rot_type), jnp.asarray(rot_angle),
                ),
                n, absorb_diag=absorb,
            )
            for field, got, want in zip(
                extended._fields, extended, rebuilt
            ):
                np.testing.assert_array_equal(
                    np.asarray(got), np.asarray(want),
                    err_msg=f"field {field} (absorb_diag={absorb})",
                )
