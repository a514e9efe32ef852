"""The NFT sinusoid-fit update — single source of truth.

Every NFT implementation in the package (the batched device scan in
``optim/nft.py``, the host-stepped fallback for untraceable objectives,
and the amplitude-sharded device sweeps in ``sim/sharded_evaluator.py``)
imports the update step from here so the fit math cannot drift between
them.  The Pallas in-kernel sweep (``sim/pallas_kernels.py:
pallas_nft_layer_sweep``) re-states the same expressions in the kernel
language with a polynomial atan2 (Mosaic has no atan lowering) and is
pinned against this function by ``tests/test_in_kernel_sweep.py``.

Math (arXiv:1903.12166, matching qiskit's ``nakanishi_fujii_todo``): the
objective is an exact sinusoid in each U3 angle,
``f(theta) = c + a*cos(theta - b)``, so from ``z0 = f(x)``,
``z1 = f(x + pi/2)``, ``z3 = f(x - pi/2)``:

- ``c = (z1 + z3) / 2``
- ``b = x + atan2((z1 - z3)/2, z0 - c)``
- the minimum sits at ``b + pi`` with value ``c - a`` where
  ``a = sqrt((z0 - c)^2 + ((z1 - z3)/2)^2)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def nft_three_point_update(z0, z1, z3, xp=jnp):
    """The 3-point sinusoid fit shared by every NFT implementation.

    :param z0: objective at the current angle ``x``
    :param z1: objective at ``x + pi/2``
    :param z3: objective at ``x - pi/2``
    :param xp: array namespace — ``jax.numpy`` for the device scans,
        ``numpy`` for the host-stepped path (float64)
    :return: ``(shift, minimum_value)`` — add ``shift + pi`` to the
        current angle to land on the fitted minimum, whose fitted value is
        ``minimum_value`` (recycled as the next step's ``z0``)

    The jax path pins the fit's float stream behind optimization
    barriers: XLA contracts/rewrites the ``d*d + e*e`` chain differently
    depending on the operand shapes it compiles for (FMA vs mul-add,
    observed on the CPU backend between a [1]- and a [4]-wide pop
    shard), so the sharded sweeps — which compile once per (pop, amp)
    factorization — would otherwise see 1-ulp ``minimum_value``
    differences across factorizations; the recycled ``z0`` then feeds
    ``arctan2`` where one ulp near a branch point becomes a ±pi shift
    jump (observed at n=10 in the fused-slot sweep).  Barriers around
    ``(d, e)`` and the square sum force identical rounding in every
    compilation, keeping the mesh bit-identity invariant
    value-independent (fuzzed over 20k triples at widths 1/3/4/8).
    """
    mid = (z1 + z3) / 2
    if xp is jnp:
        import jax

        d, e = jax.lax.optimization_barrier((z0 - mid, (z1 - z3) / 2))
        square_sum = jax.lax.optimization_barrier(d * d + e * e)
    else:
        d, e = z0 - mid, (z1 - z3) / 2
        square_sum = d * d + e * e
    shift = xp.arctan2(e, d)
    minimum_value = mid - xp.sqrt(square_sum)
    return shift, minimum_value
