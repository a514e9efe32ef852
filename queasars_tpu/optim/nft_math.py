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
    """
    mid = (z1 + z3) / 2
    shift = xp.arctan2((z1 - z3) / 2, z0 - mid)
    minimum_value = mid - xp.sqrt((z0 - mid) ** 2 + ((z1 - z3) / 2) ** 2)
    return shift, minimum_value
