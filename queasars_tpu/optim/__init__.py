"""Batched on-device parameter optimizers.

Replaces the reference's use of qiskit-algorithms optimizers (NFT/SPSA/
COBYLA, called per individual per layer via ``optimizer.minimize`` at
queasars/minimum_eigensolvers/evqe/evolutionary_algorithm/mutation.py:77-81)
with optimizers whose whole population advances in lock-step under one
``lax.scan``: every optimizer step is two or three batched circuit
evaluations of the entire population, not P independent host loops.
"""

from queasars_tpu.optim.nft import BatchedNFT, NFTConfig
from queasars_tpu.optim.spsa import BatchedSPSA, SPSAConfig
from queasars_tpu.optim.cobyla import ScipyCobyla
from queasars_tpu.optim.gradient import BatchedGradientDescent, GradientDescentConfig
from queasars_tpu.optim.spsa_termination import SPSATerminationChecker

__all__ = [
    "BatchedNFT",
    "NFTConfig",
    "BatchedSPSA",
    "SPSAConfig",
    "ScipyCobyla",
    "BatchedGradientDescent",
    "GradientDescentConfig",
    "SPSATerminationChecker",
]
