"""openmcmc_tpu: a TPU-native JAX MCMC framework.

A from-scratch rebuild of the capabilities of sede-open/openMCMC, designed for TPU:
stateless threefry PRNG, structured (banded) GMRF linear algebra as XLA scan kernels,
lax.scan sampling loops, vmap chain parallelism, and jax.sharding multi-device scaling.
"""

from openmcmc_tpu import diagnostics, distributions, linalg, parallel, parameters, samplers
from openmcmc_tpu.mcmc import MCMC, MCMCResult
from openmcmc_tpu.model import Model

__version__ = "0.1.0"

__all__ = [
    "MCMC",
    "MCMCResult",
    "Model",
    "diagnostics",
    "distributions",
    "linalg",
    "parallel",
    "parameters",
    "samplers",
]
