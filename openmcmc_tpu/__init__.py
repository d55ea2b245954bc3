"""openmcmc_tpu: a TPU-native JAX MCMC framework.

A from-scratch rebuild of the capabilities of sede-open/openMCMC, designed for TPU:
stateless threefry PRNG, structured (banded) GMRF linear algebra as XLA scan kernels,
lax.scan sampling loops, vmap chain parallelism, and jax.sharding multi-device scaling.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: scan-heavy MCMC programs take tens of seconds to
# compile; cache them across processes. Opt out with JAX_COMPILATION_CACHE_DIR="".
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    try:
        _cache = _os.path.join(_os.path.expanduser("~"), ".cache", "openmcmc_tpu_xla")
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from openmcmc_tpu import (
    basis,
    checkpoint,
    diagnostics,
    distributions,
    fused,
    linalg,
    padding,
    parallel,
    parameters,
    samplers,
)
from openmcmc_tpu.mcmc import MCMC, MCMCResult
from openmcmc_tpu.model import Model

__version__ = "0.2.0"

__all__ = [
    "MCMC",
    "MCMCResult",
    "Model",
    "checkpoint",
    "diagnostics",
    "distributions",
    "fused",
    "linalg",
    "padding",
    "parallel",
    "parameters",
    "samplers",
]
