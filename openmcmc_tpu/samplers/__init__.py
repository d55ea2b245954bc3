"""Samplers: conjugate Gibbs, Metropolis-Hastings family, reversible jump."""

from openmcmc_tpu.samplers.base import Sampler
from openmcmc_tpu.samplers.conjugate import MixtureAllocation, NormalGamma, NormalNormal
from openmcmc_tpu.samplers.elliptical import EllipticalSlice
from openmcmc_tpu.samplers.hmc import HMC
from openmcmc_tpu.samplers.reversible_jump import ReversibleJump
from openmcmc_tpu.samplers.metropolis import (
    ManifoldMALA,
    MetropolisHastings,
    RandomWalk,
    RandomWalkLoop,
    acceptance_rate,
)

__all__ = [
    "Sampler",
    "NormalNormal",
    "NormalGamma",
    "MixtureAllocation",
    "MetropolisHastings",
    "RandomWalk",
    "RandomWalkLoop",
    "ManifoldMALA",
    "HMC",
    "EllipticalSlice",
    "ReversibleJump",
    "acceptance_rate",
]
