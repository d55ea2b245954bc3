"""Distribution library: location-scale (Normal/LogNormal) and univariate families."""

from openmcmc_tpu.distributions.base import Distribution
from openmcmc_tpu.distributions.location_scale import LocationScale, LogNormal, Normal, NullDistribution
from openmcmc_tpu.distributions.univariate import Categorical, Gamma, Poisson, Uniform

__all__ = [
    "Distribution",
    "LocationScale",
    "Normal",
    "LogNormal",
    "NullDistribution",
    "Gamma",
    "Poisson",
    "Uniform",
    "Categorical",
]
