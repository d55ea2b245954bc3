"""TPU-native structured linear algebra and GMRF sampling kernels."""

from openmcmc_tpu.linalg import gmrf, structured
from openmcmc_tpu.linalg.structured import Banded, Dense, Diagonal, as_structured

__all__ = ["gmrf", "structured", "Dense", "Diagonal", "Banded", "as_structured"]
