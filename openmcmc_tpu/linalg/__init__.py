"""TPU-native structured linear algebra and GMRF sampling kernels."""

from openmcmc_tpu.linalg import gmrf, ordering, structured
from openmcmc_tpu.linalg.structured import (
    Banded,
    Dense,
    Diagonal,
    Permuted,
    as_structured,
    from_sparse,
)

__all__ = [
    "gmrf",
    "ordering",
    "structured",
    "Dense",
    "Diagonal",
    "Banded",
    "Permuted",
    "as_structured",
    "from_sparse",
]
