"""Sampler protocol: pure per-parameter update steps.

TPU-native rebuild of reference sampler/sampler.py:37-118 (MCMCSampler ABC). The
reference mutates a state dict in a Python loop; here every sampler exposes a pure

    step(key, state, stats) -> (state, stats)

suitable for composition into a fused Gibbs sweep inside ``lax.scan``/``vmap``/``pjit``.
``stats`` is a small pytree of scanned counters (Metropolis acceptance etc.), replacing
the reference's mutable AcceptRate objects (reference metropolis_hastings.py:25-66).

Storage layout/padding for variable-dimension (reversible-jump) parameters follows the
reference's ``max_variable_size`` convention (reference sampler/sampler.py:69-118) but
is handled by the driver: all shapes are static and padded.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, Tuple

from openmcmc_tpu.model import Model


class Sampler(ABC):
    """Abstract per-parameter sampler.

    Attributes:
        param: name of the state entry this sampler updates.
        model: sub-model restricted to distributions depending on ``param``
            (restriction done once in Python at construction, reference sampler.py:53-55).
    """

    param: str
    model: Model

    def __init__(self, param: str, model: Model, max_variable_size=None):
        self.param = param
        self.model = model.conditional(param)
        self.max_variable_size = max_variable_size

    def init_stats(self) -> Dict:
        """Initial scanned-statistics pytree for this sampler (empty by default)."""
        return {}

    @abstractmethod
    def step(self, key, state: dict, stats: dict, adapt: bool = False) -> Tuple[dict, dict]:
        """Draw a new value for ``self.param``; return the updated state and stats.

        ``adapt`` is True during burn-in sweeps: samplers with tunable proposal
        parameters (Metropolis step sizes) update them from the acceptance signal;
        it must be False during the sampling phase (fixed kernel => valid chain)."""

    # -- reference-API convenience ------------------------------------------

    def sample(self, key, state: dict) -> dict:
        """Single update without stats tracking (reference MCMCSampler.sample)."""
        new_state, _ = self.step(key, state, self.init_stats())
        return new_state
