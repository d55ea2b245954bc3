"""Model: a collection of distributions keyed by response, with static dependency analysis.

TPU-native rebuild of reference model.py:21-112. The dict-of-distributions structure and
``conditional()`` dependency extraction are *static Python metadata* resolved at trace
time (they never enter the compiled program); ``log_p``/``grad_log_p`` emit fused jnp
expressions summed over components.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import jax.numpy as jnp

from openmcmc_tpu.distributions.base import Distribution


class Model(dict):
    """Dictionary of distributions keyed by their response names (reference model.py:21-39).

    Attributes:
        response: optional dict mapping data names -> predictor attribute names, used by
            the driver to store fitted values (reference model.py:28-31).
    """

    def __init__(self, distributions: List[Distribution], response: Optional[Dict[str, str]] = None):
        super().__init__({dist.response: dist for dist in distributions})
        self.response = response

    def conditional(self, param: str) -> "Model":
        """Sub-model of distributions with a dependence on ``param``
        (reference model.py:41-55). Pure static analysis over param_list strings."""
        return Model([dist for dist in self.values() if param in dist.param_list])

    def log_p(self, state: dict) -> jnp.ndarray:
        """Sum of component log-densities (reference model.py:57-70)."""
        total = 0.0
        for dist in self.values():
            total = total + dist.log_p(state)
        return total

    def grad_log_p(
        self, state: dict, param: str, hessian_required: bool = True
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Summed gradient (and negative Hessian) over components (reference model.py:72-112)."""
        grad_sum = jnp.zeros(state[param].shape)
        if hessian_required:
            d = state[param].size
            hessian_sum = jnp.zeros((d, d))
            for dist in self.values():
                grad, hess = dist.grad_log_p(state, param, hessian_required=True)
                grad_sum = grad_sum + grad
                hessian_sum = hessian_sum + hess.reshape(d, d)
            return grad_sum, hessian_sum
        for dist in self.values():
            grad_sum = grad_sum + dist.grad_log_p(state, param, hessian_required=False)
        return grad_sum
