"""Distribution base class and autodiff gradient machinery.

TPU-native rebuild of the reference's Distribution ABC
(/root/reference/src/openmcmc/distribution/distribution.py:28-198). The reference's
default gradients are finite differences with a deepcopy of the state per element
(reference distribution.py:124-198); here the default is exact ``jax.grad`` /
``jax.hessian`` through the pure ``log_p``, which traces into the same jitted program
as everything else.

Conventions preserved from the reference:
- ``log_p`` returns the POSITIVE log-density.
- ``grad_log_p`` returns (grad of POSITIVE log-p, NEGATIVE Hessian).
- state[name] is (p, n): p = dimension, n = replicates.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import List, Tuple, Union

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Distribution(ABC):
    """Abstract distribution keyed by its response state name."""

    response: str

    @abstractmethod
    def log_p(self, state: dict, by_observation: bool = False):
        """POSITIVE log-density under the current state (scalar, or (n,) per observation)."""

    @abstractmethod
    def sample(self, key, state: dict, n: int = 1) -> jnp.ndarray:
        """Draw (p, n) samples from the distribution under the current state."""

    # Alias matching the reference API name (reference distribution.py:56).
    def rvs(self, key, state: dict, n: int = 1) -> jnp.ndarray:
        return self.sample(key, state, n)

    @property
    @abstractmethod
    def _dist_params(self) -> List[str]:
        """State names used by the distribution's parameters (excluding the response)."""

    @property
    def param_list(self) -> List[str]:
        """All state names, response included (reference distribution.py:79-88)."""
        return [self.response] + self._dist_params

    def grad_log_p(
        self, state: dict, param: str, hessian_required: bool = True
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Gradient (and negative Hessian) of log_p w.r.t. a named state entry.

        Default implementation: exact reverse-mode autodiff through log_p, replacing
        the reference's central finite differences (reference distribution.py:124-198).
        Subclasses override with cheaper analytic forms where the reference has them.
        """
        grad = self._autodiff_grad(state, param)
        if hessian_required:
            return grad, self._autodiff_neg_hessian(state, param)
        return grad

    # -- finite-difference cross-checks --------------------------------------

    def grad_log_p_diff(self, state: dict, param: str, step_size: float = 1e-4) -> jnp.ndarray:
        """Central-difference gradient of log_p (reference distribution.py:124-158).

        Kept for parity and as an independent cross-check of the autodiff/analytic
        gradients; vectorized over perturbed states instead of the reference's
        per-element deepcopy loop."""
        shape = state[param].shape
        flat = jnp.asarray(state[param]).reshape(-1)
        d = flat.shape[0]
        eye = jnp.eye(d, dtype=flat.dtype) * (step_size / 2.0)

        def one(delta):
            plus = dict(state)
            plus[param] = (flat + delta).reshape(shape)
            minus = dict(state)
            minus[param] = (flat - delta).reshape(shape)
            return (jnp.sum(self.log_p(plus)) - jnp.sum(self.log_p(minus))) / step_size

        return jax.vmap(one)(eye).reshape(shape)

    def hessian_log_p_diff(self, state: dict, param: str, step_size: float = 1e-4) -> jnp.ndarray:
        """Finite-difference NEGATIVE Hessian (reference distribution.py:160-198):
        differences of grad_log_p_diff along each coordinate."""
        shape = state[param].shape
        flat = jnp.asarray(state[param]).reshape(-1)
        d = flat.shape[0]
        eye = jnp.eye(d, dtype=flat.dtype) * (step_size / 2.0)

        def one(delta):
            plus = dict(state)
            plus[param] = (flat + delta).reshape(shape)
            minus = dict(state)
            minus[param] = (flat - delta).reshape(shape)
            g_plus = self.grad_log_p_diff(plus, param, step_size).reshape(-1)
            g_minus = self.grad_log_p_diff(minus, param, step_size).reshape(-1)
            return (g_minus - g_plus) / step_size

        return jax.vmap(one, out_axes=1)(eye)

    # -- autodiff helpers ---------------------------------------------------

    def _scalar_log_p(self, state: dict, param: str):
        shape = state[param].shape

        def fn(flat):
            new_state = dict(state)
            new_state[param] = flat.reshape(shape)
            return jnp.sum(self.log_p(new_state))

        return fn

    def _autodiff_grad(self, state: dict, param: str) -> jnp.ndarray:
        fn = self._scalar_log_p(state, param)
        flat = jnp.asarray(state[param]).reshape(-1)
        return jax.grad(fn)(flat).reshape(state[param].shape)

    def _autodiff_neg_hessian(self, state: dict, param: str) -> jnp.ndarray:
        fn = self._scalar_log_p(state, param)
        flat = jnp.asarray(state[param]).reshape(-1)
        return -jax.hessian(fn)(flat)
