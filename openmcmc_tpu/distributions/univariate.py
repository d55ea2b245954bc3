"""Gamma, Poisson, Uniform and Categorical distributions.

TPU-native rebuild of reference distribution/distribution.py:201-523. All densities are
jnp expressions (VPU-friendly, no scipy), all sampling is stateless ``jax.random``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Union

import jax
import jax.numpy as jnp

from openmcmc_tpu.distributions.base import Distribution
from openmcmc_tpu.parameters import Identity, LinearCombination, MixtureParameterVector, Parameter


def _as_parameter(value: Union[str, Parameter], allowed, what: str) -> Parameter:
    if isinstance(value, str):
        value = Identity(value)
    if not isinstance(value, allowed):
        names = ", ".join(t.__name__ for t in allowed)
        raise TypeError(f"{what} expected to be one of [{names}]")
    return value


_SCALARISH = (Identity, LinearCombination, MixtureParameterVector)


@dataclass(frozen=True, init=False)
class Gamma(Distribution):
    """Gamma in shape/rate convention: f(x) ∝ x^(a-1) exp(-b x) (reference
    distribution.py:201-278).

    ``n_active``: optional name of an integer count state entry; replicate columns at
    index >= count are padding (reversible-jump convention, see openmcmc_tpu.padding)
    and contribute zero to log_p. Padded response values may be zero; the density is
    evaluated on a safe clamp and masked out.
    """

    shape: Parameter
    rate: Parameter
    n_active: Union[str, None]

    #: log_p decomposes as a sum of per-replicate-column terms, each depending only
    #: on that column of the response (enables the vectorized RandomWalkLoop path)
    column_factorized = True

    def __init__(self, response: str, shape, rate, n_active=None):
        object.__setattr__(self, "response", response)
        object.__setattr__(self, "shape", _as_parameter(shape, _SCALARISH, "shape"))
        object.__setattr__(self, "rate", _as_parameter(rate, _SCALARISH, "rate"))
        object.__setattr__(self, "n_active", n_active)

    @property
    def _dist_params(self) -> List[str]:
        extra = [self.n_active] if self.n_active else []
        return self.shape.get_param_list() + self.rate.get_param_list() + extra

    def log_p(self, state: dict, by_observation: bool = False):
        x = state[self.response]
        a = self.shape.predictor(state)
        b = self.rate.predictor(state)
        if self.n_active is not None:
            from openmcmc_tpu.padding import active_mask

            mask = active_mask(state[self.n_active], x.shape[1], dtype=x.dtype)
            x_safe = jnp.where(mask[None, :] > 0, x, 1.0)
            terms = (a - 1.0) * jnp.log(x_safe) - b * x_safe + a * jnp.log(b) - jax.scipy.special.gammaln(a)
            log_p = jnp.sum(terms, axis=0) * mask
        else:
            log_p = jnp.sum(
                (a - 1.0) * jnp.log(x) - b * x + a * jnp.log(b) - jax.scipy.special.gammaln(a), axis=0
            )
        if not by_observation:
            log_p = jnp.sum(log_p)
        return log_p

    def sample(self, key, state: dict, n: int = 1) -> jnp.ndarray:
        a = jnp.asarray(self.shape.predictor(state))
        b = jnp.asarray(self.rate.predictor(state))
        p = max(a.shape[0], b.shape[0])
        a_col = jnp.broadcast_to(a.reshape(-1, 1)[:, :1], (p, 1))
        b_col = jnp.broadcast_to(b.reshape(-1, 1)[:, :1], (p, 1))
        g = jax.random.gamma(key, jnp.broadcast_to(a_col, (p, n)))
        return g / b_col


@dataclass(frozen=True, init=False)
class Poisson(Distribution):
    """Poisson count distribution (reference distribution.py:461-523)."""

    rate: Parameter

    #: per-column log_p terms depend only on their own column (see Gamma)
    column_factorized = True

    def __init__(self, response: str, rate):
        object.__setattr__(self, "response", response)
        object.__setattr__(self, "rate", _as_parameter(rate, _SCALARISH, "rate"))

    @property
    def _dist_params(self) -> List[str]:
        return self.rate.get_param_list()

    def log_p(self, state: dict, by_observation: bool = False):
        x = state[self.response]
        rate = self.rate.predictor(state)
        log_p = jnp.sum(x * jnp.log(rate) - rate - jax.scipy.special.gammaln(x + 1.0), axis=0)
        if not by_observation:
            log_p = jnp.sum(log_p)
        return log_p

    def sample(self, key, state: dict, n: int = 1) -> jnp.ndarray:
        rate = jnp.asarray(self.rate.predictor(state))
        p = rate.shape[0]
        lam = jnp.broadcast_to(rate.reshape(p, -1)[:, :1], (p, n))
        return jax.random.poisson(key, lam).astype(jnp.result_type(float))


@dataclass(frozen=True, init=False)
class Uniform(Distribution):
    """Uniform over a p-dimensional hyper-rectangle (reference distribution.py:377-458).

    ``n_active``: optional count entry name; replicate columns >= count are padding
    (reversible-jump convention) and contribute zero to log_p.
    """

    domain_response_lower: tuple
    domain_response_upper: tuple
    n_active: Union[str, None]

    #: per-column log_p terms depend only on their own column (see Gamma)
    column_factorized = True

    def __init__(self, response: str, domain_response_lower=0.0, domain_response_upper=1.0, n_active=None):
        import numpy as np

        object.__setattr__(self, "response", response)
        lo = np.atleast_1d(np.asarray(domain_response_lower, dtype=float)).reshape(-1)
        hi = np.atleast_1d(np.asarray(domain_response_upper, dtype=float)).reshape(-1)
        object.__setattr__(self, "domain_response_lower", tuple(lo.tolist()))
        object.__setattr__(self, "domain_response_upper", tuple(hi.tolist()))
        object.__setattr__(self, "n_active", n_active)

    @property
    def _dist_params(self) -> List[str]:
        return [self.n_active] if self.n_active else []

    def _limits(self, state: dict):
        d = state[self.response].shape[0]
        lo = jnp.asarray(self.domain_response_lower)
        hi = jnp.asarray(self.domain_response_upper)
        lo = jnp.broadcast_to(lo.reshape(-1, 1), (d, 1))
        hi = jnp.broadcast_to(hi.reshape(-1, 1), (d, 1))
        return lo, hi

    def domain_range(self, state: dict) -> jnp.ndarray:
        lo, hi = self._limits(state)
        return hi - lo

    def log_p(self, state: dict, by_observation: bool = False):
        n = state[self.response].shape[1]
        log_p = -jnp.sum(jnp.log(self.domain_range(state)))
        if self.n_active is not None:
            from openmcmc_tpu.padding import active_mask

            mask = active_mask(state[self.n_active], n, dtype=jnp.result_type(float))
            if by_observation:
                return mask * log_p
            return jnp.sum(mask) * log_p
        if by_observation:
            return jnp.ones(n) * log_p
        return n * log_p

    def sample(self, key, state: dict, n: int = 1) -> jnp.ndarray:
        lo, hi = self._limits(state)
        d = state[self.response].shape[0]
        u = jax.random.uniform(key, (d, n))
        return lo + (hi - lo) * u


@dataclass(frozen=True, init=False)
class Categorical(Distribution):
    """Categorical (single-trial multinomial) over category indices
    (reference distribution.py:281-374).

    state[response] is an integer array (p, n) of category indices; the probability
    parameter is (p, n_cat). log_p is the exact log-probability of the observed index
    sequence, sum_j log prob[i, x[i, j]].

    By default log_p is the probability of the specific index sequence (no ordering
    coefficient) -- the quantity every sampler in the framework needs. Pass
    ``aggregated=True`` to reproduce the reference's behavior for n > 1 replicates
    without by_observation: counts are aggregated per dimension and the multinomial
    pmf INCLUDING the log-multinomial coefficient is evaluated (reference
    distribution.py:347-350).
    """

    prob: Parameter
    aggregated: bool

    def __init__(self, response: str, prob, aggregated: bool = False):
        object.__setattr__(self, "response", response)
        object.__setattr__(self, "prob", _as_parameter(prob, (Identity,), "prob"))
        object.__setattr__(self, "aggregated", bool(aggregated))

    @property
    def _dist_params(self) -> List[str]:
        return self.prob.get_param_list()

    def log_p(self, state: dict, by_observation: bool = False):
        x = state[self.response].astype(jnp.int32)  # (p, n)
        prob = self.prob.predictor(state)  # (p, n_cat)
        logprob = jnp.log(prob)
        n = x.shape[1]
        if self.aggregated and not by_observation and n > 1:
            # reference path: multinomial pmf on aggregated counts, with coefficient
            n_cat = prob.shape[1]
            counts = jnp.sum(x[:, :, None] == jnp.arange(n_cat)[None, None, :], axis=1)  # (p, n_cat)
            coeff = jax.scipy.special.gammaln(n + 1.0) - jnp.sum(
                jax.scipy.special.gammaln(counts + 1.0), axis=1
            )
            return jnp.sum(coeff + jnp.sum(counts * logprob, axis=1))
        # one-hot contraction per element (NOT logprob[rows, x]: a vmapped gather
        # with per-chain traced indices serializes per batch element on TPU)
        n_cat = prob.shape[1]
        onehot = x[:, :, None] == jnp.arange(n_cat)[None, None, :]  # (p, n, n_cat)
        lp = jnp.sum(jnp.where(onehot, logprob[:, None, :], 0.0), axis=-1)  # (p, n)
        log_p = jnp.sum(lp, axis=0)
        if not by_observation:
            log_p = jnp.sum(log_p)
        return log_p

    def sample(self, key, state: dict, n: int = 1) -> jnp.ndarray:
        prob = self.prob.predictor(state)  # (p, n_cat)
        logits = jnp.log(prob)
        draws = jax.random.categorical(key, logits[:, None, :], axis=-1, shape=(prob.shape[0], n))
        return draws.astype(jnp.result_type(float))
