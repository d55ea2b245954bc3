"""Location-scale distributions: Normal, LogNormal, NullDistribution.

TPU-native rebuild of reference distribution/location_scale.py. Precision parameters
evaluate to structured matrices (Dense/Diagonal/Banded), so GMRF priors keep their
bandedness all the way into the Cholesky kernels. Analytic gradient/Hessian cases
mirror the reference (location_scale.py:190-250, 302-402); everything else falls back
to exact autodiff instead of finite differences.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp

from openmcmc_tpu.distributions.base import Distribution
from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.linalg.structured import mm
from openmcmc_tpu.parameters import (
    Identity,
    LinearCombination,
    MixtureParameterMatrix,
    MixtureParameterVector,
    Parameter,
    ScaledMatrix,
)

_MEAN_TYPES = (Identity, LinearCombination, MixtureParameterVector)
_PRECISION_TYPES = (Identity, ScaledMatrix, MixtureParameterMatrix)


def _coerce(value, allowed, what):
    if isinstance(value, str):
        value = Identity(value)
    if not isinstance(value, allowed):
        names = ", ".join(t.__name__ for t in allowed)
        raise TypeError(f"{what} expected to be one of [{names}]")
    return value


@dataclass(frozen=True, init=False)
class LocationScale(Distribution):
    """Mean + precision parameterization (reference location_scale.py:31-62)."""

    mean: Parameter
    precision: Parameter

    def __init__(self, response: str, mean, precision):
        object.__setattr__(self, "response", response)
        object.__setattr__(self, "mean", _coerce(mean, _MEAN_TYPES, "mean"))
        object.__setattr__(self, "precision", _coerce(precision, _PRECISION_TYPES, "precision"))

    @property
    def _dist_params(self) -> List[str]:
        return self.mean.get_param_list() + self.precision.get_param_list()

    def _precision_structured(self, state: dict) -> st.Structured:
        return st.as_structured(self.precision.predictor(state))


class NullDistribution(LocationScale):
    """Zero log-density / gradient / Hessian; used for prior-recovery testing of the
    reversible-jump sampler (reference location_scale.py:65-123)."""

    def log_p(self, state: dict, by_observation: bool = False):
        if by_observation:
            return jnp.zeros(state[self.response].shape[1])
        return jnp.asarray(0.0)

    def grad_log_p(self, state: dict, param: str, hessian_required: bool = True):
        grad = jnp.zeros(state[param].shape)
        if hessian_required:
            d = state[param].shape[0]
            return grad, jnp.zeros((d, d))
        return grad

    def sample(self, key, state: dict, n: int = 1):
        return None


@dataclass(frozen=True, init=False)
class Normal(LocationScale):
    """Multivariate normal in precision form, with optional box truncation
    (reference location_scale.py:126-272).

    As in the reference, the truncated log_p does NOT renormalize for the truncation
    (valid for comparisons over the response at fixed mean/precision; reference
    location_scale.py:148-151); out-of-domain responses get -inf.
    """

    domain_response_lower: Optional[tuple]
    domain_response_upper: Optional[tuple]
    n_active: Optional[str]

    def __init__(
        self, response, mean, precision, domain_response_lower=None, domain_response_upper=None, n_active=None
    ):
        import numpy as np

        super().__init__(response, mean, precision)

        def conv(v):
            if v is None:
                return None
            return tuple(np.atleast_1d(np.asarray(v, dtype=float)).reshape(-1).tolist())

        object.__setattr__(self, "domain_response_lower", conv(domain_response_lower))
        object.__setattr__(self, "domain_response_upper", conv(domain_response_upper))
        # n_active: optional count entry name for the padded reversible-jump
        # convention -- response DIMENSIONS at index >= count are padding and must not
        # contribute to log_p/gradients. Only supported with Diagonal-structured
        # precisions (mixture priors and scaled diagonals), which is the reference's
        # own RJ use case (reference tests/test_reversible_jump.py:194-196).
        object.__setattr__(self, "n_active", n_active)

    @property
    def _dist_params(self) -> List[str]:
        extra = [self.n_active] if self.n_active else []
        return self.mean.get_param_list() + self.precision.get_param_list() + extra

    @property
    def truncated(self) -> bool:
        return self.domain_response_lower is not None or self.domain_response_upper is not None

    def _bounds(self):
        lo = None if self.domain_response_lower is None else jnp.asarray(self.domain_response_lower).reshape(-1, 1)
        hi = None if self.domain_response_upper is None else jnp.asarray(self.domain_response_upper).reshape(-1, 1)
        return lo, hi

    def out_of_domain(self, state: dict):
        """Traced boolean: does the response lie outside the stated domain?
        (reference location_scale.py:169-188)."""
        x = state[self.response]
        lo, hi = self._bounds()
        active = None
        if self.n_active is not None:
            active = self._active_mask(state)[:, None] > 0
        bad = jnp.asarray(False)
        if lo is not None:
            viol = x < lo
            if active is not None:
                viol = jnp.logical_and(viol, active)
            bad = jnp.logical_or(bad, jnp.any(viol))
        if hi is not None:
            viol = x > hi
            if active is not None:
                viol = jnp.logical_and(viol, active)
            bad = jnp.logical_or(bad, jnp.any(viol))
        return bad

    def _active_mask(self, state: dict):
        from openmcmc_tpu.padding import active_mask

        d = state[self.response].shape[0]
        return active_mask(state[self.n_active], d, dtype=jnp.result_type(float))

    def _masked_log_p(self, state: dict, by_observation: bool):
        """log_p over active dimensions only; requires a Diagonal precision."""
        Q = self._precision_structured(state)
        if not isinstance(Q, st.Diagonal):
            raise TypeError("Normal with n_active requires a Diagonal-structured precision")
        mask = self._active_mask(state)[:, None]
        r = state[self.response] - self.mean.predictor(state)
        lam = Q.diag_[:, None]
        terms = 0.5 * (jnp.log(lam) - jnp.log(2.0 * jnp.pi) - lam * r * r) * mask
        log_p = jnp.sum(terms, axis=0)
        if not by_observation:
            log_p = jnp.sum(log_p)
        return log_p

    def log_p(self, state: dict, by_observation: bool = False):
        if self.n_active is not None:
            log_p = self._masked_log_p(state, by_observation)
        elif isinstance(self.precision, ScaledMatrix):
            log_p = self._scaled_log_p(state, by_observation)
        else:
            Q = self._precision_structured(state)
            mu = self.mean.predictor(state)
            log_p = gmrf.mvn_log_pdf(state[self.response], mu, Q=Q, by_observation=by_observation)
        if self.truncated:
            log_p = jnp.where(self.out_of_domain(state), -jnp.inf, log_p)
        return log_p

    def _scaled_log_p(self, state: dict, by_observation: bool):
        """log N(x; mu, (c P)^{-1}) factoring only the UNSCALED penalty P.

        P is typically constant data, so XLA constant-folds its Cholesky out of the
        sampling loop entirely; the scale enters analytically:
        log p = 1/2 (d log c + log|P| - d log 2 pi - c ||L_P^T (x - mu)||^2).
        """
        scalar = jnp.reshape(jnp.asarray(state[self.precision.scalar]), ())
        P = st.as_structured(state[self.precision.matrix])
        chol = st.cholesky(P)
        x = state[self.response]
        d = x.shape[0]
        mu = self.mean.predictor(state)
        r = x - (mu if jnp.ndim(mu) == x.ndim else jnp.reshape(mu, (d, -1)))
        w = st.chol_matvec_t(chol, r)
        quad = jnp.sum(w * w, axis=0)
        log_2pi = jnp.log(2.0 * jnp.pi)
        log_p = 0.5 * (d * jnp.log(scalar) + st.chol_log_det(chol) - d * log_2pi - scalar * quad)
        if not by_observation:
            log_p = jnp.sum(log_p)
        return log_p

    def grad_log_p(self, state: dict, param: str, hessian_required: bool = True):
        """Three analytic cases as in the reference (location_scale.py:190-250):
        response; linear mean parameter; autodiff fallback."""
        if param == self.response and self.n_active is not None:
            # masked response case: inactive dims get zero gradient and unit Hessian
            # diagonal (keeps Fisher preconditioning invertible under padding)
            Q = self._precision_structured(state)
            if not isinstance(Q, st.Diagonal):
                raise TypeError("Normal with n_active requires a Diagonal-structured precision")
            mask = self._active_mask(state)
            r = state[self.response] - self.mean.predictor(state)
            grad = -(Q.diag_[:, None] * r) * mask[:, None]
            if hessian_required:
                hess_diag = Q.diag_ * mask + (1.0 - mask)
                # eye-mask instead of diagflat: diagflat of a traced vector is a
                # serialized per-chain scatter under vmap on TPU
                return grad, jnp.eye(hess_diag.shape[-1], dtype=hess_diag.dtype) * hess_diag[None, :]
            return grad

        if param == self.response:
            Q = self._precision_structured(state)
            r = state[self.response] - self.mean.predictor(state)
            grad = -st.matvec(Q, r)
            if hessian_required:
                n = state[param].shape[1]
                hessian = st.to_dense(Q)
                if n > 1:
                    hessian = jnp.kron(hessian, jnp.eye(n, dtype=hessian.dtype))
                return grad, hessian
            return grad

        if param in self.mean.get_grad_param_list() and param not in self.precision.get_grad_param_list():
            Q = self._precision_structured(state)
            r = jnp.sum(state[self.response] - self.mean.predictor(state), axis=1, keepdims=True)
            grad_param = self.mean.grad(state, param)  # (d_param, d_resp)
            # grad_param @ Q applied columnwise: (Q @ grad_param.T).T keeps Q structured
            grad_times_prec = st.matvec(Q, grad_param.T).T
            grad = mm(grad_times_prec, r)
            if hessian_required:
                n = state[self.response].shape[1]
                hessian = n * mm(grad_times_prec, grad_param.T)
                return grad, hessian
            return grad

        return super().grad_log_p(state, param, hessian_required=hessian_required)

    def sample(self, key, state: dict, n: int = 1) -> jnp.ndarray:
        mean = self.mean.predictor(state)
        Q = self._precision_structured(state)
        if not self.truncated:
            return gmrf.sample_normal(key, mean, Q=Q, n=n)
        lo, hi = self._bounds()
        return gmrf.sample_truncated_normal(key, mean, Q=Q, lower=lo, upper=hi, n=n)


@dataclass(frozen=True, init=False)
class LogNormal(LocationScale):
    """Multivariate log-normal: MVN on log(response) with Jacobian -sum log x
    (reference location_scale.py:275-418)."""

    def __init__(self, response, mean, precision):
        super().__init__(response, mean, precision)

    def log_p(self, state: dict, by_observation: bool = False):
        Q = self._precision_structured(state)
        mu = self.mean.predictor(state)
        x = state[self.response]
        log_p = gmrf.mvn_log_pdf(jnp.log(x), mu, Q=Q, by_observation=True) - jnp.sum(jnp.log(x), axis=0)
        if not by_observation:
            log_p = jnp.sum(log_p)
        return log_p

    def grad_log_p(self, state: dict, param: str, hessian_required: bool = True):
        Q = self._precision_structured(state)
        if param == self.response:
            x = state[self.response]
            r = jnp.log(x) - self.mean.predictor(state)
            grad = -(1.0 / x) * (1.0 + st.matvec(Q, r))
        elif param in self.mean.get_grad_param_list() and param not in self.precision.get_grad_param_list():
            r = jnp.sum(jnp.log(state[self.response]) - self.mean.predictor(state), axis=1, keepdims=True)
            grad_param = self.mean.grad(state, param)
            grad = mm(st.matvec(Q, grad_param.T).T, r)
        else:
            grad = self._autodiff_grad(state, param)

        if hessian_required:
            return grad, self.hessian_log_p(state, param)
        return grad

    def hessian_log_p(self, state: dict, param: str) -> jnp.ndarray:
        """NEGATIVE Hessian, three cases as reference location_scale.py:352-402.

        Response case for (d, n) responses: block structure over replicates with
        flattening order matching x.reshape(-1) (row-major over (d, n)):
            -H[(i,k), (j,k)] = (1/x_ik) Q_ij (1/x_jk) - delta_ij (1/x_ik^2)(1 + [Q r]_ik)
        """
        if param == self.response:
            Q = self._precision_structured(state)
            x = state[self.response]
            d, n = x.shape
            r = jnp.log(x) - self.mean.predictor(state)
            recip = 1.0 / x
            qd = st.to_dense(Q)
            # blocks[k] over observations: outer(recip[:, k]) * Q
            blocks = jnp.einsum("ik,ij,jk->kij", recip, qd, recip)
            out = jnp.zeros((n, d, n, d), x.dtype)
            idx = jnp.arange(n)
            out = out.at[idx, :, idx, :].set(blocks)
            out = out.transpose((1, 0, 3, 2)).reshape(n * d, n * d)
            diag_term = (recip**2 * (1.0 + st.matvec(Q, r))).reshape(-1)
            return out - jnp.eye(diag_term.shape[-1], dtype=diag_term.dtype) * diag_term[None, :]

        if param in self.mean.get_grad_param_list() and param not in self.precision.get_grad_param_list():
            Q = self._precision_structured(state)
            grad_param = self.mean.grad(state, param)
            return state[self.response].shape[1] * mm(st.matvec(Q, grad_param.T).T, grad_param.T)

        return self._autodiff_neg_hessian(state, param)

    def sample(self, key, state: dict, n: int = 1) -> jnp.ndarray:
        mean = self.mean.predictor(state)
        Q = self._precision_structured(state)
        return jnp.exp(gmrf.sample_normal(key, mean, Q=Q, n=n))
