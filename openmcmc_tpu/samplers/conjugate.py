"""Conjugate Gibbs samplers: NormalNormal, NormalGamma, MixtureAllocation.

TPU-native rebuild of reference sampler/sampler.py:121-355. The structural analysis
(which distribution is the prior, which parameters appear where) happens once in Python
at construction; the emitted computation is pure jnp:

- NormalNormal accumulates the conditional precision Q = P + sum_k A_k' W_k A_k as a
  *structured* matrix, so a banded GMRF prior plus diagonal likelihood stays banded and
  the canonical draw uses the O(p) band kernels instead of SuperLU (reference
  sampler.py:154-207 + gmrf.py:489-520).
- NormalGamma replaces the Python loop over mixture components (reference
  sampler.py:281-287) with segment sums over the allocation vector.
- MixtureAllocation replaces the per-component loop + inverse-CDF search (reference
  sampler.py:345-353) with a single log-space categorical draw.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from openmcmc_tpu.distributions.location_scale import Normal
from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.linalg.structured import mm
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import (
    Identity,
    MixtureParameterMatrix,
    MixtureParameterVector,
    ScaledMatrix,
)
from openmcmc_tpu.samplers.base import Sampler


class NormalNormal(Sampler):
    """Gaussian prior x Gaussian likelihood(s) with linear mean dependence
    (reference sampler/sampler.py:121-207).

    Conditional: Q = P + sum_k A_k' W_k A_k ; b = P m + sum_k A_k' W_k (y_k - d_k);
    draw from N(Q^{-1} b, Q^{-1}) via the canonical sampler, or one truncated Gibbs
    sweep when the prior has domain limits.
    """

    def __init__(self, param: str, model: Model):
        super().__init__(param, model)
        self._is_response = {key: key == param for key in self.model.keys()}
        prior = self.model[param]
        if not isinstance(prior, Normal):
            raise TypeError("NormalNormal requires a Normal prior on the sampled parameter")

    def step(self, key, state: dict, stats: dict, adapt: bool = False) -> Tuple[dict, dict]:
        param = self.param
        Q = None
        b = jnp.zeros((state[param].shape[0], 1))
        for key_r, dist in self.model.items():
            Q_rsp = st.as_structured(dist.precision.predictor(state))
            if self._is_response[key_r]:
                Q = Q_rsp if Q is None else st.add(Q, Q_rsp)
                b = b + st.matvec(Q_rsp, dist.mean.predictor(state))
            else:
                n_obs = state[key_r].shape[1]
                if isinstance(dist.mean, Identity):
                    # Hessian = n * W, structured: keeps GMRF bandedness
                    # (reference takes this via grad_log_p -> dense; structured here).
                    Q_dist = st.scale(float(n_obs), Q_rsp)
                    b = b + st.matvec(Q_rsp, jnp.sum(state[key_r], axis=1, keepdims=True))
                elif isinstance(dist.mean, MixtureParameterVector) and dist.mean.param == param:
                    # Conjugate update of mixture COMPONENT MEANS. Beyond the
                    # reference: its NormalNormal assumes the likelihood mean is
                    # Identity or a LinearCombination (sampler.py:188-192), so
                    # mixture means there can only move by RandomWalkLoop. The
                    # design matrix is the one-hot allocation A (n x m);
                    # A' W A is m x m (Diagonal when W is), so the conditional
                    # precision stays structured. One-hot contraction, not a
                    # gather/segment_sum: per-chain traced indices serialize
                    # vmapped scatters on TPU (see NormalGamma above).
                    alloc = state[dist.mean.allocation].reshape(-1).astype(jnp.int32)
                    m_comp = state[param].shape[0]
                    onehot = (alloc[:, None] == jnp.arange(m_comp)[None, :]).astype(b.dtype)
                    WA = st.matvec(Q_rsp, onehot)  # (n_y, m)
                    if isinstance(Q_rsp, st.Diagonal):
                        Q_dist = st.Diagonal(jnp.sum(WA * onehot, axis=0) * float(n_obs))
                    else:
                        Q_dist = st.Dense(mm(onehot.T, WA) * float(n_obs))
                    b = b + mm(WA.T, jnp.sum(state[key_r], axis=1, keepdims=True))
                else:
                    _, Q_dense = dist.grad_log_p(state, param)
                    Q_dist = st.Dense(Q_dense)
                    predictor_exclude = dist.mean.predictor_conditional(state, term_to_exclude=param)
                    A = state[dist.mean.form_dict[param]]
                    b = b + mm(A.T, st.matvec(Q_rsp, state[key_r] - predictor_exclude))
                Q = Q_dist if Q is None else st.add(Q, Q_dist)

        prior = self.model[param]
        if not prior.truncated:
            new_value = gmrf.sample_normal_canonical(key, b, Q=Q)
        else:
            lo, hi = prior._bounds()
            # chromatic sweep for banded/diagonal Q: bw+1 parallel color updates
            # instead of p sequential coordinate draws (same stationary law);
            # Permuted runs the chromatic sweep in its banded coordinates
            banded_like = isinstance(Q, (st.Banded, st.Diagonal)) or (
                isinstance(Q, st.Permuted) and isinstance(Q.inner, (st.Banded, st.Diagonal))
            )
            schedule = "red_black" if banded_like else "lex"
            new_value = gmrf.gibbs_canonical_truncated_normal(
                key, b, Q, x=state[param], lower=lo, upper=hi, schedule=schedule
            )
        new_state = dict(state)
        new_state[param] = new_value.reshape(state[param].shape)
        return new_state, stats


class NormalGamma(Sampler):
    """Gamma prior on the precision scalar(s) of a Gaussian (reference sampler.py:210-288).

    Posterior per component k: a* = a0 + n_k / 2, b* = b0 + r' P_k r / 2, with P_k the
    unscaled precision restricted to component k. ScaledMatrix precisions have one
    component; MixtureParameterMatrix precisions vectorize over components via segment
    sums instead of the reference's Python loop.
    """

    def __init__(self, param: str, model: Model):
        super().__init__(param, model)
        normal_params = [k for k in self.model.keys() if k != param]
        if len(normal_params) != 1:
            raise TypeError("NormalGamma expects exactly one paired Normal distribution")
        self.normal_param = normal_params[0]
        precision = self.model[self.normal_param].precision
        if not isinstance(precision, (Identity, ScaledMatrix, MixtureParameterMatrix)):
            raise TypeError("precision must be either Identity, ScaledMatrix or MixtureParameterMatrix")

    def step(self, key, state: dict, stats: dict, adapt: bool = False) -> Tuple[dict, dict]:
        param = self.param
        normal_dist = self.model[self.normal_param]
        precision = normal_dist.precision
        mean = normal_dist.mean
        y = state[normal_dist.response]
        residual = y - mean.predictor(state)  # (p_y, n)

        a = jnp.asarray(self.model[param].shape.predictor(state)).reshape(-1)
        b = jnp.asarray(self.model[param].rate.predictor(state)).reshape(-1)
        m = state[param].shape[0]
        a = jnp.broadcast_to(a, (m,))
        b = jnp.broadcast_to(b, (m,))

        if isinstance(precision, MixtureParameterMatrix):
            # one-hot contraction, not segment_sum: a vmapped scatter-add with
            # per-chain traced allocation indices serializes per batch element on
            # TPU; the (m, n) @ (n,) matmul stays batched
            alloc = state[precision.allocation].reshape(-1).astype(jnp.int32)
            rsq = jnp.sum(residual * residual, axis=1)
            onehot = (alloc[:, None] == jnp.arange(m)[None, :]).astype(rsq.dtype)
            quad = rsq @ onehot
            counts = residual.shape[1] * jnp.sum(onehot, axis=0)
            a = a + counts / 2.0
            b = b + quad / 2.0
        elif isinstance(precision, Identity):
            # precision == the sampled scalar itself: unscaled penalty is the identity
            # (the reference declares this case allowed but leaves it unimplemented).
            n_obs = residual.shape[1]
            quad = jnp.sum(residual * residual)
            a = a + residual.shape[0] * n_obs / 2.0
            b = b + quad / 2.0
        else:
            # single scalar precision in front of an unscaled penalty matrix
            P = precision.precision_unscaled(state, 0)
            n_obs = residual.shape[1]
            quad = jnp.sum(residual * st.matvec(P, residual))
            n_eff = jnp.sum(st.diag(P) > 0) * n_obs
            a = a + n_eff / 2.0
            b = b + quad / 2.0

        draw = jax.random.gamma(key, a) / jnp.where(b == 0, jnp.inf, b)
        draw = jnp.where(b == 0, jnp.inf, draw)
        new_state = dict(state)
        new_state[param] = draw.reshape(state[param].shape)
        return new_state, stats


class MixtureAllocation(Sampler):
    """Conjugate allocation sampling for a Normal mixture (reference sampler.py:291-355).

    Conditional allocation probabilities gam_k ∝ prior_k * N(y_i; mu_k, lam_k^{-1}),
    drawn with one log-space categorical per response element.
    """

    def __init__(self, param: str, model: Model, response_param: str):
        # attach only the allocation prior and the mixture response distribution
        self.param = param
        self.response_param = response_param
        self.max_variable_size = None
        full = model
        self.model = Model([full[param], full[response_param]])
        if not isinstance(self.model[response_param], Normal):
            raise TypeError("Mixture model currently only implemented for Normal case")
        if not isinstance(self.model[response_param].mean, MixtureParameterVector):
            raise TypeError("Mean must be of type MixtureParameterVector")
        if not isinstance(self.model[response_param].precision, MixtureParameterMatrix):
            raise TypeError("Precision must be of type MixtureParameterMatrix")

    def step(self, key, state: dict, stats: dict, adapt: bool = False) -> Tuple[dict, dict]:
        response_dist = self.model[self.response_param]
        allocation_prior = self.model[self.param].prob.predictor(state)  # (n, m)
        y = state[self.response_param]  # (n, 1)
        component_mean = state[response_dist.mean.param].reshape(-1)  # (m,)
        component_precision = state[response_dist.precision.param].reshape(-1)  # (m,)

        # log N(y_i; mu_k, 1/lam_k) for all i, k simultaneously
        z2 = (y - component_mean[None, :]) ** 2 * component_precision[None, :]
        log_like = 0.5 * (jnp.log(component_precision)[None, :] - jnp.log(2.0 * jnp.pi) - z2)
        logits = jnp.log(allocation_prior) + log_like
        draw = jax.random.categorical(key, logits, axis=1)
        new_state = dict(state)
        new_state[self.param] = draw.reshape(state[self.param].shape).astype(state[self.param].dtype)
        return new_state, stats
