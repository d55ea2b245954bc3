"""Hamiltonian Monte Carlo sampler (beyond the reference).

The reference's only gradient-based sampler is simplified manifold MALA
(reference metropolis_hastings.py:292-373) -- one preconditioned Langevin step
per iteration. HMC composes ``n_leapfrog`` gradient steps into one distant,
high-acceptance proposal, which dominates MALA-family samplers whenever the
conditional is even moderately correlated and the gradient is cheap (here:
`Model.grad_log_p` is one fused jnp expression, so the whole trajectory is a
``lax.scan`` inside the jitted sweep -- no Python-level loop).

Design notes (TPU-first):
- the trajectory is a fixed-length ``lax.scan`` (static ``n_leapfrog``; no
  data-dependent U-turn criterion, which would break batched lockstep across
  vmapped chains and XLA's static control flow);
- accept/reject reuses the branchless MetropolisHastings machinery: the
  momentum kinetic energies ride the ``logp_pr_g_cr``/``logp_cr_g_pr`` slots
  (forward "proposal density" = -K(p0), reverse = -K(pL)), giving exactly
  log alpha = log_p(theta_L) - K(p_L) - log_p(theta_0) + K(p_0);
- a diagonal ``mass`` matrix is supported (momenta ~ N(0, diag(mass)));
- Robbins-Monro step adaptation targets the HMC-optimal 0.651 acceptance;
- the padded reversible-jump convention (``active_count``) freezes inactive
  entries exactly like ManifoldMALA: their gradient contribution and momentum
  are masked, so the kinetic terms on them cancel in the accept ratio.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from openmcmc_tpu.model import Model
from openmcmc_tpu.samplers.metropolis import MetropolisHastings


class HMC(MetropolisHastings):
    """Fixed-trajectory-length HMC on one (vector) parameter.

    Args:
        param: state entry to sample.
        model: full model (restricted to the conditional internally).
        step: leapfrog step size (scalar, or (p, 1) per-dimension).
        n_leapfrog: static number of leapfrog steps per proposal.
        mass: diagonal mass matrix (scalar or broadcastable to the param shape);
            momenta are drawn N(0, diag(mass)) and the position update divides
            by it, so larger mass = smaller moves in that coordinate.
        active_count: optional count entry freezing padded entries.
        adapt_step / target_accept / adapt_rate: Robbins-Monro burn-in
            adaptation of the (log) step size toward ``target_accept``.
        jitter: per-iteration uniform jitter of the step size in
            ``[step (1 - jitter), step (1 + jitter)]``. Fixed-length HMC on
            near-Gaussian targets has resonances (trajectory angle near a full
            period returns the endpoint to the start: high acceptance, near-zero
            ESS); jitter breaks the periodicity. Default 0.2.
    """

    default_target_accept = 0.651  # HMC-optimal acceptance (Beskos et al. 2013)

    def __init__(
        self,
        param: str,
        model: Model,
        step=0.1,
        n_leapfrog: int = 16,
        mass=1.0,
        active_count=None,
        adapt_step: bool = False,
        target_accept: Optional[float] = None,
        adapt_rate: float = 0.05,
        jitter: float = 0.2,
    ):
        super().__init__(
            param,
            model,
            step=step,
            active_count=active_count,
            adapt_step=adapt_step,
            target_accept=target_accept,
            adapt_rate=adapt_rate,
        )
        if int(n_leapfrog) < 1:
            raise ValueError("n_leapfrog must be >= 1")
        if not 0.0 <= float(jitter) < 1.0:
            raise ValueError("jitter must be in [0, 1)")
        self.n_leapfrog = int(n_leapfrog)
        self.jitter = float(jitter)
        self.mass = jnp.asarray(mass, dtype=jnp.result_type(float))

    def _mask(self, state: dict, shape, dtype):
        if self.active_count is None:
            return jnp.ones((), dtype)
        from openmcmc_tpu.padding import active_mask

        return active_mask(state[self.active_count], shape[0], dtype)[:, None]

    def proposal(self, key, state: dict, param_index=None, step=None):
        theta0 = state[self.param]
        eps = self.step_size if step is None else step
        key, k_jit = jax.random.split(key)
        if self.jitter > 0.0:
            # symmetric per-iteration step jitter (same forward/backward, so the
            # proposal stays reversible and nothing enters the accept ratio)
            u = jax.random.uniform(k_jit, (), theta0.dtype)
            eps = eps * (1.0 - self.jitter + 2.0 * self.jitter * u)
        mask = self._mask(state, theta0.shape, theta0.dtype)
        mass = jnp.broadcast_to(self.mass, theta0.shape)

        def grad(theta):
            s = dict(state)
            s[self.param] = theta
            g = self.model.grad_log_p(s, self.param, hessian_required=False)
            return g.reshape(theta0.shape) * mask

        p0 = jnp.sqrt(mass) * jax.random.normal(key, theta0.shape, theta0.dtype) * mask

        def body(carry, _):
            theta, p, g = carry
            p_half = p + 0.5 * eps * g
            theta_new = theta + eps * p_half / mass
            # frozen padded entries: position never moves, momentum stays masked
            theta_new = mask * theta_new + (1.0 - mask) * theta0
            g_new = grad(theta_new)
            p_new = p_half + 0.5 * eps * g_new
            return (theta_new, p_new, g_new), None

        (theta_l, p_l, _), _ = lax.scan(body, (theta0, p0, grad(theta0)), None, length=self.n_leapfrog)

        def kinetic(p):
            return 0.5 * jnp.sum(p * p / mass * mask)

        updates = {self.param: theta_l}
        # forward/reverse "proposal densities" = the momentum Gaussians:
        # log q(prop | cur) = -K(p0) + const, log q(cur | prop) = -K(pL) + const
        # (leapfrog is volume-preserving and time-reversible, so the position
        # part of the proposal density cancels exactly)
        return updates, -kinetic(p0), -kinetic(p_l)
