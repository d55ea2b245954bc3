"""Metropolis-Hastings family: RandomWalk, RandomWalkLoop, ManifoldMALA.

TPU-native rebuild of reference sampler/metropolis_hastings.py. Key design changes:

- Accept/reject is branchless: the proposal is always computed and a ``jnp.where``
  select keeps either the proposed or current value, so all vmapped chains stay in
  lockstep (no per-chain control-flow divergence).
- Proposals return a dict of only the entries they modify; the select runs over that
  set (never over the full state, avoiding HBM traffic on constant data).
- Acceptance counting is a scanned stats pytree ({'accept', 'proposal'} int32 counters),
  replacing the mutable AcceptRate object (reference metropolis_hastings.py:25-66).
- No deepcopy per proposal (reference metropolis_hastings.py:237,314): state dicts are
  immutable-by-convention; an updated dict shares all unmodified leaves.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.model import Model
from openmcmc_tpu.samplers.base import Sampler


def acceptance_rate(stats: dict) -> jnp.ndarray:
    """Percentage of proposals accepted, from a sampler's stats pytree."""
    return 100.0 * stats["accept"] / jnp.maximum(stats["proposal"], 1)


class MetropolisHastings(Sampler):
    """Abstract MH sampler (reference metropolis_hastings.py:69-173).

    Subclasses implement ``proposal(key, state) -> (updates, logp_pr_g_cr, logp_cr_g_pr)``
    where ``updates`` contains only the state entries the proposal modifies.
    """

    #: default acceptance-rate target for step adaptation (overridden per subclass)
    default_target_accept = 0.234

    # Carried current-state log-density: when the MCMC driver determines that no
    # OTHER sampler in the sweep modifies this sampler's model inputs (single-sampler
    # chains, or independent blocks), it seeds a "logp" entry in this sampler's stats
    # pytree; its presence is the (per-run) switch — each step then evaluates only the
    # proposal density (halving density work) and writes back the exact post-accept
    # value: log_p(selected state) == where(accept, logp_proposal, logp_current).

    def __init__(
        self,
        param: str,
        model: Model,
        step=0.2,
        active_count=None,
        updated_names=None,
        adapt_step: bool = False,
        target_accept: Optional[float] = None,
        adapt_rate: float = 0.05,
    ):
        super().__init__(param, model)
        # step size kept under step_size: .step is the update method
        self.step_size = jnp.atleast_2d(jnp.asarray(step, dtype=jnp.result_type(float)))
        # active_count: optional name of an integer count entry; entries of the
        # sampled parameter beyond the count (padded reversible-jump convention,
        # see openmcmc_tpu.padding) are frozen by the proposal.
        self.active_count = active_count
        self.updated_names = updated_names if updated_names is not None else [param]
        # Robbins-Monro step adaptation during burn-in (beyond the reference, which
        # uses fixed step sizes): log step moves toward the target acceptance rate,
        # per chain; the kernel is frozen once sampling starts.
        self.adapt_step = bool(adapt_step)
        self.target_accept = float(target_accept) if target_accept is not None else self.default_target_accept
        self.adapt_rate = float(adapt_rate)

    def init_stats(self):
        stats = {"accept": jnp.zeros((), jnp.int32), "proposal": jnp.zeros((), jnp.int32)}
        if self.adapt_step:
            stats["log_step"] = jnp.log(self.step_size)
        return stats

    def _step_value(self, stats: dict):
        if self.adapt_step:
            return jnp.exp(stats["log_step"])
        return self.step_size

    def _adapt(self, stats: dict, log_accept, adapt: bool) -> dict:
        if not self.adapt_step or not adapt:
            return stats
        alpha = jnp.exp(jnp.minimum(log_accept, 0.0))
        new_stats = dict(stats)
        new_stats["log_step"] = stats["log_step"] + self.adapt_rate * (alpha - self.target_accept)
        return new_stats

    def proposal(self, key, state: dict, param_index=None) -> Tuple[dict, jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    def _conditional_log_p(self, state: dict) -> jnp.ndarray:
        total = 0.0
        for dist in self.model.values():
            total = total + dist.log_p(state)
        return total

    def _accept_reject(self, key, state, updates, logp_pr_g_cr, logp_cr_g_pr, stats, force_reject=None, logp_cs=None):
        """Branchless accept/reject (reference metropolis_hastings.py:127-173).

        ``logp_cs``: optionally the precomputed current-state conditional log-density
        (the carried value when ``carry_logp`` is on)."""
        prop_state = dict(state)
        prop_state.update(updates)
        if logp_cs is None:
            logp_cs = self._conditional_log_p(state)
        logp_pr = self._conditional_log_p(prop_state)
        log_accept = logp_pr + logp_cr_g_pr - (logp_cs + logp_pr_g_cr)
        accept = jnp.log(jax.random.uniform(key)) < log_accept
        if force_reject is not None:
            accept = jnp.logical_and(accept, jnp.logical_not(force_reject))
        new_state = dict(state)
        for name, proposed in updates.items():
            new_state[name] = jnp.where(accept, proposed, state[name])
        new_stats = dict(stats)
        new_stats["accept"] = stats["accept"] + accept.astype(jnp.int32)
        new_stats["proposal"] = stats["proposal"] + 1
        if "logp" in stats:
            new_stats["logp"] = jnp.where(accept, logp_pr, logp_cs)
        return new_state, new_stats, log_accept

    def initial_carried_logp(self, state: dict) -> jnp.ndarray:
        """Value of the carried log-density entry for the initial state."""
        return jnp.asarray(self._conditional_log_p(state))

    def step(self, key, state: dict, stats: dict, adapt: bool = False) -> Tuple[dict, dict]:
        k_prop, k_acc = jax.random.split(key)
        updates, logp_pr_g_cr, logp_cr_g_pr = self.proposal(k_prop, state, step=self._step_value(stats))
        new_state, new_stats, log_accept = self._accept_reject(
            k_acc, state, updates, logp_pr_g_cr, logp_cr_g_pr, stats,
            # recompute when the driver didn't seed a carried value (multi-sampler
            # sweeps with shared inputs, or a bare step() call outside MCMC)
            logp_cs=stats.get("logp"),
        )
        return new_state, self._adapt(new_stats, log_accept, adapt)


class RandomWalk(MetropolisHastings):
    """(Truncated) Gaussian random-walk proposals (reference metropolis_hastings.py:176-269).

    ``domain_limits`` is a (p, 2) array of [lower, upper] proposal truncation bounds;
    ``state_update_function(key, prop_updates, state) -> (prop_updates, logp_fwd, logp_rev)``
    optionally recomputes dependent state entries (e.g. basis matrices) for the proposal;
    when provided, the full model is kept (no conditional restriction), matching the
    reference (metropolis_hastings.py:201-209).
    """

    default_target_accept = 0.234

    def __init__(
        self,
        param: str,
        model: Model,
        step=0.2,
        domain_limits=None,
        state_update_function: Optional[Callable] = None,
        active_count=None,
        updated_names=None,
        adapt_step: bool = False,
        target_accept: Optional[float] = None,
        adapt_rate: float = 0.05,
    ):
        self.param = param
        self.max_variable_size = None
        self.state_update_function = state_update_function
        self.model = model if state_update_function is not None else model.conditional(param)
        self.step_size = jnp.atleast_2d(jnp.asarray(step, dtype=jnp.result_type(float)))
        self.domain_limits = None if domain_limits is None else np.asarray(domain_limits, dtype=float)
        self.active_count = active_count
        self.updated_names = updated_names if updated_names is not None else [param]
        self.adapt_step = bool(adapt_step)
        self.target_accept = float(target_accept) if target_accept is not None else self.default_target_accept
        self.adapt_rate = float(adapt_rate)

    def proposal(self, key, state: dict, param_index=None, step=None):
        value = state[self.param]
        step_size = self.step_size if step is None else step
        if param_index is None:
            mu = value
            step = step_size
        else:
            mu = lax.dynamic_slice_in_dim(value, param_index, 1, axis=1)
            step = step_size if step_size.shape[1] == 1 else lax.dynamic_slice_in_dim(
                step_size, param_index, 1, axis=1
            )

        k_draw, k_update = jax.random.split(key)
        if self.domain_limits is None:
            z = mu + step * jax.random.normal(k_draw, mu.shape, dtype=mu.dtype)
            logp_pr_g_cr = jnp.asarray(0.0)
            logp_cr_g_pr = jnp.asarray(0.0)
        else:
            lb = jnp.asarray(self.domain_limits[:, 0]).reshape(-1, 1)
            ub = jnp.asarray(self.domain_limits[:, 1]).reshape(-1, 1)
            z = gmrf.truncated_normal_rv(k_draw, mu, step, lower=lb, upper=ub, shape=mu.shape)
            logp_pr_g_cr = jnp.sum(gmrf.truncated_normal_log_pdf(z, mu, step, lower=lb, upper=ub))
            logp_cr_g_pr = jnp.sum(gmrf.truncated_normal_log_pdf(mu, z, step, lower=lb, upper=ub))

        if param_index is None:
            proposed = z
        else:
            proposed = lax.dynamic_update_slice_in_dim(value, z, param_index, axis=1)
        updates = {self.param: proposed}

        if self.state_update_function is not None:
            updates, logp_fwd, logp_rev = self.state_update_function(k_update, updates, state, param_index)
            logp_pr_g_cr = logp_pr_g_cr + logp_fwd
            logp_cr_g_pr = logp_cr_g_pr + logp_rev
        return updates, logp_pr_g_cr, logp_cr_g_pr


class RandomWalkLoop(RandomWalk):
    """One-at-a-time RW update over the n replicate columns of the parameter
    (reference metropolis_hastings.py:272-289), as a ``lax.scan`` over columns.

    Two density-work optimizations over the naive per-column accept/reject (the
    reference evaluates the FULL conditional model log_p twice per column,
    reference metropolis_hastings.py:149-160):

    - the evaluated model is restricted to distributions whose ``param_list``
      intersects ``updated_names`` -- only those terms can change when a column
      (or a hook-updated entry like a basis matrix) changes, so every other
      term cancels exactly in the accept ratio;
    - the current state's log-density is computed ONCE before the scan and
      carried through it (on accept it becomes the proposal's value), so each
      column evaluates only the proposal. Together: 2 full-model evaluations
      per column become 1 restricted evaluation.

    VECTORIZED PATH: when the restricted model factorizes per column -- every
    loop distribution either contributes zero (NullDistribution) or is a
    column-factorized prior on the looped parameter itself -- the n sequential
    single-column MH kernels commute, so updating all columns in ONE step with
    independent per-column accept decisions is exactly the same composite kernel.
    This removes the n-step sequential scan entirely (the dominant cost of the
    reversible-jump sweep). Enabled automatically; dependent entries (e.g. basis
    matrices) are refreshed once post-accept via ``vector_state_update_function
    (key, updates, state) -> updates`` (pass it alongside the per-column
    ``state_update_function``, which the sequential fallback still uses).
    """

    default_target_accept = 0.44  # 1-D optimal acceptance

    def __init__(self, *args, vector_state_update_function: Optional[Callable] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.vector_state_update_function = vector_state_update_function

    def _loop_distributions(self):
        dists = getattr(self, "_loop_dists", None)
        if dists is None:
            names = set(self.updated_names)
            dists = [d for d in self.model.values() if names.intersection(d.param_list)]
            self._loop_dists = dists
        return dists

    def _vectorized_ok(self) -> bool:
        """True when the one-at-a-time sweep provably equals one vectorized step."""
        cached = getattr(self, "_vec_ok", None)
        if cached is not None:
            return cached
        from openmcmc_tpu.distributions.location_scale import NullDistribution

        ok = True
        if self.state_update_function is not None and self.vector_state_update_function is None:
            ok = False  # hook only has a per-column form; must run sequentially
        for d in self._loop_distributions():
            if isinstance(d, NullDistribution):
                continue  # identically zero: cannot couple columns
            if (
                d.response == self.param
                and getattr(d, "column_factorized", False)
                and self.param not in d._dist_params
            ):
                continue  # own-column prior term
            ok = False
        self._vec_ok = ok
        return ok

    def _loop_log_p(self, state: dict) -> jnp.ndarray:
        total = jnp.asarray(0.0)
        for dist in self._loop_distributions():
            total = total + dist.log_p(state)
        return total

    def _loop_log_p_columns(self, state: dict) -> jnp.ndarray:
        """Per-column restricted log-density (n,), valid when _vectorized_ok."""
        from openmcmc_tpu.distributions.location_scale import NullDistribution

        n = state[self.param].shape[1]
        total = jnp.zeros((n,))
        for dist in self._loop_distributions():
            if isinstance(dist, NullDistribution):
                continue
            total = total + dist.log_p(state, by_observation=True).reshape(n)
        return total

    def _step_vectorized(self, key, state: dict, stats: dict, adapt: bool) -> Tuple[dict, dict]:
        value = state[self.param]  # (p, n)
        n = value.shape[1]
        k_prop, k_hook, k_acc = jax.random.split(key, 3)
        step = self._step_value(stats)
        if self.domain_limits is None:
            z = value + step * jax.random.normal(k_prop, value.shape, value.dtype)
            lf = jnp.zeros((n,))
            lr = jnp.zeros((n,))
        else:
            lb = jnp.asarray(self.domain_limits[:, 0]).reshape(-1, 1)
            ub = jnp.asarray(self.domain_limits[:, 1]).reshape(-1, 1)
            z = gmrf.truncated_normal_rv(k_prop, value, step, lower=lb, upper=ub, shape=value.shape)
            lf = jnp.sum(gmrf.truncated_normal_log_pdf(z, value, step, lower=lb, upper=ub), axis=0)
            lr = jnp.sum(gmrf.truncated_normal_log_pdf(value, z, step, lower=lb, upper=ub), axis=0)

        prop_state = dict(state)
        prop_state[self.param] = z
        log_accept = self._loop_log_p_columns(prop_state) + lr - (self._loop_log_p_columns(state) + lf)
        active = jnp.ones((n,), jnp.bool_)
        if self.active_count is not None:
            active = jnp.arange(n) < jnp.reshape(state[self.active_count], ())
        accept = jnp.logical_and(jnp.log(jax.random.uniform(k_acc, (n,))) < log_accept, active)
        updates = {self.param: jnp.where(accept[None, :], z, value)}
        if self.vector_state_update_function is not None:
            updates = self.vector_state_update_function(k_hook, updates, state)
        new_state = dict(state)
        new_state.update(updates)
        new_stats = dict(stats)
        new_stats["accept"] = stats["accept"] + jnp.sum(accept).astype(jnp.int32)
        new_stats["proposal"] = stats["proposal"] + jnp.sum(active).astype(jnp.int32)
        if self.adapt_step and adapt:
            # Robbins-Monro: the sequential path applies one nudge per active
            # column; summing the per-column signals reproduces the same total
            # per-sweep adjustment (and the same fixed point)
            alpha = jnp.exp(jnp.minimum(log_accept, 0.0))
            total = jnp.sum(jnp.where(active, alpha - self.target_accept, 0.0))
            new_stats["log_step"] = stats["log_step"] + self.adapt_rate * total
        return new_state, new_stats

    def step(self, key, state: dict, stats: dict, adapt: bool = False) -> Tuple[dict, dict]:
        if self._vectorized_ok():
            return self._step_vectorized(key, state, stats, adapt)
        n = state[self.param].shape[1]
        carried = list(dict.fromkeys(self.updated_names))  # param + hook-updated entries
        logp0 = self._loop_log_p(state)

        def body(carry, inp):
            values, sts, logp_cur = carry
            idx, k = inp
            cur_state = dict(state)
            cur_state.update(values)
            k_prop, k_acc = jax.random.split(k)
            updates, lf, lr = self.proposal(k_prop, cur_state, param_index=idx, step=self._step_value(sts))
            active = jnp.asarray(True)
            if self.active_count is not None:
                active = idx < jnp.reshape(state[self.active_count], ())
            prop_state = dict(cur_state)
            prop_state.update(updates)
            logp_pr = self._loop_log_p(prop_state)
            log_accept = logp_pr + lr - (logp_cur + lf)
            accept = jnp.logical_and(jnp.log(jax.random.uniform(k_acc)) < log_accept, active)
            new_values = {
                name: jnp.where(accept, updates.get(name, cur_state[name]), cur_state[name])
                for name in carried
            }
            logp_new = jnp.where(accept, logp_pr, logp_cur)
            new_stats = dict(sts)
            new_stats["accept"] = sts["accept"] + accept.astype(jnp.int32)
            new_stats["proposal"] = sts["proposal"] + active.astype(jnp.int32)
            if self.adapt_step:
                adapted = self._adapt(new_stats, log_accept, adapt)
                new_stats["log_step"] = jnp.where(active, adapted["log_step"], new_stats["log_step"])
            return (new_values, new_stats, logp_new), None

        keys = jax.random.split(key, n)
        init_values = {name: state[name] for name in carried}
        (values, out_stats, _), _ = lax.scan(body, (init_values, stats, logp0), (jnp.arange(n), keys))
        new_state = dict(state)
        new_state.update(values)
        return new_state, out_stats


class ManifoldMALA(MetropolisHastings):
    """Simplified manifold MALA (Girolami & Calderhead 2011), reference
    metropolis_hastings.py:292-373.

    Proposal: N(theta + 1/2 s^2 H^{-1} g, s^2 H^{-1}) with H the model's negative
    Hessian at theta; forward and reverse proposals each require a gradient+Hessian
    evaluation and a Cholesky factorization (dense, batched on the MXU under vmap).
    """

    default_target_accept = 0.574  # MALA-optimal acceptance

    def proposal(self, key, state: dict, param_index=None, step=None):
        step = self._current_step if step is None else step
        mu_cr, chol_cr = self._proposal_params(state, step)
        proposed = gmrf.sample_normal(key, mu_cr, L=chol_cr).reshape(state[self.param].shape)
        if self.active_count is not None:
            # padded reversible-jump convention: freeze entries beyond the count
            # (their Hessian rows are identity and their gradient is zero, so the
            # forward/reverse proposal terms on them cancel in the accept ratio)
            from openmcmc_tpu.padding import active_mask

            mask = active_mask(state[self.active_count], proposed.shape[0], proposed.dtype)[:, None]
            proposed = mask * proposed + (1.0 - mask) * state[self.param]
        updates = {self.param: proposed}

        prop_state = dict(state)
        prop_state.update(updates)
        logp_pr_g_cr = self._log_proposal_density(proposed, mu_cr, chol_cr)

        mu_pr, chol_pr = self._proposal_params(prop_state, step)
        logp_cr_g_pr = self._log_proposal_density(state[self.param], mu_pr, chol_pr)
        return updates, logp_pr_g_cr, logp_cr_g_pr

    @property
    def _current_step(self):
        return self.step_size

    def _proposal_params(self, state: dict, step_size=None):
        if step_size is None:
            step_size = self.step_size
        grad, hessian = self.model.grad_log_p(state, param=self.param, hessian_required=True)
        step2 = (step_size.reshape(()) ** 2) if step_size.size == 1 else (step_size**2)
        precision = st.Dense(hessian / step2)
        chol = st.cholesky(precision)
        drift = st.cho_solve(chol, grad.reshape(-1, 1)).reshape(state[self.param].shape)
        mu = state[self.param] + 0.5 * drift
        return mu, chol

    def _log_proposal_density(self, value, mu, chol) -> jnp.ndarray:
        w = st.chol_matvec_t(chol, (value - mu).reshape(-1, 1))
        return jnp.sum(jnp.log(st.diag(chol))) - 0.5 * jnp.sum(w * w)
