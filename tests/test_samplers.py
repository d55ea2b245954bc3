"""Sampler algebra tests, mirroring reference tests/test_sampler.py.

The reference's deterministic-RNG pattern (monkeypatching scipy rvs to return
zeros/means, reference test_sampler.py:211-341) translates to: drive the conjugate
algebra with many vmapped draws and check the posterior moments against closed forms,
plus exact zero-noise checks where the conditional is degenerate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from openmcmc_tpu.distributions import Categorical, Gamma, Normal
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import (
    LinearCombination,
    MixtureParameterMatrix,
    MixtureParameterVector,
    ScaledMatrix,
)
from openmcmc_tpu.samplers import MixtureAllocation, NormalGamma, NormalNormal


def _mean_of_draws(sampler, state, n=6000, seed=0):
    def one(k):
        return sampler.sample(k, state)[sampler.param]

    draws = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(seed), n))
    return np.asarray(draws).mean(0), draws


def test_normal_normal_posterior_mean_gls(rng):
    """NormalNormal recovers the GLS solution as prior precision -> 0
    (reference test_sampler.py:262-308)."""
    n, d = 30, 2
    X = rng.normal(size=(n, d))
    beta_true = np.array([[1.0], [-2.0]])
    y = X @ beta_true + rng.normal(size=(n, 1)) * 0.1
    state = {
        "y": jnp.asarray(y),
        "X": jnp.asarray(X),
        "beta": jnp.zeros((d, 1)),
        "W": st.Diagonal(jnp.ones(n) * 100.0),
        "mu0": jnp.zeros((d, 1)),
        "P0": st.Diagonal(jnp.ones(d) * 1e-8),
    }
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("W", "one")),
            Normal("beta", mean="mu0", precision=ScaledMatrix("P0", "one")),
        ]
    )
    state["one"] = jnp.asarray([[1.0]])
    sampler = NormalNormal("beta", mdl)
    mean, _ = _mean_of_draws(sampler, state, n=4000)
    gls = np.linalg.solve(X.T @ X, X.T @ y)
    np.testing.assert_allclose(mean, gls, atol=0.02)


def test_normal_normal_prior_recovery():
    """With an (effectively) zero-precision likelihood the conditional is the prior."""
    d = 3
    state = {
        "y": jnp.zeros((5, 1)),
        "A": jnp.zeros((5, d)),
        "theta": jnp.zeros((d, 1)),
        "W": st.Diagonal(jnp.ones(5)),
        "m0": jnp.asarray([[1.0], [2.0], [3.0]]),
        "P0": st.Diagonal(jnp.ones(d) * 4.0),
        "one": jnp.asarray([[1.0]]),
    }
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"theta": "A"}), precision=ScaledMatrix("W", "one")),
            Normal("theta", mean="m0", precision=ScaledMatrix("P0", "one")),
        ]
    )
    sampler = NormalNormal("theta", mdl)
    mean, draws = _mean_of_draws(sampler, state, n=8000)
    np.testing.assert_allclose(mean, np.asarray(state["m0"]), atol=0.03)
    np.testing.assert_allclose(np.asarray(draws).std(0), 0.5 * np.ones((d, 1)), atol=0.03)


def test_normal_normal_banded_prior_stays_banded(rng):
    """GMRF smoother structure: banded prior + diagonal likelihood precision ->
    conditional Q is banded (the core of the TPU performance story)."""
    from openmcmc_tpu.linalg import gmrf as gm

    n_time = 20
    P = gm.precision_irregular(jnp.arange(n_time, dtype=jnp.float32))
    P = st.Banded(P.bands.at[0, 0].add(0.01))
    y = rng.normal(size=(n_time, 1))
    state = {
        "y": jnp.asarray(y),
        "b": jnp.zeros((n_time, 1)),
        "mu": jnp.zeros((n_time, 1)),
        "lam": jnp.asarray([[10.0]]),
        "P_lam": P,
        "tau": jnp.asarray([[1.0]]),
        "P_tau": st.Diagonal(jnp.ones(n_time)),
    }
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lam", "lam")),
        ]
    )
    sampler = NormalNormal("b", mdl)
    mean, draws = _mean_of_draws(sampler, state, n=6000)
    Q = 10.0 * np.asarray(st.to_dense(P)) + np.eye(n_time)
    want = np.linalg.solve(Q, y)
    np.testing.assert_allclose(mean, want, atol=0.05)


def test_normal_normal_truncated_prior(rng):
    """Truncated prior -> draws respect the domain (reference sampler.py:196-206)."""
    d = 2
    state = {
        "theta": jnp.asarray([[0.5], [0.5]]),
        "m0": jnp.zeros((d, 1)),
        "P0": st.Diagonal(jnp.ones(d)),
        "one": jnp.asarray([[1.0]]),
    }
    mdl = Model(
        [
            Normal(
                "theta",
                mean="m0",
                precision=ScaledMatrix("P0", "one"),
                domain_response_lower=0.0,
                domain_response_upper=1.0,
            )
        ]
    )
    sampler = NormalNormal("theta", mdl)
    _, draws = _mean_of_draws(sampler, state, n=500)
    assert float(jnp.min(draws)) >= 0.0 and float(jnp.max(draws)) <= 1.0


def test_normal_gamma_scalar(rng):
    """Posterior Gamma(a0 + n/2, b0 + ||r||^2/2) exactly (reference test_sampler.py:311-341)."""
    n = 40
    resid = rng.normal(size=(n, 1))
    state = {
        "y": jnp.asarray(resid),  # mean 0 -> residual = y
        "mu": jnp.zeros((n, 1)),
        "tau": jnp.asarray([[1.0]]),
        "P": st.Diagonal(jnp.ones(n)),
        "a0": jnp.asarray([[2.0]]),
        "b0": jnp.asarray([[1.0]]),
    }
    mdl = Model(
        [
            Normal("y", mean="mu", precision=ScaledMatrix("P", "tau")),
            Gamma("tau", shape="a0", rate="b0"),
        ]
    )
    sampler = NormalGamma("tau", mdl)
    mean, draws = _mean_of_draws(sampler, state, n=20000)
    a_star = 2.0 + n / 2
    b_star = 1.0 + float((resid**2).sum()) / 2
    np.testing.assert_allclose(mean, a_star / b_star, rtol=0.02)
    np.testing.assert_allclose(np.asarray(draws).var(), a_star / b_star**2, rtol=0.05)


def test_normal_gamma_mixture_components(rng):
    """Per-component posterior via segment sums (reference sampler.py:281-287)."""
    n, m = 30, 3
    alloc = np.asarray(rng.integers(0, m, size=(n, 1)), dtype=np.int32)
    y = rng.normal(size=(n, 1))
    state = {
        "y": jnp.asarray(y),
        "means": jnp.zeros((m, 1)),
        "lams": jnp.ones((m, 1)),
        "Z": jnp.asarray(alloc),
        "a0": jnp.full((m, 1), 2.0),
        "b0": jnp.full((m, 1), 1.0),
    }
    mdl = Model(
        [
            Normal(
                "y",
                mean=MixtureParameterVector(param="means", allocation="Z"),
                precision=MixtureParameterMatrix(param="lams", allocation="Z"),
            ),
            Gamma("lams", shape="a0", rate="b0"),
        ]
    )
    sampler = NormalGamma("lams", mdl)
    mean, _ = _mean_of_draws(sampler, state, n=20000)
    for k in range(m):
        mask = alloc[:, 0] == k
        a_star = 2.0 + mask.sum() / 2
        b_star = 1.0 + float((y[mask] ** 2).sum()) / 2
        np.testing.assert_allclose(mean[k, 0], a_star / b_star, rtol=0.03)


def test_mixture_allocation(rng):
    """Allocation probabilities proportional to prior x Normal likelihood
    (reference test_sampler.py / sampler.py:321-355)."""
    n, m = 4, 2
    y = np.array([[-2.0], [-1.9], [2.0], [2.1]])
    state = {
        "y": jnp.asarray(y),
        "means": jnp.asarray([[-2.0], [2.0]]),
        "lams": jnp.asarray([[4.0], [4.0]]),
        "Z": jnp.zeros((n, 1), dtype=jnp.int32),
        "prior": jnp.full((n, m), 0.5),
    }
    mdl = Model(
        [
            Normal(
                "y",
                mean=MixtureParameterVector(param="means", allocation="Z"),
                precision=MixtureParameterMatrix(param="lams", allocation="Z"),
            ),
            Categorical("Z", prob="prior"),
        ]
    )
    sampler = MixtureAllocation("Z", mdl, response_param="y")

    def one(k):
        return sampler.sample(k, state)["Z"]

    draws = np.asarray(jax.vmap(one)(jax.random.split(jax.random.PRNGKey(0), 4000)))
    frac1 = (draws[:, :, 0] == 1).mean(0)
    # exact conditional allocation probabilities
    like0 = sps.norm.pdf(y[:, 0], loc=-2.0, scale=0.5)
    like1 = sps.norm.pdf(y[:, 0], loc=2.0, scale=0.5)
    want = like1 / (like0 + like1)
    np.testing.assert_allclose(frac1, want, atol=0.03)


def test_sampler_only_mutates_its_param(rng):
    """Sampled-param-only mutation (reference test_sampler.py:181-198)."""
    n = 10
    state = {
        "y": jnp.asarray(rng.normal(size=(n, 1))),
        "mu": jnp.zeros((n, 1)),
        "tau": jnp.asarray([[1.0]]),
        "P": st.Diagonal(jnp.ones(n)),
        "a0": jnp.asarray([[2.0]]),
        "b0": jnp.asarray([[1.0]]),
    }
    mdl = Model(
        [
            Normal("y", mean="mu", precision=ScaledMatrix("P", "tau")),
            Gamma("tau", shape="a0", rate="b0"),
        ]
    )
    sampler = NormalGamma("tau", mdl)
    new_state = sampler.sample(jax.random.PRNGKey(0), state)
    for name in state:
        if name == "tau":
            assert not np.allclose(np.asarray(new_state[name]), np.asarray(state[name]))
        elif isinstance(state[name], st.Diagonal):
            np.testing.assert_array_equal(np.asarray(new_state[name].diag_), np.asarray(state[name].diag_))
        else:
            np.testing.assert_array_equal(np.asarray(new_state[name]), np.asarray(state[name]))


def test_conditional_model_restriction():
    """Sampler model restricted to distributions depending on param (reference sampler.py:53-55)."""
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lam", "lam")),
            Gamma("lam", shape="al", rate="bl"),
            Gamma("tau", shape="at", rate="bt"),
        ]
    )
    s = NormalNormal("b", mdl)
    assert set(s.model.keys()) == {"y", "b"}
    g = NormalGamma("tau", mdl)
    assert set(g.model.keys()) == {"y", "tau"}
    assert g.normal_param == "y"
