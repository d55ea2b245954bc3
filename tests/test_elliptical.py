"""Elliptical slice sampler: exact posterior recovery on conjugate targets
(closed-form comparison), prior recovery under a Null likelihood, banded
(GMRF) prior support, and tuning-free behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmcmc_tpu.distributions import Normal, NullDistribution
from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import LinearCombination, ScaledMatrix
from openmcmc_tpu.samplers import EllipticalSlice


def test_posterior_recovery_regression(rng):
    """Gaussian likelihood x Gaussian prior: the conditional is available in
    closed form, and ESS must reproduce it without any tuning."""
    N, d = 60, 4
    X = rng.normal(size=(N, d)) @ (np.eye(d) + 0.5 * np.ones((d, d)))
    y = X @ rng.normal(size=(d, 1)) + 0.5 * rng.normal(size=(N, 1))
    tau = 4.0
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P", "tau")),
            Normal("beta", mean="mu0", precision="P0"),
        ]
    )
    state = {
        "y": y, "X": X, "beta": np.zeros((d, 1)), "P": st.Diagonal(jnp.ones(N)), "tau": tau,
        "P0": np.eye(d) * 0.01, "mu0": np.zeros((d, 1)),
    }
    Q = tau * X.T @ X + 0.01 * np.eye(d)
    want_mean = np.linalg.solve(Q, tau * X.T @ y).ravel()
    want_sd = np.sqrt(np.diag(np.linalg.inv(Q)))

    mcmc = MCMC(state, [EllipticalSlice("beta", mdl)], mdl,
                n_burn=300, n_iter=700, n_chains=64, seed=0)
    res = mcmc.run()
    draws = np.asarray(res.store["beta"]).reshape(64, 700, d)
    got_mean, got_sd = draws.mean((0, 1)), draws.std((0, 1))
    mc_err = want_sd / np.sqrt(draws.shape[0] * draws.shape[1] / 20)
    assert np.all(np.abs(got_mean - want_mean) < 6 * mc_err), (got_mean, want_mean)
    assert np.all(np.abs(got_sd / want_sd - 1.0) < 0.15), (got_sd, want_sd)


def test_prior_recovery_null_likelihood(rng):
    """With a Null likelihood every slice accepts immediately and the sampler
    must reproduce the prior exactly -- including a banded GMRF prior through
    the structured kernels."""
    p = 30
    s = np.linspace(0.0, 10.0, p)
    P = gmrf.precision_irregular(jnp.asarray(s))
    P = st.Banded(P.bands.at[0].add(0.5))  # proper banded precision
    mdl = Model(
        [
            NullDistribution("y", mean="b", precision="P_fix"),
            Normal("b", mean="m0", precision="P0"),
        ]
    )
    state = {
        "y": np.zeros((p, 1)), "b": np.zeros((p, 1)), "P_fix": st.Diagonal(jnp.ones(p)),
        "m0": np.full((p, 1), 1.5), "P0": P,
    }
    mcmc = MCMC(state, [EllipticalSlice("b", mdl)], mdl,
                n_burn=100, n_iter=500, n_chains=32, seed=1)
    res = mcmc.run()
    draws = np.asarray(res.store["b"]).reshape(32, 500, p)
    cov_want = np.linalg.inv(np.asarray(st.to_dense(P)))
    sd_want = np.sqrt(np.diag(cov_want))
    got_mean, got_sd = draws.mean((0, 1)), draws.std((0, 1))
    n_eff = 32 * 500 / 4
    assert np.max(np.abs(got_mean - 1.5) / (sd_want / np.sqrt(n_eff))) < 6
    assert np.max(np.abs(got_sd / sd_want - 1.0)) < 0.12, got_sd / sd_want


def test_shrinkage_cap_counter_surfaced(rng):
    """Hard target stress: a likelihood ~30x more concentrated than the prior
    forces long shrinkage loops. The cap-hit counter must be visible in
    MCMCResult.stats and the hit RATE must stay below 1e-4 at the default cap
    (expected rounds stay ~log2 of the prior/posterior scale ratio, far under
    32; a hit is the sampler's only silent no-move bias mode)."""
    N, d = 200, 3
    X = rng.normal(size=(N, d))
    y = X @ np.ones((d, 1)) + 0.05 * rng.normal(size=(N, 1))
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P", "tau")),
            Normal("beta", mean="mu0", precision="P0"),
        ]
    )
    state = {
        "y": y, "X": X, "beta": np.zeros((d, 1)), "P": st.Diagonal(jnp.ones(N)),
        "tau": 400.0,  # likelihood scale ~0.003 vs prior scale ~10: brutal slice geometry
        "P0": np.eye(d) * 0.01, "mu0": np.zeros((d, 1)),
    }
    n_chains, n_iter, n_burn = 64, 400, 100
    mcmc = MCMC(state, [EllipticalSlice("beta", mdl)], mdl,
                n_burn=n_burn, n_iter=n_iter, n_chains=n_chains, seed=2)
    res = mcmc.run()
    assert "cap_hits" in res.stats["beta"] and "iterations" in res.stats["beta"]
    iters = np.asarray(res.stats["beta"]["iterations"])
    np.testing.assert_array_equal(iters, n_burn + n_iter)
    hit_rate = float(np.asarray(res.stats["beta"]["cap_hits"]).sum()) / float(iters.sum())
    assert hit_rate < 1e-4, hit_rate


def test_requires_untruncated_normal_prior():
    mdl = Model(
        [
            Normal("y", mean="b", precision="P_fix"),
            Normal("b", mean="m0", precision="P0",
                   domain_response_lower=0.0),
        ]
    )
    with pytest.raises(TypeError):
        EllipticalSlice("b", mdl)


def test_composed_gibbs_matches_conjugate(rng):
    """EllipticalSlice for the latent field inside a full Gibbs sweep (with a
    NormalGamma noise-precision update) must match the all-conjugate sweep's
    posterior: the prior precision is lam-scaled and re-read from the state
    every iteration."""
    from openmcmc_tpu.distributions import Gamma
    from openmcmc_tpu.samplers import NormalGamma, NormalNormal

    p = 24
    s = np.linspace(0.0, 12.0, p)
    P_lam = gmrf.precision_irregular(jnp.asarray(s))
    P_lam = st.Banded(P_lam.bands.at[0, 0].add(0.01))
    b_true = np.sin(s / 2.0)
    y = (b_true + rng.normal(0.0, 0.5, p)).reshape(p, 1)

    def build(latent_sampler_cls):
        mdl = Model(
            [
                Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
                Normal("b", mean="m0", precision=ScaledMatrix("P_lam", "lam")),
                Gamma("tau", shape="a_t", rate="b_t"),
            ]
        )
        state = {
            "y": y, "b": np.zeros((p, 1)), "m0": np.zeros((p, 1)),
            "P_tau": st.Diagonal(jnp.ones(p)), "tau": 1.0,
            "P_lam": P_lam, "lam": 4.0, "a_t": 2.0, "b_t": 0.5,
        }
        samplers = [latent_sampler_cls("b", mdl), NormalGamma("tau", mdl)]
        return MCMC(state, samplers, mdl, n_burn=600, n_iter=1200, n_chains=64, seed=5)

    res_es = build(EllipticalSlice).run()
    res_nn = build(NormalNormal).run()
    b_es = np.asarray(res_es.store["b"]).reshape(64, 1200, p)
    b_nn = np.asarray(res_nn.store["b"]).reshape(64, 1200, p)
    sd = b_nn.std((0, 1))
    assert np.max(np.abs(b_es.mean((0, 1)) - b_nn.mean((0, 1))) / sd) < 0.12
    assert np.max(np.abs(b_es.std((0, 1)) / sd - 1.0)) < 0.15
    tau_es = float(np.asarray(res_es.store["tau"]).mean())
    tau_nn = float(np.asarray(res_nn.store["tau"]).mean())
    assert abs(tau_es - tau_nn) / tau_nn < 0.05, (tau_es, tau_nn)
