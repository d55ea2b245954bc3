"""Diagnostics tests: ESS on iid and AR(1) draws, split-R-hat on mixed/unmixed chains."""

import jax
import jax.numpy as jnp
import numpy as np

from openmcmc_tpu.diagnostics import effective_sample_size, ess_per_param, rhat_per_param, split_rhat, summary


def test_ess_iid_close_to_n(rng):
    draws = jnp.asarray(rng.normal(size=(4, 2000)))
    ess = float(effective_sample_size(draws))
    assert 5000 < ess  # iid: ESS ~ m*n (estimator noise allows wide band)


def test_ess_ar1_matches_theory(rng):
    rho = 0.9
    m, n = 8, 4000
    eps = rng.normal(size=(m, n))
    x = np.zeros((m, n))
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * eps[:, t]
    ess = float(effective_sample_size(jnp.asarray(x)))
    want = m * n * (1 - rho) / (1 + rho)  # tau = (1+rho)/(1-rho)
    assert 0.5 * want < ess < 2.0 * want, (ess, want)


def test_rhat_mixed_chains_near_one(rng):
    draws = jnp.asarray(rng.normal(size=(4, 1000)))
    r = float(split_rhat(draws))
    assert 0.99 < r < 1.02


def test_rhat_detects_unmixed_chains(rng):
    draws = np.asarray(rng.normal(size=(4, 500)))
    draws[0] += 10.0  # one chain stuck elsewhere
    r = float(split_rhat(jnp.asarray(draws)))
    assert r > 2.0


def test_per_param_shapes(rng):
    draws = jnp.asarray(rng.normal(size=(4, 300, 5, 2)))
    assert ess_per_param(draws).shape == (5, 2)
    assert rhat_per_param(draws).shape == (5, 2)
    s = summary(draws)
    assert s["mean"].shape == (5, 2) and s["ess"].shape == (5, 2)
    assert np.all(np.asarray(s["q05"]) <= np.asarray(s["q95"]))


def test_check_result_finds_nans(rng):
    from openmcmc_tpu.mcmc import MCMCResult
    from openmcmc_tpu.utils import check_result

    store = {"x": jnp.asarray(rng.normal(size=(3, 10, 2, 1)))}
    store["x"] = store["x"].at[1, 4, 0, 0].set(jnp.nan)
    res = MCMCResult(store=store, log_post=jnp.zeros((3, 10)), stats={}, final_state={}, final_key=jnp.zeros((3, 2)))
    rep = check_result(res)
    assert rep == {"x": {"bad_chains": [1], "first_bad_iter": {1: 4}}}
    clean = MCMCResult(store={"x": jnp.zeros((2, 5, 1, 1))}, log_post=jnp.zeros((2, 5)), stats={}, final_state={}, final_key=jnp.zeros((2, 2)))
    assert check_result(clean) == {}
