"""HMC sampler tests: posterior recovery on scalar and correlated multivariate
Gaussian targets (exact comparisons), energy conservation at small step sizes,
step adaptation toward the 0.651 target, and padded-mask freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmcmc_tpu.distributions import Normal
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import LinearCombination, ScaledMatrix
from openmcmc_tpu.samplers import HMC, acceptance_rate


@pytest.fixture
def normal_target(rng):
    N = 40
    y = rng.normal(1.0, 1.0, N).reshape(1, N)
    mdl = Model(
        [
            Normal("y", mean="mu", precision="tau"),
            Normal("mu", mean="m0", precision="p0"),
        ]
    )
    state = {"y": y, "tau": np.eye(1), "m0": 0.0, "p0": np.eye(1) * 0.5}
    post_prec = N * 1.0 + 0.5
    post_mean = y.sum() / post_prec
    return mdl, state, post_mean, 1.0 / np.sqrt(post_prec)


def test_posterior_recovery_scalar(normal_target):
    mdl, state, post_mean, post_sd = normal_target
    mcmc = MCMC(state, [HMC("mu", mdl, step=0.1, n_leapfrog=8)], mdl,
                n_burn=200, n_iter=400, n_chains=64, seed=0)
    res = mcmc.run()
    draws = np.asarray(res.store["mu"]).reshape(-1)
    # HMC decorrelates almost completely: treat draws as near-iid for MC error
    assert abs(draws.mean() - post_mean) < 6 * post_sd / np.sqrt(draws.size / 4)
    assert abs(draws.std() / post_sd - 1.0) < 0.1
    acc = float(np.asarray(acceptance_rate(res.stats["mu"])).mean())
    assert acc > 60.0, acc


def test_posterior_recovery_correlated_regression(rng):
    """Correlated beta posterior (the setting where HMC beats RW/MALA): exact
    Gaussian posterior available in closed form."""
    N, d = 60, 4
    X = rng.normal(size=(N, d)) @ (np.eye(d) + 0.6 * np.ones((d, d)))
    beta_true = rng.normal(size=(d, 1))
    y = X @ beta_true + 0.5 * rng.normal(size=(N, 1))
    tau = 1.0 / 0.25
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
    want_mean = np.linalg.solve(Q, tau * X.T @ y)
    want_sd = np.sqrt(np.diag(np.linalg.inv(Q)))

    mcmc = MCMC(state, [HMC("beta", mdl, step=0.02, n_leapfrog=16, adapt_step=True)], mdl,
                n_burn=400, n_iter=600, n_chains=64, seed=1)
    res = mcmc.run()
    draws = np.asarray(res.store["beta"]).reshape(64, 600, d)
    got_mean = draws.mean((0, 1))
    got_sd = draws.std((0, 1))
    mc_err = want_sd / np.sqrt(draws.shape[0] * draws.shape[1] / 10)
    assert np.all(np.abs(got_mean - want_mean.ravel()) < 6 * mc_err), (got_mean, want_mean.ravel())
    assert np.all(np.abs(got_sd / want_sd - 1.0) < 0.15), (got_sd, want_sd)


def test_energy_conservation_small_step(normal_target):
    """With a tiny leapfrog step the Hamiltonian is nearly conserved, so
    acceptance must be ~100% (the classic HMC implementation check: any error in
    the kinetic-energy bookkeeping or gradient sign destroys this)."""
    mdl, state, *_ = normal_target
    mcmc = MCMC(state, [HMC("mu", mdl, step=0.005, n_leapfrog=4)], mdl,
                n_burn=0, n_iter=200, n_chains=32, seed=2)
    res = mcmc.run()
    acc = float(np.asarray(acceptance_rate(res.stats["mu"])).mean())
    assert acc > 99.0, acc


def test_adaptation_hits_target(normal_target):
    mdl, state, *_ = normal_target
    mcmc = MCMC(state, [HMC("mu", mdl, step=2.0, n_leapfrog=4, adapt_step=True)], mdl,
                n_burn=600, n_iter=400, n_chains=32, seed=3)
    res = mcmc.run()
    # counters include burn-in; restrict to the post-burn window via the totals
    acc = float(np.asarray(acceptance_rate(res.stats["mu"])).mean())
    assert 45.0 < acc < 85.0, acc


def test_active_count_freezes_padding(rng):
    """Padded entries beyond the active count must not move (RJ convention)."""
    p = 6
    mdl = Model([Normal("b", mean="m0", precision="P0")])
    state = {
        "b": np.arange(1.0, p + 1).reshape(p, 1),
        "m0": np.zeros((p, 1)),
        "P0": np.eye(p),
        "k": np.array([[3]], dtype=np.int32),
    }
    sampler = HMC("b", mdl, step=0.3, n_leapfrog=5, active_count="k")
    mcmc = MCMC(state, [sampler], mdl, n_burn=0, n_iter=50, n_chains=4, seed=4)
    res = mcmc.run()
    draws = np.asarray(res.store["b"]).reshape(4, 50, p)
    # active entries move, frozen entries keep their initial values exactly
    assert np.std(draws[..., :3]) > 0.1
    np.testing.assert_array_equal(draws[..., 3:], np.broadcast_to(np.arange(4.0, p + 1), (4, 50, 3)))
