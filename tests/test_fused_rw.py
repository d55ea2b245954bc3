"""Fused random-walk MH engine vs the generic driver and the analytic posterior
(TPU-only; kernel-logic coverage on CPU lives in test_pallas_interpret.py)."""

import jax
import numpy as np
import pytest

ON_TPU = jax.default_backend() == "tpu"
pytestmark = [pytest.mark.tpu, pytest.mark.skipif(not ON_TPU, reason="fused engine statistics require TPU hardware")]


def test_fused_rw_matches_generic_and_analytic():
    import jax.numpy as jnp

    from openmcmc_tpu.distributions import Normal
    from openmcmc_tpu.fused import run_fused_rw
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.samplers import RandomWalk

    y = np.array([150.0, 155.0, 190.0, 160.0, 173.0])
    mu, tau, lam = 160.0, 1.0 / 200.0, 1.0 / 100.0
    out = run_fused_rw(3, y, n_burn=200, n_iter=1000, n_chains=4096,
                       mu=mu, tau=tau, lam=lam, step=5.0, h0=200.0)

    # analytic conjugate posterior
    post_prec = len(y) * tau + lam
    post_mean = (tau * y.sum() + lam * mu) / post_prec
    post_sd = 1.0 / np.sqrt(post_prec)

    h = np.asarray(out["h"])
    se = post_sd / np.sqrt(4096)
    assert abs(h.mean() - post_mean) < 6 * se
    np.testing.assert_allclose(h.std(), post_sd, rtol=0.03)

    # generic driver on the identical model: acceptance and log_post parity
    mdl = Model([
        Normal("y", mean="h", precision="tau"),
        Normal("h", mean="mu", precision="lambda"),
    ])
    state = {"y": y.reshape(1, -1), "h": 200.0, "tau": jnp.eye(1) * tau,
             "mu": mu, "lambda": jnp.eye(1) * lam}
    m = MCMC(state, [RandomWalk("h", mdl, step=5.0)], mdl,
             n_burn=200, n_iter=1000, n_chains=4096, seed=0)
    res = m.run()
    acc_generic = float(jnp.mean(res.acceptance["h"])) / 100.0
    acc_fused = float(out["accept"].mean())
    assert abs(acc_fused - acc_generic) < 0.02
    np.testing.assert_allclose(float(out["log_post"].mean()),
                               float(np.asarray(res.log_post).mean()), rtol=0.005)


def test_fused_rw_adapted_hits_target_acceptance():
    """Robbins-Monro in-kernel adaptation: starting from a far-too-large step, the
    burn-in must tune each chain's log-step so that sampling-phase acceptance lands
    near the target, matching the generic adapted run."""
    import jax.numpy as jnp

    from openmcmc_tpu.distributions import Normal
    from openmcmc_tpu.fused import run_fused_rw
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.samplers import RandomWalk

    y = np.array([150.0, 155.0, 190.0, 160.0, 173.0])
    mu, tau, lam = 160.0, 1.0 / 200.0, 1.0 / 100.0
    out = run_fused_rw(3, y, n_burn=2000, n_iter=1000, n_chains=4096,
                       mu=mu, tau=tau, lam=lam, step=60.0, h0=200.0,
                       adapt_step=True, target_accept=0.44, adapt_rate=0.05)
    # sampling-phase acceptance from the per-iteration accept indicator
    acc = float(np.asarray(out["accept"]).mean())
    assert abs(acc - 0.44) < 0.06, acc
    # adapted step must have shrunk well below the bad initial value
    step_final = float(np.exp(np.asarray(out["log_step"])).mean())
    assert step_final < 25.0, step_final

    # generic adapted run for cross-check (same config)
    mdl = Model([
        Normal("y", mean="h", precision="tau"),
        Normal("h", mean="mu", precision="lambda"),
    ])
    state = {"y": y.reshape(1, -1), "h": 200.0, "tau": jnp.eye(1) * tau,
             "mu": mu, "lambda": jnp.eye(1) * lam}
    m = MCMC(state, [RandomWalk("h", mdl, step=60.0, adapt_step=True, target_accept=0.44)],
             mdl, n_burn=2000, n_iter=1000, n_chains=2048, seed=1)
    res = m.run(engine="auto")
    assert res.engine == "fused_random_walk"
    assert "log_step" in res.stats["h"]
    m2 = MCMC(dict(state), [RandomWalk("h", mdl, step=60.0, adapt_step=True, target_accept=0.44)],
              mdl, n_burn=2000, n_iter=1000, n_chains=2048, seed=2)
    res2 = m2.run(engine="generic")
    step_g = float(np.exp(np.asarray(res2.stats["h"]["log_step"])).mean())
    step_f = float(np.exp(np.asarray(res.stats["h"]["log_step"])).mean())
    assert abs(np.log(step_f) - np.log(step_g)) < 0.25, (step_f, step_g)
    h_f = np.asarray(res.store["h"]).reshape(-1)
    h_g = np.asarray(res2.store["h"]).reshape(-1)
    assert abs(h_f.mean() - h_g.mean()) < 0.5


def test_fused_rw_truncated_matches_generic_posterior():
    """Truncated-proposal fused RW vs the generic driver on the same bounded-proposal
    model: posterior moments within MC error, acceptance rates matching."""
    import jax.numpy as jnp

    from openmcmc_tpu.distributions import Normal
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.samplers import RandomWalk

    y = np.array([150.0, 155.0, 190.0, 160.0, 173.0])
    mu, tau, lam = 160.0, 1.0 / 200.0, 1.0 / 100.0
    mdl = Model([
        Normal("y", mean="h", precision="tau"),
        Normal("h", mean="mu", precision="lambda"),
    ])
    state = {"y": y.reshape(1, -1), "h": 175.0, "tau": jnp.eye(1) * tau,
             "mu": mu, "lambda": jnp.eye(1) * lam}

    def make(seed):
        return MCMC(dict(state),
                    [RandomWalk("h", mdl, step=8.0, domain_limits=[[120.0, 185.0]])],
                    mdl, n_burn=500, n_iter=1000, n_chains=4096, seed=seed)

    m_f = make(0)
    res_f = m_f.run(engine="auto")
    assert res_f.engine == "fused_random_walk"
    m_g = make(1)
    res_g = m_g.run(engine="generic")

    h_f = np.asarray(res_f.store["h"]).reshape(-1)
    h_g = np.asarray(res_g.store["h"]).reshape(-1)
    # proposals are bounded but the target is NOT truncated; with the box well
    # inside the bulk the posteriors coincide
    se = h_g.std() / np.sqrt(4096)
    assert abs(h_f.mean() - h_g.mean()) < 8 * se, (h_f.mean(), h_g.mean())
    np.testing.assert_allclose(h_f.std(), h_g.std(), rtol=0.05)
    acc_f = float(np.asarray(res_f.acceptance["h"]).mean())
    acc_g = float(np.asarray(res_g.acceptance["h"]).mean())
    assert abs(acc_f - acc_g) < 3.0, (acc_f, acc_g)
