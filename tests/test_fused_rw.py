"""Fused random-walk MH engine vs the generic driver and the analytic posterior
(TPU-only; kernel-logic coverage on CPU lives in test_pallas_interpret.py)."""

import jax
import numpy as np
import pytest

ON_TPU = jax.default_backend() == "tpu"
pytestmark = pytest.mark.skipif(not ON_TPU, reason="fused engine statistics require TPU hardware")


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
