"""Fused linreg engine vs generic driver (TPU-only: statistical parity at scale).

Kernel-logic coverage on CPU lives in test_pallas_interpret.py."""

import jax
import numpy as np
import pytest

ON_TPU = jax.default_backend() == "tpu"
pytestmark = [pytest.mark.tpu, pytest.mark.skipif(not ON_TPU, reason="fused engine statistics require TPU hardware")]


def test_fused_linreg_matches_generic_driver(rng):
    import jax.numpy as jnp

    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.fused import run_fused_linreg
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import LinearCombination, ScaledMatrix
    from openmcmc_tpu.samplers import NormalGamma, NormalNormal

    N = 100
    x = np.sort(rng.random(N))
    X = np.stack([np.ones(N), x], 1)
    y = X @ np.array([2.0, 0.5]) + rng.normal(0, 0.1, N)

    out = run_fused_linreg(3, X, y, n_burn=1000, n_iter=1000, n_chains=2048)

    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P_tau", "tau")),
            Normal("beta", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("tau", shape="a_tau", rate="b_tau"),
            Gamma("lambda", shape="a_lambda", rate="b_lambda"),
        ]
    )
    state = {
        "y": y, "X": X, "beta": [0.0, 0.0], "P_tau": st.Diagonal(jnp.ones(N)), "tau": 1.0,
        "P_lambda": st.Diagonal(jnp.ones(2)), "mu": [0.0, 0.0], "lambda": 0.01,
        "a_tau": 1e-3, "b_tau": 1e-3, "a_lambda": 1e-3, "b_lambda": 1e-3,
    }
    samplers = [NormalNormal("beta", mdl), NormalGamma("tau", mdl), NormalGamma("lambda", mdl)]
    res = MCMC(state, samplers, mdl, n_burn=1000, n_iter=1000, n_chains=2048, seed=5).run()

    fb = np.asarray(out["beta"])  # (chains, iters, p)
    gb = np.asarray(res.store["beta"])[..., 0]
    se = gb.std((0, 1)) / np.sqrt(2048)
    assert np.abs(fb.mean((0, 1)) - gb.mean((0, 1))).max() < 5 * se.max()
    np.testing.assert_allclose(fb.std((0, 1)), gb.std((0, 1)), rtol=0.05)
    np.testing.assert_allclose(float(out["tau"].mean()), float(np.asarray(res.store["tau"]).mean()), rtol=0.02)
    np.testing.assert_allclose(float(out["lam"].mean()), float(np.asarray(res.store["lambda"]).mean()), rtol=0.03)
    np.testing.assert_allclose(float(out["log_post"].mean()), float(np.asarray(res.log_post).mean()), rtol=0.01)
