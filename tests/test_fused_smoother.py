"""Fused GMRF smoother engine tests (TPU-only: the engine is a pure Pallas kernel)."""

import jax
import numpy as np
import pytest

ON_TPU = jax.default_backend() == "tpu"
pytestmark = [pytest.mark.tpu, pytest.mark.skipif(not ON_TPU, reason="fused engine requires TPU hardware")]


def test_fused_smoother_matches_generic_driver(rng):
    """Posterior moments of the one-launch engine match the generic driver
    (validated at 8192 chains during development; smaller here for test budget)."""
    import jax.numpy as jnp

    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.fused import run_fused_smoother
    from openmcmc_tpu.linalg import gmrf
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import ScaledMatrix
    from openmcmc_tpu.samplers import NormalGamma, NormalNormal

    s = np.linspace(0.0, 60.0, 100)
    y = np.sin(s / 20.0) + 2.0 + rng.normal(0.0, 1.0, 100)
    out = run_fused_smoother(3, y, s, n_burn=200, n_iter=400, n_chains=2048)

    P_lambda = gmrf.precision_irregular(jnp.asarray(s, jnp.float32))
    P_lambda = st.Banded(P_lambda.bands.at[0, 0].add(0.001))
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("lambda", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    state = {
        "y": y, "b": y.copy(), "mu": np.zeros(100), "lambda": 100.0, "P_lambda": P_lambda,
        "a_lam": 10.0, "b_lam": 1.0, "tau": 1.0, "P_tau": st.Diagonal(jnp.ones(100)),
        "a_tau": 1.0, "b_tau": 1.0,
    }
    samplers = [NormalNormal("b", mdl), NormalGamma("lambda", mdl), NormalGamma("tau", mdl)]
    res = MCMC(state, samplers, mdl, n_burn=200, n_iter=400, n_chains=2048, seed=5).run()

    fb = np.asarray(out["b"])
    gb = np.asarray(res.store["b"])[..., 0]
    se = gb.std((0, 1)).mean() / np.sqrt(2048)
    assert np.abs(fb.mean((0, 1)) - gb.mean((0, 1))).max() < 5 * se
    np.testing.assert_allclose(fb.std((0, 1)), gb.std((0, 1)), rtol=0.05)
    np.testing.assert_allclose(float(out["tau"].mean()), float(np.asarray(res.store["tau"]).mean()), rtol=0.02)
    np.testing.assert_allclose(float(out["lam"].mean()), float(np.asarray(res.store["lambda"]).mean()), rtol=0.03)
    np.testing.assert_allclose(float(out["log_post"].mean()), float(np.asarray(res.log_post).mean()), rtol=0.01)


def test_truncated_fused_smoother_matches_generic_on_chip(rng):
    """Real-PRNG statistical parity of the truncated Thomas engine: the
    in-kernel chromatic red-black truncated Gibbs sweep must match the generic
    driver's truncated sweep posterior on the actively-truncated box (round-5
    engine; the host-bits CPU version of this test lives in
    test_fused_engines_cpu_stats.py)."""
    import jax.numpy as jnp

    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.linalg import gmrf
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import ScaledMatrix
    from openmcmc_tpu.samplers import NormalGamma, NormalNormal

    n_time = 40
    s = np.linspace(0.0, 10.0, n_time)
    y = np.abs(np.sin(s)) + rng.normal(0.0, 0.4, n_time)
    lo, hi = 0.0, 1.1
    P = gmrf.precision_irregular(jnp.asarray(s, jnp.float32))
    P = st.Banded(P.bands.at[0, 0].add(0.001))

    def build(n_chains, seed):
        mdl = Model(
            [
                Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
                Normal("b", mean="mu", precision=ScaledMatrix("P0", "lam"),
                       domain_response_lower=lo, domain_response_upper=hi),
                Gamma("lam", shape="a_lam", rate="b_lam"),
                Gamma("tau", shape="a_tau", rate="b_tau"),
            ]
        )
        state = {
            "y": y, "b": np.clip(y, lo + 1e-3, hi - 1e-3), "mu": np.zeros(n_time),
            "P0": P, "P_tau": st.Diagonal(jnp.ones(n_time)),
            "lam": 1.0, "tau": 1.0, "a_lam": 2.0, "b_lam": 1.0, "a_tau": 2.0, "b_tau": 1.0,
        }
        m = MCMC(state, [NormalNormal("b", mdl), NormalGamma("lam", mdl), NormalGamma("tau", mdl)],
                 mdl, n_burn=300, n_iter=400, n_chains=n_chains, seed=seed)
        m.model.response = None
        return m

    m_f = build(2048, 3)
    res_f = m_f.run(engine="fused")
    assert res_f.engine == "fused_gmrf_smoother_truncated"
    m_g = build(256, 5)
    res_g = m_g.run(engine="generic")

    b_f = np.asarray(res_f.store["b"]).reshape(-1, n_time)
    b_g = np.asarray(res_g.store["b"]).reshape(-1, n_time)
    assert b_f.min() >= lo - 1e-6 and b_f.max() <= hi + 1e-6
    # truncation is active on this config (measured ~0.7% of generic draws
    # within 0.05 of the lower bound)
    assert (b_g < 0.05).mean() > 0.003
    sd = b_g.std(0)
    assert np.all(np.abs(b_f.mean(0) - b_g.mean(0)) < 0.15 * sd)
    assert np.all(np.abs(b_f.std(0) / sd - 1.0) < 0.15)
    for name in ("lam", "tau"):
        fv = np.asarray(res_f.store[name]).reshape(-1)
        gv = np.asarray(res_g.store[name]).reshape(-1)
        assert abs(fv.mean() - gv.mean()) < 0.15 * gv.std(), name
