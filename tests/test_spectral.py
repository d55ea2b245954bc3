"""Spectral fused engines (eigenbasis linreg/mMALA, p up to 256).

The host-side eigenbasis math is checked exactly against dense linear algebra;
the kernels run end-to-end in interpret mode (deterministic stubbed PRNG) and are
statistically validated on real TPU in tests/test_fused_linreg.py-style runs.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from openmcmc_tpu.fused import spectral


@pytest.fixture
def interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_eigenbasis_identities(rng):
    n, p = 60, 24
    X = rng.normal(size=(n, p))
    plam = rng.uniform(0.5, 2.0, p)
    ptau = rng.uniform(0.5, 2.0, n)
    G = (X.T * ptau) @ X
    V, s = spectral._eigenbasis(G, plam)
    np.testing.assert_allclose(V.T @ np.diag(plam) @ V, np.eye(p), atol=1e-8)
    np.testing.assert_allclose(V.T @ G @ V, np.diag(s), atol=1e-6)
    # the pencil reconstructs both matrices: Q = lam plam + tau G = V^-T (lam I + tau S) V^-1
    lam, tau = 0.7, 2.3
    Vinv = V.T @ np.diag(plam)
    Q = Vinv.T @ np.diag(lam + tau * s) @ Vinv
    np.testing.assert_allclose(Q, lam * np.diag(plam) + tau * G, rtol=1e-8, atol=1e-8)


def test_spectral_linreg_interpret_runs(interpret, rng):
    N, p = 80, 24  # above the unrolled kernel's MAX_P = 16
    X = rng.normal(size=(N, p))
    y = X @ rng.normal(size=p) + 0.1 * rng.normal(size=N)
    out = spectral.run_spectral_linreg(
        7, X, y, n_burn=3, n_iter=5, n_chains=64,
        plam_diag=rng.uniform(0.5, 2.0, p), ptau_diag=rng.uniform(0.5, 2.0, N),
        mu=rng.normal(size=p),
    )
    assert out["beta"].shape == (64, 5, p)
    for name in ("beta", "lam", "tau", "log_post"):
        assert bool(np.isfinite(np.asarray(out[name])).all()), name
    assert float(out["tau"].min()) > 0 and float(out["lam"].min()) > 0


def test_spectral_mmala_interpret_matches_logpost(interpret, rng):
    """Kernel log_post must equal Model.log_p at the stored draws (the analytic
    target in eigencoordinates evaluates the b-space joint density exactly)."""
    from openmcmc_tpu.distributions import Normal
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import LinearCombination, ScaledMatrix

    N, p = 40, 20
    X = rng.normal(size=(N, p))
    y = (X @ rng.normal(size=p) + 0.2 * rng.normal(size=N)).astype(np.float64)
    ptau = rng.uniform(0.5, 2.0, N)
    plam = rng.uniform(0.5, 2.0, p)
    tau, lam = 3.0, 0.5
    out = spectral.run_spectral_mmala(
        5, X, y, n_burn=2, n_iter=4, n_chains=8, tau=tau, lam=lam, step=1.0,
        ptau_diag=ptau, plam_diag=plam,
    )
    assert out["beta"].shape == (8, 4, p)
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P", "tau")),
            Normal("beta", mean="mu0", precision=ScaledMatrix("P0", "one")),
        ]
    )
    state = {
        "y": jnp.asarray(y).reshape(-1, 1), "X": jnp.asarray(X),
        "P": st.Diagonal(jnp.asarray(ptau)), "tau": jnp.asarray(tau).reshape(1, 1),
        "P0": st.Diagonal(jnp.asarray(lam * plam)), "one": jnp.ones((1, 1)),
        "mu0": jnp.zeros((p, 1)),
    }
    for c in range(2):
        for t in range(2):
            state2 = dict(state)
            state2["beta"] = jnp.asarray(out["beta"][c, t]).reshape(p, 1)
            want = float(mdl.log_p(state2))
            got = float(out["log_post"][c, t])
            assert abs(got - want) < 5e-2 * max(1.0, abs(want)), (c, t, got, want)


def test_dispatch_routes_large_p_to_spectral(rng):
    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.fused.dispatch import match_fused_engine
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import LinearCombination, ScaledMatrix
    from openmcmc_tpu.samplers import ManifoldMALA, NormalGamma, NormalNormal

    N, p = 100, 48
    X = rng.normal(size=(N, p))
    y = X @ rng.normal(size=p)
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P_tau", "tau")),
            Normal("beta", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("tau", shape="a_tau", rate="b_tau"),
            Gamma("lambda", shape="a_lambda", rate="b_lambda"),
        ]
    )
    samplers = [NormalNormal("beta", mdl), NormalGamma("tau", mdl), NormalGamma("lambda", mdl)]
    state = {
        "y": y, "X": X, "beta": np.zeros(p), "P_tau": st.Diagonal(jnp.ones(N)), "tau": 1.0,
        "P_lambda": st.Diagonal(jnp.ones(p)), "mu": np.zeros(p), "lambda": 0.01,
        "a_tau": 1.0, "b_tau": 1.0, "a_lambda": 1.0, "b_lambda": 1.0,
    }
    m = MCMC(dict(state), samplers, mdl, n_burn=2, n_iter=3, n_chains=4, seed=0)
    assert match_fused_engine(m).engine_name == "fused_linreg_spectral"

    mdl2 = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P_tau", "tau")),
            Normal("beta", mean="mu", precision=ScaledMatrix("P_lambda", "one")),
        ]
    )
    state2 = {
        "y": y, "X": X, "beta": np.zeros(p), "P_tau": st.Diagonal(jnp.ones(N)), "tau": 1.0,
        "P_lambda": st.Diagonal(jnp.ones(p)), "mu": np.zeros(p), "one": 1.0,
    }
    m2 = MCMC(dict(state2), [ManifoldMALA("beta", mdl2, step=1.0)], mdl2, n_burn=2, n_iter=3, n_chains=4, seed=0)
    assert match_fused_engine(m2).engine_name == "fused_mmala_spectral"
