"""Fused manifold-MALA engine vs the generic driver and the analytic posterior
(TPU-only; kernel logic on CPU in test_pallas_interpret.py)."""

import jax
import numpy as np
import pytest

ON_TPU = jax.default_backend() == "tpu"
pytestmark = [pytest.mark.tpu, pytest.mark.skipif(not ON_TPU, reason="fused engine statistics require TPU hardware")]


def test_fused_mmala_matches_generic_and_analytic(rng):
    import jax.numpy as jnp

    from openmcmc_tpu.distributions import Normal
    from openmcmc_tpu.fused import run_fused_mmala
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import LinearCombination, ScaledMatrix
    from openmcmc_tpu.samplers import ManifoldMALA

    N, d = 100, 5
    X = rng.normal(size=(N, d))
    y = (X @ rng.normal(size=(d, 1)) + 0.1 * rng.normal(size=(N, 1))).reshape(-1)
    ptau = np.full(N, 100.0)
    plam = np.full(d, 0.01)

    out = run_fused_mmala(3, X, y, n_burn=200, n_iter=1000, n_chains=2048,
                          tau=1.0, lam=1.0, step=1.0, ptau_diag=ptau, plam_diag=plam)

    # analytic Gaussian posterior
    A = X.T * ptau @ X + np.diag(plam)
    v = (X.T * ptau) @ y
    mean = np.linalg.solve(A, v)
    cov = np.linalg.inv(A)

    draws = np.asarray(out["beta"])  # (chains, iters, d)
    se = np.sqrt(np.diag(cov)) / np.sqrt(2048)
    assert np.abs(draws.mean((0, 1)) - mean).max() < 6 * se.max()
    np.testing.assert_allclose(draws.std((0, 1)), np.sqrt(np.diag(cov)), rtol=0.05)

    # acceptance vs an exact f64 reference simulation of the same kernel. (The
    # generic driver accepts LESS -- ~63% vs the exact 79% -- because its per-step
    # recomputed f32 Hessian/Cholesky adds noise to the ratio; the fused engine's
    # precomputed constants avoid that.)
    Lf = np.linalg.cholesky(A)
    rng64 = np.random.default_rng(0)
    b = np.zeros(d)
    acc = 0
    T = 20000
    for _ in range(T):
        mu_cur = 0.5 * b + 0.5 * mean
        bp = mu_cur + np.linalg.solve(Lf.T, rng64.normal(size=d))
        mu_prop = 0.5 * bp + 0.5 * mean
        ratio = (-0.5 * bp @ A @ bp + bp @ v) - (-0.5 * b @ A @ b + b @ v)
        rb = Lf.T @ (b - mu_prop)
        rp = Lf.T @ (bp - mu_cur)
        ratio += -0.5 * rb @ rb + 0.5 * rp @ rp
        if np.log(rng64.random()) < ratio:
            b = bp
            acc += 1
    acc_exact = acc / T
    acc_fused = float(out["accept"].mean())
    assert abs(acc_fused - acc_exact) < 0.02, (acc_fused, acc_exact)

    # log-post parity with the generic driver (same model constants)
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P", "tau")),
            Normal("beta", mean="mu0", precision=ScaledMatrix("P0", "one")),
        ]
    )
    state = {
        "y": y.reshape(-1, 1), "X": X, "beta": np.zeros((d, 1)), "P": st.Diagonal(jnp.asarray(ptau)),
        "tau": 1.0, "P0": st.Diagonal(jnp.asarray(plam)), "mu0": np.zeros((d, 1)), "one": 1.0,
    }
    m = MCMC(state, [ManifoldMALA("beta", mdl, step=1.0)], mdl,
             n_burn=200, n_iter=1000, n_chains=2048, seed=0)
    res = m.run()
    np.testing.assert_allclose(float(out["log_post"].mean()),
                               float(np.asarray(res.log_post).mean()), rtol=0.005)


def test_fused_mmala_adapted_hits_target_acceptance():
    """In-kernel Robbins-Monro adaptation: from a far-too-large step, burn-in must
    land the sampling-phase acceptance near the MALA-optimal 0.574 target."""
    rng = np.random.default_rng(0)
    N, d = 20, 3
    X = rng.normal(size=(N, d))
    y = X @ rng.normal(size=d) + 0.1 * rng.normal(size=N)

    from openmcmc_tpu.fused import run_fused_mmala

    out = run_fused_mmala(7, X, y, n_burn=1500, n_iter=1000, n_chains=4096, step=8.0,
                          adapt_step=True, target_accept=0.574, adapt_rate=0.05)
    acc = float(np.asarray(out["accept"]).mean())
    assert abs(acc - 0.574) < 0.06, acc
    step_final = float(np.exp(np.asarray(out["log_step"])).mean())
    assert step_final < 4.0, step_final
