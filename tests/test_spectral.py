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


def _lattice_p0(side=6, ridge=0.01):
    """5-point stencil Laplacian on a side x side grid + ridge: the canonical
    non-tridiagonal GMRF precision (reference factors these via SuperLU,
    gmrf.py:489-520)."""
    import scipy.sparse as sp

    d = sp.diags([np.ones(side - 1), np.ones(side - 1)], [-1, 1], (side, side))
    lap = sp.eye(side * side) * 4 - sp.kron(sp.eye(side), d) - sp.kron(d, sp.eye(side))
    return np.asarray(lap.todense(), np.float64) + ridge * np.eye(side * side)


def test_spectral_smoother_interpret_matches_logpost(interpret, rng):
    """Kernel log_post must equal Model.log_p at the stored (b, lam, tau) draws."""
    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import ScaledMatrix

    P0 = _lattice_p0(side=5)
    p = P0.shape[0]
    y = rng.normal(size=p)
    d_vec = rng.uniform(0.5, 2.0, p)
    mu0 = 0.1 * rng.normal(size=p)
    out = spectral.run_spectral_smoother(
        11, y, P0, n_burn=2, n_iter=4, n_chains=8,
        a_lam=10.0, b_lam=1.0, a_tau=1.0, b_tau=1.0, lam0=5.0, tau0=1.0,
        noise_diag=d_vec, mu0=mu0,
    )
    assert out["b"].shape == (8, 4, p)
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("D", "tau")),
            Normal("b", mean="mu0", precision=ScaledMatrix("P0", "lam")),
            Gamma("lam", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    base = {
        "y": jnp.asarray(y).reshape(-1, 1), "D": st.Diagonal(jnp.asarray(d_vec)),
        "P0": st.Dense(jnp.asarray(P0)), "mu0": jnp.asarray(mu0).reshape(-1, 1),
        "a_lam": jnp.full((1, 1), 10.0), "b_lam": jnp.ones((1, 1)),
        "a_tau": jnp.ones((1, 1)), "b_tau": jnp.ones((1, 1)),
    }
    for c in range(2):
        for t in range(2):
            state = dict(base)
            state["b"] = jnp.asarray(out["b"][c, t]).reshape(p, 1)
            state["lam"] = jnp.asarray(out["lam"][c, t]).reshape(1, 1)
            state["tau"] = jnp.asarray(out["tau"][c, t]).reshape(1, 1)
            want = float(mdl.log_p(state))
            got = float(out["log_post"][c, t])
            assert abs(got - want) < 5e-2 * max(1.0, abs(want)), (c, t, got, want)


def test_dispatch_routes_lattice_smoother_to_spectral(rng):
    """A 2-D lattice prior precision (Dense, non-tridiagonal) through the
    NormalNormal triplet must dispatch the spectral smoother engine and return
    the generic driver's store contract."""
    from jax.experimental.pallas import tpu as pltpu

    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.fused.dispatch import match_fused_engine
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import ScaledMatrix
    from openmcmc_tpu.samplers import NormalGamma, NormalNormal

    P0 = _lattice_p0(side=5)
    p = P0.shape[0]
    y = rng.normal(size=p)
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("lambda", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    samplers = [NormalNormal("b", mdl), NormalGamma("lambda", mdl), NormalGamma("tau", mdl)]
    state = {
        "y": y, "b": y.copy(), "mu": np.zeros(p), "lambda": 10.0,
        "P_lambda": st.Dense(jnp.asarray(P0)),
        "a_lam": 10.0, "b_lam": 1.0, "tau": 1.0, "P_tau": st.Diagonal(jnp.ones(p)),
        "a_tau": 1.0, "b_tau": 1.0,
    }
    m = MCMC(dict(state), samplers, mdl, n_burn=2, n_iter=4, n_chains=8, seed=0)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_smoother_spectral"
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert res.engine == "fused_smoother_spectral"
    assert set(res.store.keys()) == {"b", "lambda", "tau"}
    assert res.store["b"].shape == (8, 4, p, 1)
    assert np.isfinite(np.asarray(res.log_post)).all()


@pytest.mark.tpu
@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu", reason="statistical test requires the real TPU PRNG"
)
def test_spectral_smoother_tpu_matches_generic(rng):
    """Lattice smoother: fused spectral posterior must match the generic driver
    (same model, separate seeds) within MC error on the real chip."""
    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import ScaledMatrix
    from openmcmc_tpu.samplers import NormalGamma, NormalNormal

    P0 = _lattice_p0(side=8)
    p = P0.shape[0]
    xg, yg = np.meshgrid(np.arange(8), np.arange(8))
    truth = np.sin(xg / 2.0) + np.cos(yg / 3.0)
    y = (truth + rng.normal(0, 0.3, (8, 8))).reshape(-1)

    def build(n_chains, n_iter, n_burn):
        mdl = Model(
            [
                Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
                Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
                Gamma("lambda", shape="a_lam", rate="b_lam"),
                Gamma("tau", shape="a_tau", rate="b_tau"),
            ]
        )
        samplers = [NormalNormal("b", mdl), NormalGamma("lambda", mdl), NormalGamma("tau", mdl)]
        state = {
            "y": y, "b": y.copy(), "mu": np.zeros(p), "lambda": 2.0,
            "P_lambda": st.Dense(jnp.asarray(P0)),
            "a_lam": 2.0, "b_lam": 1.0, "tau": 1.0, "P_tau": st.Diagonal(jnp.ones(p)),
            "a_tau": 1.0, "b_tau": 1.0,
        }
        return MCMC(dict(state), samplers, mdl, n_burn=n_burn, n_iter=n_iter, n_chains=n_chains, seed=3)

    m = build(512, 400, 100)
    res = m.run(engine="fused")
    assert res.engine == "fused_smoother_spectral"
    m2 = build(512, 400, 100)
    res2 = m2.run(engine="generic")
    b_f = np.asarray(res.store["b"]).reshape(512, 400, p).mean(axis=(0, 1))
    b_g = np.asarray(res2.store["b"]).reshape(512, 400, p).mean(axis=(0, 1))
    # conjugate draws mix in one step: MC error of the mean is ~sd/sqrt(n_draws_eff)
    assert np.max(np.abs(b_f - b_g)) < 0.05, np.max(np.abs(b_f - b_g))
    for name in ("lambda", "tau"):
        v_f = np.asarray(res.store[name]).reshape(-1)
        v_g = np.asarray(res2.store[name]).reshape(-1)
        assert abs(np.log(v_f.mean()) - np.log(v_g.mean())) < 0.05, name


def test_dispatch_routes_tridiag_to_spectral_with_generic_logdet(rng):
    """Tridiagonal (p <= 1024) now routes to the spectral engine; with an
    INTRINSIC (singular RW1) prior the stored log_post must still match
    Model.log_p, whose logdet(P0) goes through the clamped structured Cholesky
    -- dispatch passes that value instead of the eigenvalue product."""
    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.fused.dispatch import match_fused_engine
    from openmcmc_tpu.linalg import gmrf
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import ScaledMatrix
    from openmcmc_tpu.samplers import NormalGamma, NormalNormal

    s_loc = np.linspace(0.0, 6.0, 12)
    P0 = gmrf.precision_temporal(jnp.asarray(s_loc))  # singular Banded bw=1
    p = 12
    y = rng.normal(size=p)
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("lambda", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    samplers = [NormalNormal("b", mdl), NormalGamma("lambda", mdl), NormalGamma("tau", mdl)]
    state = {
        "y": y, "b": y.copy(), "mu": np.zeros(p), "lambda": 10.0, "P_lambda": P0,
        "a_lam": 10.0, "b_lam": 1.0, "tau": 1.0, "P_tau": st.Diagonal(jnp.ones(p)),
        "a_tau": 1.0, "b_tau": 1.0,
    }
    m = MCMC(dict(state), samplers, mdl, n_burn=2, n_iter=4, n_chains=8, seed=5)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_smoother_spectral"
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    base = {
        "y": jnp.asarray(y).reshape(-1, 1), "P_tau": st.Diagonal(jnp.ones(p)),
        "P_lambda": P0, "mu": jnp.zeros((p, 1)),
        "a_lam": jnp.full((1, 1), 10.0), "b_lam": jnp.ones((1, 1)),
        "a_tau": jnp.ones((1, 1)), "b_tau": jnp.ones((1, 1)),
    }
    mdl2 = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("lambda", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    for c in range(2):
        for t in range(2):
            st_ = dict(base)
            st_["b"] = jnp.asarray(res.store["b"][c, t]).reshape(p, 1)
            st_["lambda"] = jnp.asarray(res.store["lambda"][c, t]).reshape(1, 1)
            st_["tau"] = jnp.asarray(res.store["tau"][c, t]).reshape(1, 1)
            want = float(mdl2.log_p(st_))
            got = float(np.asarray(res.log_post)[c, t])
            # the singular-prior pseudo-constant is ~1e2; match to f32 noise
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


# ---------------------------------------------------------------------------
# HBM-streaming smoother (p > MAX_P_SMOOTHER): the eigenbasis store matrix is
# DMAd from HBM in STREAM_RB lane blocks instead of sitting resident in VMEM
# ---------------------------------------------------------------------------


def test_smoother_stream_matches_vmem_path(rng, monkeypatch):
    """Identical bit stream through both store paths: the streaming engine's
    per-block DMA + blockwise MXU matmul must reproduce the resident-VMEM
    engine's draws exactly (same draw-site sequence, same contraction order)."""
    import jax

    from openmcmc_tpu.fused import prng

    P0 = _lattice_p0(side=12)
    p = P0.shape[0]  # 144: rounds to p128 = 256 on both paths
    y = rng.normal(size=p)
    d_vec = rng.uniform(0.5, 2.0, p)
    mu0 = 0.1 * rng.normal(size=p)

    def run_once(stream):
        jax.clear_caches()
        spectral._EIG_CACHE.clear()
        if stream:
            # force the streaming layout at this small p, with a block size that
            # exercises the MULTI-block DMA pipeline (n_rb = 2)
            monkeypatch.setattr(spectral, "MAX_P_SMOOTHER", 16)
            monkeypatch.setattr(spectral, "STREAM_RB", 128)
        else:
            monkeypatch.setattr(spectral, "MAX_P_SMOOTHER", 1024)
        src = prng.HostBitSource()
        with pltpu.force_tpu_interpret_mode(), prng.host_bits(src):
            out = spectral.run_spectral_smoother(
                23, y, P0, n_burn=2, n_iter=4, n_chains=8,
                a_lam=10.0, b_lam=1.0, a_tau=1.0, b_tau=1.0, lam0=5.0, tau0=1.0,
                noise_diag=d_vec, mu0=mu0,
            )
            got = {k: np.asarray(v) for k, v in out.items()}
        jax.clear_caches()
        return got

    vmem = run_once(stream=False)
    hbm = run_once(stream=True)
    assert set(vmem) == set(hbm)
    for k in vmem:
        np.testing.assert_allclose(hbm[k], vmem[k], rtol=2e-6, atol=1e-6, err_msg=k)


def test_dispatch_routes_large_lattice_to_streaming_spectral(rng):
    """A 34 x 34 lattice (p = 1156 > MAX_P_SMOOTHER) must still dispatch the
    spectral smoother -- now on the HBM-streaming path -- as ONE kernel launch."""
    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.fused.dispatch import match_fused_engine
    from openmcmc_tpu.linalg import gmrf
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import ScaledMatrix
    from openmcmc_tpu.samplers import NormalGamma, NormalNormal

    Q = gmrf.precision_lattice(34, 34, ridge=1e-3)
    p = st.dim(Q)
    assert p > spectral.MAX_P_SMOOTHER
    y = rng.normal(size=p)
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("lambda", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    samplers = [NormalNormal("b", mdl), NormalGamma("lambda", mdl), NormalGamma("tau", mdl)]
    state = {
        "y": y, "b": y.copy(), "mu": np.zeros(p), "lambda": 10.0,
        "P_lambda": Q, "a_lam": 10.0, "b_lam": 1.0,
        "tau": 1.0, "P_tau": st.Diagonal(jnp.ones(p)), "a_tau": 1.0, "b_tau": 1.0,
    }
    m = MCMC(dict(state), samplers, mdl, n_burn=1, n_iter=3, n_chains=4, seed=0)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_smoother_spectral"
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert res.engine == "fused_smoother_spectral"
    assert res.store["b"].shape == (4, 3, p, 1)
    assert np.isfinite(np.asarray(res.store["b"])).all()
    assert np.isfinite(np.asarray(res.log_post)).all()


def test_smoother_p_cap():
    # the cap raises before P0 is touched, so a placeholder suffices
    with pytest.raises(ValueError, match="8192"):
        spectral.run_spectral_smoother(0, np.zeros(8200), np.zeros((1, 1)), 1, 1, 1)


@pytest.mark.tpu
@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu", reason="statistical test requires the real TPU PRNG"
)
def test_streamed_smoother_tpu_matches_analytic(rng):
    """HBM-streaming tier (p = 1156 > MAX_P_SMOOTHER) against the ANALYTIC
    conditional: huge Gamma hyperparameters pin (lam, tau) at (5, 4), making
    b | y exactly N((lam P0 + tau D)^-1 (tau D y), (lam P0 + tau D)^-1); the
    streamed engine's posterior mean/sd must match within MC error."""
    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.linalg import gmrf
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import ScaledMatrix
    from openmcmc_tpu.samplers import NormalGamma, NormalNormal

    Q = gmrf.precision_lattice(34, 34, ridge=1e-3)
    p = st.dim(Q)
    assert p > spectral.MAX_P_SMOOTHER
    y = rng.normal(size=p)
    lam_t, tau_t = 5.0, 4.0
    big = 1e6
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("lambda", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    samplers = [NormalNormal("b", mdl), NormalGamma("lambda", mdl), NormalGamma("tau", mdl)]
    state = {
        "y": y, "b": y.copy(), "mu": np.zeros(p),
        "lambda": lam_t, "P_lambda": Q, "a_lam": big, "b_lam": big / lam_t,
        "tau": tau_t, "P_tau": st.Diagonal(jnp.ones(p)), "a_tau": big, "b_tau": big / tau_t,
    }
    m = MCMC(dict(state), samplers, mdl, n_burn=50, n_iter=200, n_chains=512, seed=5,
             store_names=["b"])
    res = m.run(engine="fused")
    assert res.engine == "fused_smoother_spectral"
    draws = np.asarray(res.store["b"]).reshape(512, 200, p)
    A = lam_t * np.asarray(st.to_dense(Q)) + tau_t * np.eye(p)
    mean_exact = np.linalg.solve(A, tau_t * y)
    sd_exact = np.sqrt(np.diag(np.linalg.inv(A)))
    n_eff = 512 * 200  # iid across chains; within-chain autocorr only loosens this
    err = np.abs(draws.mean(axis=(0, 1)) - mean_exact) / (sd_exact / np.sqrt(n_eff))
    # max over p dims inflates by ~sqrt(2 log p) ~ 3.75; gate at 6 + slack for
    # the (big-but-finite) hyperparameter pinning bias
    assert float(np.max(err)) < 8.0, float(np.max(err))
    sd_ratio = draws.std(axis=(0, 1)) / sd_exact
    assert abs(float(np.mean(sd_ratio)) - 1.0) < 0.02, float(np.mean(sd_ratio))


@pytest.mark.tpu
@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu", reason="statistical test requires the real TPU PRNG"
)
def test_spectral_mmala_adapt_tpu_matches_gls(rng):
    """In-kernel adapted spectral mMALA on hardware: the posterior must match the
    analytic GLS solution and the adapted acceptance must sit at the 0.574
    target (the in-kernel Robbins-Monro actually steering)."""
    from openmcmc_tpu.fused.spectral import run_spectral_mmala

    N, d = 200, 24
    X = rng.normal(size=(N, d))
    y = X @ rng.normal(size=d) + 0.5 * rng.normal(size=N)
    out = run_spectral_mmala(
        1, X, y, n_burn=300, n_iter=500, n_chains=256, step=1.0,
        ptau_diag=np.full(N, 4.0), plam_diag=np.full(d, 0.01),
        adapt_step=True,
    )
    A = 4.0 * X.T @ X + 0.01 * np.eye(d)
    mu_post = np.linalg.solve(A, 4.0 * X.T @ y)
    sd_post = np.sqrt(np.diag(np.linalg.inv(A)))
    bmean = np.asarray(out["beta"]).mean(axis=(0, 1))
    assert float(np.max(np.abs(bmean - mu_post) / sd_post)) < 0.2
    acc = float(np.asarray(out["accept_total"]).mean()) / 800.0
    assert 0.45 < acc < 0.7, acc  # adapted toward 0.574
    # per-chain adapted steps actually moved and are returned
    ls = np.asarray(out["log_step"])
    assert ls.std() > 0.0 and np.isfinite(ls).all()
