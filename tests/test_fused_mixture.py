"""Fused Gaussian-mixture engine: dispatch routing, interpret-mode log_post parity,
and (TPU-gated) statistical parity with the generic driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from openmcmc_tpu.distributions import Categorical, Gamma, Normal
from openmcmc_tpu.fused import mixture
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import MixtureParameterMatrix, MixtureParameterVector
from openmcmc_tpu.samplers import MixtureAllocation, NormalGamma, NormalNormal, RandomWalkLoop


@pytest.fixture
def interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def _mixture_data(rng, n=60, k=3):
    true_mu = np.linspace(-3.0, 3.0, k)
    alloc = rng.integers(0, k, n)
    y = true_mu[alloc] + rng.normal(0, 0.5, n)
    prior = rng.uniform(0.2, 1.0, (n, k))  # deliberately unnormalized rows
    return y, prior


def _build_mcmc(y, prior, n_burn, n_iter, n_chains, domain=True, seed=0, conjugate=False):
    n, k = prior.shape
    mdl = Model(
        [
            Normal(
                "y",
                mean=MixtureParameterVector(param="means", allocation="Z"),
                precision=MixtureParameterMatrix(param="lams", allocation="Z"),
            ),
            Categorical("Z", prob="prior"),
            Normal("means", mean="mu0", precision="P0"),
            Gamma("lams", shape="a0", rate="b0"),
        ]
    )
    limits = np.tile(np.asarray([[-20.0, 20.0]]), (k, 1)) if domain else None
    means_sampler = (
        NormalNormal("means", mdl)
        if conjugate
        else RandomWalkLoop("means", mdl, step=0.3, domain_limits=limits)
    )
    samplers = [
        MixtureAllocation("Z", mdl, response_param="y"),
        means_sampler,
        NormalGamma("lams", mdl),
    ]
    state = {
        "y": y.reshape(n, 1),
        "Z": np.zeros((n, 1), np.int32),
        "means": np.linspace(-1.0, 1.0, k).reshape(k, 1),
        "lams": np.ones((k, 1)),
        "prior": prior,
        "mu0": np.zeros((k, 1)),
        "P0": st.Diagonal(jnp.full((k,), 0.01)),
        "a0": np.full((k, 1), 2.0),
        "b0": np.full((k, 1), 1.0),
    }
    m = MCMC(dict(state), samplers, mdl, n_burn=n_burn, n_iter=n_iter, n_chains=n_chains, seed=seed)
    m.store_names = ["means", "lams"]
    return m


@pytest.mark.parametrize("conjugate", [False, True])
def test_dispatch_routes_mixture(rng, conjugate):
    from openmcmc_tpu.fused.dispatch import match_fused_engine

    y, prior = _mixture_data(rng)
    m = _build_mcmc(y, prior, n_burn=2, n_iter=4, n_chains=8, conjugate=conjugate)
    want_engine = "fused_mixture_conjugate" if conjugate else "fused_mixture"
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == want_engine
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert res.engine == want_engine
    assert set(res.store.keys()) == {"means", "lams"}
    assert res.store["means"].shape == (8, 4, 3, 1)
    assert res.store["lams"].shape == (8, 4, 3, 1)
    assert np.isfinite(np.asarray(res.log_post)).all()
    assert set(res.stats.keys()) == {"Z", "means", "lams"}
    if conjugate:
        assert res.stats["means"] == {}  # no MH counters: generic NormalNormal parity
    else:
        assert res.stats["means"]["proposal"].shape == (8,)


def test_dispatch_rejects_near_misses(rng):
    """Structural guards: anything the kernel cannot represent must fall back."""
    from openmcmc_tpu.fused.dispatch import match_fused_engine

    y, prior = _mixture_data(rng)
    # weak prior shape < 1: elementwise gamma draw has no boost
    m = _build_mcmc(y, prior, 2, 4, 8)
    m.data["a0"] = jnp.full((3, 1), 0.5)
    assert match_fused_engine(m) is None
    # storing Z matches (streamed from the kernel) -- but only under the 4 GB
    # HBM cap on the (iter, point, chain) Z buffer; past it the run falls back
    m = _build_mcmc(y, prior, 2, 4, 8)
    m.store_names = ["means", "lams", "Z"]
    runner = match_fused_engine(m)
    assert runner is not None and "Z" in runner.store_keys
    m = _build_mcmc(y, prior, 2, 4, 8)
    m.store_names = ["means", "lams", "Z"]
    m.n_iter = 300_000  # 300k x 64-pad x 128-pad chains x 4 B > 4 GB
    m.n_chains = 128
    assert match_fused_engine(m) is None
    # extra model term must not be silently dropped
    y2, prior2 = _mixture_data(rng)
    m = _build_mcmc(y2, prior2, 2, 4, 8)
    m.model = Model(list(m.model.values()) + [Normal("extra", mean="mu0", precision="P0")])
    assert match_fused_engine(m) is None


@pytest.mark.parametrize("conjugate_means", [False, True])
def test_interpret_log_post_matches_model(interpret, rng, conjugate_means):
    """Kernel log_post must equal Model.log_p at the stored draws.

    The interpret-mode PRNG stub makes every uniform identical: the kernel's
    inverse-CDF categorical then reduces to a deterministic function of the
    logits at the PREVIOUS iteration's (means, lams) --
    Z_i = #{k < K-1 : u_stub * sum_j w_ij >= cumsum_k w_i} with
    w = exp(logits - rowmax) -- so the stored draws reconstruct Z exactly."""
    y, prior = _mixture_data(rng, n=30, k=2)
    n, k = prior.shape
    out = mixture.run_fused_mixture(
        7, y, prior, n_burn=0, n_iter=4, n_chains=8,
        mu0=np.zeros(k), p0=np.full(k, 0.01), a0=np.full(k, 2.0), b0=np.ones(k),
        mu_init=np.linspace(-1.0, 1.0, k), lam_init=np.ones(k),
        step=0.3, domain=(np.full(k, -20.0), np.full(k, 20.0)),
        conjugate_means=conjugate_means, store_z=True,
    )
    mdl = Model(
        [
            Normal(
                "y",
                mean=MixtureParameterVector(param="means", allocation="Z"),
                precision=MixtureParameterMatrix(param="lams", allocation="Z"),
            ),
            Categorical("Z", prob="prior"),
            Normal("means", mean="mu0", precision="P0"),
            Gamma("lams", shape="a0", rate="b0"),
        ]
    )
    base = {
        "y": jnp.asarray(y).reshape(n, 1), "prior": jnp.asarray(prior),
        "mu0": jnp.zeros((k, 1)), "P0": st.Diagonal(jnp.full((k,), 0.01)),
        "a0": jnp.full((k, 1), 2.0), "b0": jnp.ones((k, 1)),
    }
    for c in range(2):
        for t in range(1, 4):
            mu_prev = np.asarray(out["means"][c, t - 1])
            lam_prev = np.asarray(out["lams"][c, t - 1])
            logits = np.log(prior) + 0.5 * (
                np.log(lam_prev)[None, :]
                - np.log(2 * np.pi)
                - lam_prev[None, :] * (y[:, None] - mu_prev[None, :]) ** 2
            )
            u_stub = 0.5 / 16777216.0  # interpret stub uniform (zero bits)
            w = np.exp(logits - logits.max(axis=1, keepdims=True))
            u = u_stub * w.sum(axis=1)
            z = (u[:, None] >= np.cumsum(w, axis=1)[:, :-1]).sum(axis=1)
            # the streamed Z draw must be the exact allocation the stats used
            np.testing.assert_array_equal(np.asarray(out["z"][c, t]), z, err_msg=str((c, t)))
            state = dict(base)
            state["Z"] = jnp.asarray(z).reshape(n, 1)
            state["means"] = jnp.asarray(out["means"][c, t]).reshape(k, 1)
            state["lams"] = jnp.asarray(out["lams"][c, t]).reshape(k, 1)
            want = float(mdl.log_p(state))
            got = float(out["log_post"][c, t])
            assert abs(got - want) < 5e-2 * max(1.0, abs(want)), (c, t, got, want)


def test_dispatch_routes_default_store_with_z(interpret, rng):
    """The driver's DEFAULT store set includes Z; that configuration must now
    dispatch fused, store Z with the generic driver's (chains, iter, n, 1) int32
    convention, and surface Z in final_state."""
    from openmcmc_tpu.fused.dispatch import match_fused_engine

    y, prior = _mixture_data(rng)
    n = y.shape[0]
    m = _build_mcmc(y, prior, n_burn=2, n_iter=4, n_chains=8)
    m.store_names = ["Z", "means", "lams"]  # the constructor default
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_mixture"
    res = m.run(engine="auto")
    assert res.engine == "fused_mixture"
    z = np.asarray(res.store["Z"])
    assert z.shape == (8, 4, n, 1) and z.dtype == np.int32
    assert set(np.unique(z)) <= set(range(prior.shape[1]))
    assert np.asarray(res.final_state["Z"]).shape == (8, n, 1)
    # generic parity of the stored-layout contract
    m2 = _build_mcmc(y, prior, n_burn=2, n_iter=4, n_chains=8)
    m2.store_names = ["Z", "means", "lams"]
    g = m2.run(engine="generic")
    assert np.asarray(g.store["Z"]).shape == z.shape
    assert np.asarray(g.store["Z"]).dtype == z.dtype


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="statistical test requires the real TPU PRNG"
)
def test_fused_mixture_tpu_matches_generic(rng):
    """Posterior parity with the generic driver (separate seeds) within MC error."""
    rng2 = np.random.default_rng(11)
    k = 2
    true_mu = np.array([-2.0, 3.0])
    true_lam = np.array([4.0, 1.0])
    alloc = rng2.integers(0, k, 200)
    y = rng2.normal(true_mu[alloc], 1 / np.sqrt(true_lam[alloc]))
    prior = np.full((200, k), 0.5)

    m = _build_mcmc(y, prior, n_burn=500, n_iter=1000, n_chains=512, seed=1)
    m.store_names = ["Z", "means", "lams"]  # the constructor default: Z streams too
    res = m.run(engine="fused")
    assert res.engine == "fused_mixture"
    m2 = _build_mcmc(y, prior, n_burn=500, n_iter=1000, n_chains=512, seed=2)
    m2.store_names = ["Z", "means", "lams"]
    res2 = m2.run(engine="generic")

    # per-point posterior allocation frequencies agree within MC error (the
    # components are well separated, so label switching is a non-issue)
    pz_f = (np.asarray(res.store["Z"]).reshape(512, 1000, 200) == 0).mean(axis=(0, 1))
    pz_g = (np.asarray(res2.store["Z"]).reshape(512, 1000, 200) == 0).mean(axis=(0, 1))
    lab_f, lab_g = (pz_f, pz_g) if np.corrcoef(pz_f, pz_g)[0, 1] > 0 else (pz_f, 1.0 - pz_g)
    assert np.max(np.abs(lab_f - lab_g)) < 0.05, np.max(np.abs(lab_f - lab_g))

    mu_f = np.asarray(res.store["means"]).reshape(512, 1000, k).mean(axis=(0, 1))
    mu_g = np.asarray(res2.store["means"]).reshape(512, 1000, k).mean(axis=(0, 1))
    # separated, well-identified components: chains agree to tight MC error
    assert np.max(np.abs(np.sort(mu_f) - np.sort(mu_g))) < 0.05, (mu_f, mu_g)
    lam_f = np.asarray(res.store["lams"]).reshape(512, 1000, k).mean(axis=(0, 1))
    lam_g = np.asarray(res2.store["lams"]).reshape(512, 1000, k).mean(axis=(0, 1))
    assert np.max(np.abs(np.log(np.sort(lam_f)) - np.log(np.sort(lam_g)))) < 0.1, (lam_f, lam_g)
    # acceptance rates comparable (same proposal mechanism, same counting window)
    acc_f = np.asarray(res.stats["means"]["accept"]).mean() / 1500.0
    acc_g = np.asarray(res2.stats["means"]["accept"]).mean() / np.asarray(
        res2.stats["means"]["proposal"]
    ).mean()
    assert abs(acc_f - acc_g) < 0.05, (acc_f, acc_g)


@pytest.mark.parametrize("conjugate", [False, True])
def test_fused_mixture_resume_continues_exactly(interpret, rng, conjugate):
    """Resume: under the deterministic stub the chained halves equal the full run
    exactly (the kernel carry is mu/lam rows + the accept counter)."""
    y, prior = _mixture_data(rng)

    with pltpu.force_tpu_interpret_mode():
        full = _build_mcmc(y, prior, 2, 6, 16, seed=0, conjugate=conjugate).run(engine="auto")
        seg1 = _build_mcmc(y, prior, 2, 3, 16, seed=1, conjugate=conjugate).run(engine="auto")
        seg2 = _build_mcmc(y, prior, 2, 3, 16, seed=2, conjugate=conjugate).run(
            engine="fused", resume=seg1
        )
    assert seg2.engine == ("fused_mixture_conjugate" if conjugate else "fused_mixture")
    for name in ("means", "lams"):
        cat = np.concatenate([np.asarray(seg1.store[name]), np.asarray(seg2.store[name])], axis=1)
        np.testing.assert_allclose(np.asarray(full.store[name]), cat, rtol=1e-5, err_msg=name)
    if not conjugate:
        np.testing.assert_array_equal(np.asarray(full.stats["means"]["accept"]),
                                      np.asarray(seg2.stats["means"]["accept"]))


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="statistical test requires the real TPU PRNG"
)
def test_fused_mixture_conjugate_tpu_matches_generic(rng):
    """Conjugate-means kernel variant: posterior parity with the generic driver's
    NormalNormal mixture-means path (samplers/conjugate.py) within MC error."""
    rng2 = np.random.default_rng(11)
    k = 2
    true_mu = np.array([-2.0, 3.0])
    true_lam = np.array([4.0, 1.0])
    alloc = rng2.integers(0, k, 200)
    y = rng2.normal(true_mu[alloc], 1 / np.sqrt(true_lam[alloc]))
    prior = np.full((200, k), 0.5)

    m = _build_mcmc(y, prior, n_burn=500, n_iter=1000, n_chains=512, seed=1, conjugate=True)
    res = m.run(engine="fused")
    assert res.engine == "fused_mixture_conjugate"
    m2 = _build_mcmc(y, prior, n_burn=500, n_iter=1000, n_chains=512, seed=2, conjugate=True)
    res2 = m2.run(engine="generic")

    mu_f = np.asarray(res.store["means"]).reshape(512, 1000, k).mean(axis=(0, 1))
    mu_g = np.asarray(res2.store["means"]).reshape(512, 1000, k).mean(axis=(0, 1))
    assert np.max(np.abs(np.sort(mu_f) - np.sort(mu_g))) < 0.05, (mu_f, mu_g)
    lam_f = np.asarray(res.store["lams"]).reshape(512, 1000, k).mean(axis=(0, 1))
    lam_g = np.asarray(res2.store["lams"]).reshape(512, 1000, k).mean(axis=(0, 1))
    assert np.max(np.abs(np.log(np.sort(lam_f)) - np.log(np.sort(lam_g)))) < 0.1, (lam_f, lam_g)
    # posterior SDs must also agree (the conjugate draw's variance term)
    sd_f = np.sort(np.asarray(res.store["means"]).reshape(512, 1000, k).std(axis=(0, 1)))
    sd_g = np.sort(np.asarray(res2.store["means"]).reshape(512, 1000, k).std(axis=(0, 1)))
    assert np.max(np.abs(sd_f - sd_g) / sd_g) < 0.1, (sd_f, sd_g)


# ---------------------------------------------------------------------------
# Round-4 scale-up: streamed data (n > 2048), K up to 32, replicate columns
# ---------------------------------------------------------------------------


def test_dispatch_routes_large_n_and_replicates(rng):
    """n past the VMEM-resident limit (streamed from HBM) and replicate response
    columns both match; K past MAX_K still falls back."""
    from openmcmc_tpu.fused.dispatch import match_fused_engine

    # n = 3000 > RESIDENT_N: streamed
    y, prior = _mixture_data(rng, n=3000, k=3)
    m = _build_mcmc(y, prior, 1, 2, 8)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_mixture"

    # replicate columns (n, 4) share the per-point allocation
    y2, prior2 = _mixture_data(rng, n=40, k=3)
    yr = y2[:, None] + rng.normal(0, 0.5, (40, 4))
    m2 = _build_mcmc(y2, prior2, 1, 2, 8)
    m2.data["y"] = jnp.asarray(yr)
    runner2 = match_fused_engine(m2)
    assert runner2 is not None and runner2.engine_name == "fused_mixture"

    # K over the cap falls back
    y3, prior3 = _mixture_data(rng, n=80, k=mixture.MAX_K + 1)
    m3 = _build_mcmc(y3, prior3, 1, 2, 8)
    assert match_fused_engine(m3) is None


def test_interpret_streamed_matches_resident(interpret, rng):
    """The streamed (HBM tile DMA) data path must reproduce the resident path's
    math exactly: same draws when the tile contents agree. Build one dataset
    where rows past n are zero-padding in BOTH paths and compare the engine
    output at n = 2048 (resident) vs the same data re-packed at n = 2049 with a
    zero-weight sentinel row (streamed): every statistic is identical because
    the sentinel row contributes cnt = 0 to every component."""
    n = 192
    y, prior = _mixture_data(rng, n=n, k=2)
    kwargs = dict(
        n_burn=0, n_iter=3, n_chains=8,
        mu0=np.zeros(2), p0=np.full(2, 0.01), a0=np.full(2, 2.0), b0=np.ones(2),
        mu_init=np.array([-1.0, 1.0]), lam_init=np.ones(2), step=0.3,
        domain=(np.full(2, -20.0), np.full(2, 20.0)), store_z=True,
    )
    res = mixture.run_fused_mixture(5, y, prior, **kwargs)
    # force the streaming layout for the same data
    import unittest.mock as mock

    with mock.patch.object(mixture, "RESIDENT_N", 64), mock.patch.object(mixture, "TILE_N", 64):
        jax.clear_caches()
        stream = mixture.run_fused_mixture(5, y, prior, **kwargs)
        jax.clear_caches()
    for key in ("means", "lams", "log_post", "z"):
        np.testing.assert_allclose(
            np.asarray(stream[key]), np.asarray(res[key]), rtol=2e-6, atol=1e-6, err_msg=key
        )


def test_interpret_replicates_match_explicit_sum(interpret, rng):
    """Replicate columns must give the identical kernel math as the collapsed
    per-point (count, sum, sumsq) statistics -- checked by comparing the stored
    log_post against Model.log_p with the replicated response."""
    n, k, r = 24, 2, 3
    true_mu = np.array([-2.0, 2.0])
    alloc = rng.integers(0, k, n)
    y = true_mu[alloc][:, None] + rng.normal(0, 0.5, (n, r))
    prior = rng.uniform(0.2, 1.0, (n, k))
    out = mixture.run_fused_mixture(
        9, y, prior, n_burn=0, n_iter=3, n_chains=8,
        mu0=np.zeros(k), p0=np.full(k, 0.01), a0=np.full(k, 2.0), b0=np.ones(k),
        mu_init=np.array([-1.0, 1.0]), lam_init=np.ones(k),
        conjugate_means=True,
    )
    mdl = Model(
        [
            Normal("y", mean=MixtureParameterVector(param="means", allocation="Z"),
                   precision=MixtureParameterMatrix(param="lams", allocation="Z")),
            Categorical("Z", prob="prior"),
            Normal("means", mean="mu0", precision="P0"),
            Gamma("lams", shape="a0", rate="b0"),
        ]
    )
    base = {
        "y": jnp.asarray(y), "prior": jnp.asarray(prior),
        "mu0": jnp.zeros((k, 1)), "P0": st.Diagonal(jnp.full((k,), 0.01)),
        "a0": jnp.full((k, 1), 2.0), "b0": jnp.ones((k, 1)),
    }
    for c in range(2):
        for t in range(1, 3):
            mu_prev = np.asarray(out["means"][c, t - 1])
            lam_prev = np.asarray(out["lams"][c, t - 1])
            # per-point replicate-summed logits, then the stub inverse-CDF draw
            cnt, sm, sq = float(r), y.sum(axis=1), (y * y).sum(axis=1)
            logits = np.log(prior) + 0.5 * cnt * (
                np.log(lam_prev)[None, :] - np.log(2 * np.pi)
            ) - 0.5 * lam_prev[None, :] * (
                sq[:, None] - 2.0 * sm[:, None] * mu_prev[None, :] + cnt * mu_prev[None, :] ** 2
            )
            u_stub = 0.5 / 16777216.0
            w = np.exp(logits - logits.max(axis=1, keepdims=True))
            u = u_stub * w.sum(axis=1)
            z = (u[:, None] >= np.cumsum(w, axis=1)[:, :-1]).sum(axis=1)
            state = dict(base)
            state["Z"] = jnp.asarray(z).reshape(n, 1)
            state["means"] = jnp.asarray(out["means"][c, t]).reshape(k, 1)
            state["lams"] = jnp.asarray(out["lams"][c, t]).reshape(k, 1)
            want = float(mdl.log_p(state))
            got = float(out["log_post"][c, t])
            assert abs(got - want) < 5e-2 * max(1.0, abs(want)), (c, t, got, want)


def test_k16_matches_and_runs(interpret, rng):
    """K = 16 (past the old K <= 8 cap) matches and runs through the dispatcher."""
    from openmcmc_tpu.fused.dispatch import match_fused_engine

    y, prior = _mixture_data(rng, n=64, k=16)
    m = _build_mcmc(y, prior, 1, 2, 8, conjugate=True)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_mixture_conjugate"
    res = m.run(engine="auto")
    assert res.engine == "fused_mixture_conjugate"
    assert res.store["means"].shape == (8, 2, 16, 1)
    assert np.isfinite(np.asarray(res.store["means"])).all()
    assert np.asarray(res.store["lams"]).min() > 0.0


@pytest.mark.tpu
@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu", reason="statistical test requires the real TPU PRNG"
)
def test_streamed_mixture_tpu_recovers_components(rng):
    """HBM-streaming data tier (n = 5000 > RESIDENT_N): posterior component
    means/precisions must recover the generating values within MC error."""
    n, k = 5000, 3
    true_mu = np.array([-3.0, 0.0, 3.0])
    alloc = rng.integers(0, k, n)
    y = true_mu[alloc] + rng.normal(0, 0.7, n)
    prior = np.full((n, k), 1.0)
    out = mixture.run_fused_mixture(
        11, y, prior, n_burn=100, n_iter=200, n_chains=256,
        mu0=np.zeros(k), p0=np.full(k, 0.01), a0=np.full(k, 2.0), b0=np.ones(k),
        mu_init=np.array([-1.0, 0.0, 1.0]), lam_init=np.ones(k),
        conjugate_means=True, store_z=True,
    )
    mus = np.sort(np.asarray(out["means"]).mean(axis=(0, 1)))
    assert np.allclose(mus, true_mu, atol=0.1), mus
    lams = np.sort(np.asarray(out["lams"]).mean(axis=(0, 1)))
    assert np.all(np.abs(lams - 1.0 / 0.49) < 0.3), lams
    # streamed-tier Z draws (tile DMAs at n_pad = 5120): the per-point modal
    # allocation must recover the generating component for nearly every point
    # (components are ~4.3 sd apart)
    z = np.asarray(out["z"])  # (256, 200, 5000)
    order = np.argsort(np.asarray(out["means"]).mean(axis=(0, 1)))
    counts = np.stack([(z == c).sum(axis=(0, 1)) for c in range(k)])
    z_mode = order.argsort()[np.argmax(counts, axis=0)]  # relabel to sorted means
    assert (z_mode == alloc).mean() > 0.97, (z_mode == alloc).mean()
