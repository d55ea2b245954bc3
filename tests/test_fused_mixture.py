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
    # storing Z requires the generic driver
    m = _build_mcmc(y, prior, 2, 4, 8)
    m.store_names = ["means", "lams", "Z"]
    assert match_fused_engine(m) is None
    # extra model term must not be silently dropped
    y2, prior2 = _mixture_data(rng)
    m = _build_mcmc(y2, prior2, 2, 4, 8)
    m.model = Model(list(m.model.values()) + [Normal("extra", mean="mu0", precision="P0")])
    assert match_fused_engine(m) is None


@pytest.mark.parametrize("conjugate_means", [False, True])
def test_interpret_log_post_matches_model(interpret, rng, conjugate_means):
    """Kernel log_post must equal Model.log_p at the stored draws.

    The interpret-mode PRNG stub makes every uniform identical: for K > 2 the
    Gumbel noise cancels and the kernel's allocation reduces to argmax_k of the
    logits at the PREVIOUS iteration's (means, lams); for K = 2 the kernel uses
    the exact logistic form, so Z = (logit diff > logit(u_stub)). The stored
    draws let us reconstruct either exactly."""
    y, prior = _mixture_data(rng, n=30, k=2)
    n, k = prior.shape
    out = mixture.run_fused_mixture(
        7, y, prior, n_burn=0, n_iter=4, n_chains=8,
        mu0=np.zeros(k), p0=np.full(k, 0.01), a0=np.full(k, 2.0), b0=np.ones(k),
        mu_init=np.linspace(-1.0, 1.0, k), lam_init=np.ones(k),
        step=0.3, domain=(np.full(k, -20.0), np.full(k, 20.0)),
        conjugate_means=conjugate_means,
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
            z = (logits[:, 1] - logits[:, 0] > np.log(u_stub) - np.log1p(-u_stub)).astype(int)
            state = dict(base)
            state["Z"] = jnp.asarray(z).reshape(n, 1)
            state["means"] = jnp.asarray(out["means"][c, t]).reshape(k, 1)
            state["lams"] = jnp.asarray(out["lams"][c, t]).reshape(k, 1)
            want = float(mdl.log_p(state))
            got = float(out["log_post"][c, t])
            assert abs(got - want) < 5e-2 * max(1.0, abs(want)), (c, t, got, want)


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
    res = m.run(engine="fused")
    assert res.engine == "fused_mixture"
    m2 = _build_mcmc(y, prior, n_burn=500, n_iter=1000, n_chains=512, seed=2)
    res2 = m2.run(engine="generic")

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
