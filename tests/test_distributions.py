"""Distribution tests, mirroring reference tests/test_distribution.py:
log_p values vs scipy, analytic grad/Hessian vs autodiff, sampling moments,
Hessian symmetry, profile-likelihood sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from openmcmc_tpu.distributions import Categorical, Gamma, LogNormal, Normal, NullDistribution, Poisson, Uniform
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.parameters import Identity, LinearCombination, MixtureParameterMatrix, MixtureParameterVector, ScaledMatrix


@pytest.fixture
def normal_state(rng):
    p, n = 4, 3
    A = rng.normal(size=(p, p))
    Q = A @ A.T + p * np.eye(p)
    return {
        "y": jnp.asarray(rng.normal(size=(p, n))),
        "mu": jnp.asarray(rng.normal(size=(p, 1))),
        "Q": jnp.asarray(Q),
        "tau": jnp.asarray([[2.0]]),
    }


def test_normal_log_p_vs_scipy(normal_state):
    dist = Normal("y", mean="mu", precision="Q")
    got = dist.log_p(normal_state)
    cov = np.linalg.inv(np.asarray(normal_state["Q"]))
    want = sps.multivariate_normal.logpdf(
        np.asarray(normal_state["y"]).T, mean=np.asarray(normal_state["mu"])[:, 0], cov=cov
    ).sum()
    np.testing.assert_allclose(got, want, rtol=5e-4)


def test_normal_grad_response_analytic_vs_autodiff(normal_state):
    dist = Normal("y", mean="mu", precision="Q")
    grad, hess = dist.grad_log_p(normal_state, "y")
    ad_grad = dist._autodiff_grad(normal_state, "y")
    np.testing.assert_allclose(grad, ad_grad, rtol=1e-3, atol=1e-4)
    ad_hess = dist._autodiff_neg_hessian(normal_state, "y")
    # autodiff-through-Cholesky in f32 carries ~0.2% noise (analytic verified vs exact f64)
    np.testing.assert_allclose(hess, ad_hess.reshape(hess.shape), rtol=5e-3, atol=0.1)
    # symmetry
    np.testing.assert_allclose(hess, np.asarray(hess).T, rtol=1e-5, atol=1e-6)


def test_normal_grad_mean_param_analytic_vs_autodiff(rng):
    n, d = 12, 3
    state = {
        "y": jnp.asarray(rng.normal(size=(n, 2))),
        "beta": jnp.asarray(rng.normal(size=(d, 1))),
        "X": jnp.asarray(rng.normal(size=(n, d))),
        "P": jnp.asarray(np.eye(n) * 1.7),
    }
    dist = Normal("y", mean=LinearCombination(form={"beta": "X"}), precision="P")
    grad, hess = dist.grad_log_p(state, "beta")
    np.testing.assert_allclose(grad, dist._autodiff_grad(state, "beta"), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(hess, dist._autodiff_neg_hessian(state, "beta"), rtol=5e-3, atol=0.1)


def test_normal_truncated_log_p(normal_state):
    dist = Normal("y", mean="mu", precision="Q", domain_response_lower=-100.0, domain_response_upper=100.0)
    finite = dist.log_p(normal_state)
    assert np.isfinite(float(finite))
    state_bad = dict(normal_state)
    state_bad["y"] = normal_state["y"].at[0, 0].set(200.0)
    assert np.isneginf(float(dist.log_p(state_bad)))


def test_normal_sample_moments(normal_state, key):
    dist = Normal("y", mean="mu", precision="Q")
    x = dist.sample(key, normal_state, n=20000)
    np.testing.assert_allclose(
        np.asarray(x).mean(1, keepdims=True), np.asarray(normal_state["mu"]), atol=0.05
    )


def test_normal_truncated_sample_bounds(normal_state, key):
    dist = Normal("y", mean="mu", precision="Q", domain_response_lower=0.0)
    x = dist.sample(key, normal_state, n=50)
    assert float(jnp.min(x)) >= 0.0


def test_lognormal_log_p_vs_scipy(rng):
    p, n = 3, 4
    state = {
        "x": jnp.asarray(np.abs(rng.normal(size=(p, n))) + 0.5),
        "mu": jnp.asarray(rng.normal(size=(p, 1))),
        "Q": jnp.asarray(np.eye(p) * 2.0),
    }
    dist = LogNormal("x", mean="mu", precision="Q")
    got = float(dist.log_p(state))
    x = np.asarray(state["x"])
    want = sps.multivariate_normal.logpdf(
        np.log(x).T, mean=np.asarray(state["mu"])[:, 0], cov=np.linalg.inv(np.asarray(state["Q"]))
    ).sum() - np.log(x).sum()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lognormal_grads_vs_autodiff(rng):
    p, n = 3, 2
    A = rng.normal(size=(p, p))
    state = {
        "x": jnp.asarray(np.abs(rng.normal(size=(p, n))) + 0.5),
        "mu": jnp.asarray(rng.normal(size=(p, 1))),
        "Q": jnp.asarray(A @ A.T + p * np.eye(p)),
    }
    dist = LogNormal("x", mean="mu", precision="Q")
    grad, hess = dist.grad_log_p(state, "x")
    np.testing.assert_allclose(grad, dist._autodiff_grad(state, "x"), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(hess, dist._autodiff_neg_hessian(state, "x"), rtol=5e-3, atol=0.1)
    # mean-parameter case
    grad_mu, hess_mu = dist.grad_log_p(state, "mu")
    np.testing.assert_allclose(grad_mu, dist._autodiff_grad(state, "mu"), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(hess_mu, dist._autodiff_neg_hessian(state, "mu"), rtol=5e-3, atol=0.1)


def test_lognormal_sample_moments(rng, key):
    state = {
        "x": jnp.zeros((2, 1)),
        "mu": jnp.asarray([[0.1], [-0.2]]),
        "Q": jnp.asarray(np.eye(2) * 4.0),
    }
    dist = LogNormal("x", mean="mu", precision="Q")
    x = np.asarray(dist.sample(key, state, n=40000))
    want = np.exp(np.asarray(state["mu"])[:, 0] + 0.5 * 0.25)
    np.testing.assert_allclose(x.mean(1), want, rtol=0.03)


def test_gamma_log_p_vs_scipy(rng):
    state = {
        "tau": jnp.asarray(np.abs(rng.normal(size=(2, 3))) + 0.1),
        "a": jnp.asarray([[2.0], [3.0]]),
        "b": jnp.asarray([[1.5], [0.5]]),
    }
    dist = Gamma("tau", shape="a", rate="b")
    got = float(dist.log_p(state))
    x = np.asarray(state["tau"])
    want = sps.gamma.logpdf(x, np.asarray(state["a"]), scale=1 / np.asarray(state["b"])).sum()
    np.testing.assert_allclose(got, want, rtol=1e-4)
    by_obs = dist.log_p(state, by_observation=True)
    assert by_obs.shape == (3,)


def test_gamma_sample_moments(key):
    state = {"tau": jnp.zeros((1, 1)), "a": jnp.asarray([[5.0]]), "b": jnp.asarray([[2.0]])}
    dist = Gamma("tau", shape="a", rate="b")
    x = np.asarray(dist.sample(key, state, n=40000))
    np.testing.assert_allclose(x.mean(), 2.5, rtol=0.03)
    np.testing.assert_allclose(x.var(), 1.25, rtol=0.1)


def test_poisson_log_p_vs_scipy(rng):
    state = {
        "k": jnp.asarray(rng.poisson(3.0, size=(2, 5)).astype(float)),
        "rate": jnp.asarray([[3.0], [1.5]]),
    }
    dist = Poisson("k", rate="rate")
    got = float(dist.log_p(state))
    want = sps.poisson.logpmf(np.asarray(state["k"]), np.asarray(state["rate"])).sum()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_poisson_sample_moments(key):
    state = {"k": jnp.zeros((1, 1)), "rate": jnp.asarray([[4.0]])}
    dist = Poisson("k", rate="rate")
    x = np.asarray(dist.sample(key, state, n=40000))
    np.testing.assert_allclose(x.mean(), 4.0, rtol=0.03)


def test_uniform_log_p_and_sample(key):
    state = {"u": jnp.asarray([[0.5], [1.5]])}
    dist = Uniform("u", domain_response_lower=[0.0, 1.0], domain_response_upper=[1.0, 3.0])
    np.testing.assert_allclose(float(dist.log_p(state)), -np.log(1.0) - np.log(2.0), rtol=1e-5)
    x = np.asarray(dist.sample(key, state, n=5000))
    assert x.shape == (2, 5000)
    assert x[0].min() >= 0.0 and x[0].max() <= 1.0
    assert x[1].min() >= 1.0 and x[1].max() <= 3.0
    np.testing.assert_allclose(x[1].mean(), 2.0, atol=0.05)


def test_categorical_log_p_and_sample(key):
    prob = jnp.asarray([[0.2, 0.8], [0.5, 0.5], [0.9, 0.1]])
    state = {"z": jnp.asarray([[1], [0], [0]], dtype=jnp.int32), "prob": prob}
    dist = Categorical("z", prob="prob")
    want = np.log(0.8) + np.log(0.5) + np.log(0.9)
    np.testing.assert_allclose(float(dist.log_p(state)), want, rtol=1e-4)
    x = np.asarray(dist.sample(key, state, n=20000))
    assert x.shape == (3, 20000)
    np.testing.assert_allclose((x[0] == 1).mean(), 0.8, atol=0.02)
    np.testing.assert_allclose((x[2] == 0).mean(), 0.9, atol=0.02)


def test_null_distribution(normal_state):
    dist = NullDistribution("y", mean="mu", precision="Q")
    assert float(dist.log_p(normal_state)) == 0.0
    grad, hess = dist.grad_log_p(normal_state, "y")
    assert np.all(np.asarray(grad) == 0.0) and np.all(np.asarray(hess) == 0.0)
    assert dist.sample(None, normal_state) is None


def test_profile_likelihood_sanity(rng, key):
    """Perturbing true params lowers log_p (reference test_distribution.py:180-192)."""
    p = 3
    mu = rng.normal(size=(p, 1))
    state = {"y": None, "mu": jnp.asarray(mu), "Q": jnp.asarray(np.eye(p))}
    dist = Normal("y", mean="mu", precision="Q")
    state["y"] = dist.sample(key, state, n=200)
    base = float(dist.log_p(state))
    for factor in [10.0, 0.1]:
        pert = dict(state)
        pert["mu"] = state["mu"] + 3.0
        assert float(dist.log_p(pert)) < base


def test_param_list():
    dist = Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P", "tau"))
    assert dist.param_list == ["y", "beta", "X", "tau", "P"]


def test_type_validation():
    with pytest.raises(TypeError):
        Normal("y", mean=ScaledMatrix("P", "tau"), precision="Q")
    with pytest.raises(TypeError):
        Normal("y", mean="mu", precision=LinearCombination(form={"b": "X"}))
    with pytest.raises(TypeError):
        Gamma("tau", shape=ScaledMatrix("P", "t"), rate="b")
    with pytest.raises(TypeError):
        Categorical("z", prob=LinearCombination(form={"b": "X"}))


def test_mixture_normal_log_p(rng):
    """Normal with MixtureParameterVector mean + MixtureParameterMatrix precision."""
    n = 6
    alloc = np.array([0, 1, 0, 1, 1, 0], dtype=np.int32).reshape(-1, 1)
    state = {
        "y": jnp.asarray(rng.normal(size=(n, 1))),
        "means": jnp.asarray([[-1.0], [2.0]]),
        "lams": jnp.asarray([[1.0], [4.0]]),
        "Z": jnp.asarray(alloc),
    }
    dist = Normal(
        "y",
        mean=MixtureParameterVector(param="means", allocation="Z"),
        precision=MixtureParameterMatrix(param="lams", allocation="Z"),
    )
    got = float(dist.log_p(state))
    y = np.asarray(state["y"])[:, 0]
    m = np.asarray(state["means"])[alloc[:, 0], 0]
    lam = np.asarray(state["lams"])[alloc[:, 0], 0]
    want = sps.norm.logpdf(y, loc=m, scale=1 / np.sqrt(lam)).sum()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_finite_difference_cross_check(rng):
    """The FD parity methods agree with the analytic/autodiff gradients
    (the reference's own default machinery, distribution.py:124-198)."""
    p = 3
    A = rng.normal(size=(p, p))
    state = {
        "y": jnp.asarray(rng.normal(size=(p, 1))),
        "mu": jnp.asarray(rng.normal(size=(p, 1))),
        "Q": jnp.asarray(A @ A.T + p * np.eye(p)),
    }
    dist = Normal("y", mean="mu", precision="Q")
    grad, hess = dist.grad_log_p(state, "y")
    fd_grad = dist.grad_log_p_diff(state, "y", step_size=1e-2)
    np.testing.assert_allclose(grad, fd_grad, rtol=5e-2, atol=5e-2)
    fd_hess = dist.hessian_log_p_diff(state, "y", step_size=1e-1)
    np.testing.assert_allclose(hess, fd_hess, rtol=0.1, atol=0.3)


def test_categorical_aggregated_parity(rng):
    """aggregated=True reproduces the reference's multinomial-coefficient path."""
    x = np.asarray(rng.integers(0, 3, size=(2, 6)), dtype=np.int32)
    prob = np.asarray([[0.2, 0.3, 0.5], [0.6, 0.3, 0.1]])
    state = {"z": jnp.asarray(x), "prob": jnp.asarray(prob)}
    dist = Categorical("z", prob="prob", aggregated=True)
    got = float(dist.log_p(state))
    want = sum(
        sps.multinomial.logpmf(np.bincount(x[i], minlength=3), n=6, p=prob[i]) for i in range(2)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # sequence path unchanged by default
    d2 = Categorical("z", prob="prob")
    want_seq = sum(np.log(prob[i, x[i, j]]) for i in range(2) for j in range(6))
    np.testing.assert_allclose(float(d2.log_p(state)), want_seq, rtol=1e-4)


def test_scaled_matrix_log_p_path(rng):
    """The ScaledMatrix fast path (factoring only the unscaled penalty) equals the
    generic mvn computation on the assembled precision."""
    from openmcmc_tpu.linalg import gmrf as gm

    n = 10
    P = gm.precision_irregular(jnp.arange(n, dtype=jnp.float32))
    P = st.Banded(P.bands.at[0, 0].add(0.01))
    state = {
        "y": jnp.asarray(rng.normal(size=(n, 3))),
        "mu": jnp.asarray(rng.normal(size=(n, 1))),
        "P": P,
        "lam": jnp.asarray([[7.5]]),
    }
    dist = Normal("y", mean="mu", precision=ScaledMatrix("P", "lam"))
    got = float(dist.log_p(state))
    want = float(gm.mvn_log_pdf(state["y"], state["mu"], Q=st.scale(7.5, P)))
    np.testing.assert_allclose(got, want, rtol=2e-5)
    by_obs = dist.log_p(state, by_observation=True)
    want_obs = gm.mvn_log_pdf(state["y"], state["mu"], Q=st.scale(7.5, P), by_observation=True)
    np.testing.assert_allclose(by_obs, want_obs, rtol=2e-5)
