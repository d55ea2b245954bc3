"""Fused reversible-jump engine: dispatch matching + interpret-mode pipeline.

The statistical parity of the kernel (prior recovery: with a Null likelihood the
chain targets the prior, so the count marginal is a [1, n_max]-truncated
Poisson(rho)) is TPU-gated in ``test_fused_rj_tpu``; on CPU the interpret tests
run the deterministic kernel pipeline and the matcher tests pin down exactly
which configurations dispatch (reference workload:
reference tests/test_reversible_jump.py prior-recovery configuration).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from openmcmc_tpu.basis import GaussianKernelBasis
from openmcmc_tpu.distributions import Gamma, Normal, NullDistribution, Poisson, Uniform
from openmcmc_tpu.fused.dispatch import match_fused_engine
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import (
    LinearCombination,
    MixtureParameterMatrix,
    MixtureParameterVector,
    ScaledMatrix,
)
from openmcmc_tpu.samplers import ManifoldMALA, RandomWalkLoop, ReversibleJump

N_MAX = 20


def build_rj_mcmc(n_chains=64, n_iter=8, n_burn=2, basis=None, rho=8.0, seed=0):
    """The benchmark prior-recovery configuration (bench_all.reversible_jump)."""
    g = basis if basis is not None else GaussianKernelBasis()
    rng = np.random.default_rng(0)
    n_data = 50
    X = np.sort(rng.uniform(-10, 10, (n_data, 1)), axis=0)
    k0 = 4
    theta = np.zeros((1, N_MAX)); theta[0, :k0] = rng.uniform(-10, 10, k0)
    omega = np.zeros((1, N_MAX)); omega[0, :k0] = 1.0
    beta = np.zeros((N_MAX, 1)); beta[:k0] = 1.0
    state = {
        "X": X, "y": rng.normal(size=(n_data, 1)),
        "n_basis": np.array([[k0]], dtype=np.int32),
        "theta": theta, "omega": omega, "beta": beta,
        "alloc_beta": np.zeros((N_MAX, 1), dtype=np.int32),
        "mu_beta": 0.0, "tau_beta": 0.25, "rho": rho,
        "a_omega": 3.0, "b_omega": 2.0,
        "P": st.Diagonal(jnp.ones(n_data)), "tau_y": 100.0,
    }
    state["B"] = np.asarray(g.make(jnp.asarray(X), jnp.asarray(theta), jnp.asarray(omega), k0))
    mdl = Model(
        [
            NullDistribution("y", mean=LinearCombination(form={"beta": "B"}), precision=ScaledMatrix("P", "tau_y")),
            Normal("beta", mean=MixtureParameterVector("mu_beta", "alloc_beta"),
                   precision=MixtureParameterMatrix("tau_beta", "alloc_beta"), n_active="n_basis"),
            Poisson("n_basis", rate="rho"),
            Uniform("theta", domain_response_lower=-10.0, domain_response_upper=10.0, n_active="n_basis"),
            Gamma("omega", shape="a_omega", rate="b_omega", n_active="n_basis"),
        ]
    )
    samplers = [
        ManifoldMALA("beta", mdl, step=0.5, active_count="n_basis"),
        RandomWalkLoop("theta", mdl, step=0.1, domain_limits=np.asarray([[-10.0, 10.0]]),
                       state_update_function=g.move, vector_state_update_function=g.move_vec,
                       active_count="n_basis", updated_names=["theta", "B"]),
        RandomWalkLoop("omega", mdl, step=0.1, domain_limits=np.asarray([[0.5, 2.0]]),
                       state_update_function=g.move, vector_state_update_function=g.move_vec,
                       active_count="n_basis", updated_names=["omega", "B"]),
        ReversibleJump("n_basis", mdl, associated_params=["theta", "omega"], n_max=N_MAX,
                       state_birth_function=g.birth, state_death_function=g.death,
                       matching_params={"variable": "beta", "matrix": "B", "scale": 1.0, "limits": [-10.0, 10.0]}),
    ]
    m = MCMC(state, samplers, mdl, n_burn=n_burn, n_iter=n_iter, n_chains=n_chains, seed=seed)
    m.store_names = ["n_basis"]
    return m


def test_match_rj():
    m = build_rj_mcmc()
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_rj"


def test_no_match_with_plain_function_hooks():
    """User-supplied (unrecognizable) basis hooks must fall back to generic."""
    g = GaussianKernelBasis()
    m = build_rj_mcmc(basis=g)

    def birth(key, cur, prop):  # same math, but opaque to the matcher
        return g.birth(key, cur, prop)

    m.samplers[3].state_birth_function = birth
    assert match_fused_engine(m) is None


def test_store_names_gating():
    """Round-3: beta/theta/omega draws stream from the kernel (3*n_max extra rows);
    derived state (the basis matrix B) still requires the generic driver, as does a
    streamed-buffer footprint above the HBM cap."""
    m = build_rj_mcmc()
    m.store_names = ["n_basis", "theta"]
    assert match_fused_engine(m) is not None
    m.store_names = ["n_basis", "B"]
    assert match_fused_engine(m) is None
    m.store_names = ["n_basis", "beta", "theta", "omega"]
    m.n_iter = 100000  # past the 4 GiB streamed-draw cap at 1024-padded chains
    assert match_fused_engine(m) is None


def test_interpret_streamed_params():
    """Streaming mode: padded beta/theta/omega draws come back with the generic
    state-shape conventions, padding entries exactly zero beyond each chain's
    count, and the count column identical to a non-streamed run."""
    m = build_rj_mcmc(n_chains=64, n_iter=6, n_burn=2)
    m.store_names = ["n_basis", "beta", "theta", "omega"]
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert res.engine == "fused_rj"
    assert res.store["beta"].shape == (64, 6, N_MAX, 1)
    assert res.store["theta"].shape == (64, 6, 1, N_MAX)
    assert res.store["omega"].shape == (64, 6, 1, N_MAX)
    nb = np.asarray(res.store["n_basis"]).reshape(64, 6)
    for name, arr in (("beta", np.asarray(res.store["beta"]).reshape(64, 6, N_MAX)),
                      ("theta", np.asarray(res.store["theta"]).reshape(64, 6, N_MAX)),
                      ("omega", np.asarray(res.store["omega"]).reshape(64, 6, N_MAX))):
        assert np.isfinite(arr).all(), name
        idx = np.arange(N_MAX)[None, None, :]
        assert np.all(arr[idx >= nb[..., None]] == 0.0), name

    m2 = build_rj_mcmc(n_chains=64, n_iter=6, n_burn=2)
    with pltpu.force_tpu_interpret_mode():
        res2 = m2.run(engine="auto")
    np.testing.assert_array_equal(np.asarray(res.store["n_basis"]), np.asarray(res2.store["n_basis"]))


def test_no_match_with_mismatched_rw_limits():
    """Theta RW truncation must coincide with the Uniform prior domain."""
    m = build_rj_mcmc()
    m.samplers[1].domain_limits = np.asarray([[-9.0, 10.0]])
    assert match_fused_engine(m) is None


def test_interpret_engine_run():
    """engine='auto' dispatches the RJ kernel (interpret mode on CPU) and returns the
    generic driver's result contract: store key, log_post, per-sampler stats."""
    m = build_rj_mcmc(n_chains=64, n_iter=6, n_burn=2)
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert res.engine == "fused_rj"
    assert res.store["n_basis"].shape == (64, 6, 1, 1)
    assert res.store["n_basis"].dtype == jnp.int32
    nb = np.asarray(res.store["n_basis"])
    assert nb.min() >= 1 and nb.max() <= N_MAX
    assert np.isfinite(np.asarray(res.log_post)).all()
    assert set(res.stats.keys()) == {"beta", "theta", "omega", "n_basis"}
    for name in ("beta", "theta", "omega", "n_basis"):
        assert set(res.stats[name]) >= {"accept", "proposal"}
        assert res.stats[name]["accept"].shape == (64,)
    # acceptance_rate() works on the fused stats pytree
    assert set(res.acceptance.keys()) == {"beta", "theta", "omega", "n_basis"}


@pytest.mark.tpu
@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu", reason="statistical test requires the real TPU PRNG"
)
def test_fused_rj_prior_recovery_tpu():
    """With a Null likelihood the posterior IS the prior: the count marginal must
    match the [1, n_max]-truncated Poisson(rho) (reference
    tests/test_reversible_jump.py prior-recovery test, chi-square there)."""
    from scipy.stats import poisson

    m = build_rj_mcmc(n_chains=512, n_iter=2000, n_burn=500)
    res = m.run(engine="fused")
    assert res.engine == "fused_rj"
    nb = np.asarray(res.store["n_basis"]).reshape(512, -1)[:, ::10]
    ks = np.arange(1, N_MAX + 1)
    pmf = poisson.pmf(ks, 8.0)
    pmf = pmf / pmf.sum()
    exact_mean = float((ks * pmf).sum())
    exact_sd = float(np.sqrt((ks**2 * pmf).sum() - exact_mean**2))
    mean = nb.mean()
    # generous MC + mixing tolerance; catches gross distribution errors
    assert abs(mean - exact_mean) < 0.25, (mean, exact_mean)
    assert abs(nb.std() - exact_sd) < 0.35, (nb.std(), exact_sd)


def test_fused_rj_resume_continues_exactly():
    """Resume from a streamed fused run: under the deterministic stub the chained
    halves equal the full run exactly (state, counters); a count-only fused result
    lacks the padded parameter finals and falls back to generic."""
    def make(n_iter, seed):
        m = build_rj_mcmc(n_chains=32, n_iter=n_iter, n_burn=2, seed=seed)
        m.store_names = ["n_basis", "beta", "theta", "omega"]
        return m

    with pltpu.force_tpu_interpret_mode():
        full = make(6, 0).run(engine="auto")
        seg1 = make(3, 1).run(engine="auto")
        seg2 = make(3, 2).run(engine="fused", resume=seg1)
    assert seg2.engine == "fused_rj"
    for name in ("n_basis", "beta", "theta", "omega"):
        cat = np.concatenate([np.asarray(seg1.store[name]), np.asarray(seg2.store[name])], axis=1)
        np.testing.assert_allclose(np.asarray(full.store[name]), cat, rtol=1e-5, err_msg=name)
    for name in ("beta", "theta", "omega", "n_basis"):
        np.testing.assert_array_equal(np.asarray(full.stats[name]["accept"]),
                                      np.asarray(seg2.stats[name]["accept"]), err_msg=name)

    # count-only result: no padded finals -> fused resume impossible
    m = build_rj_mcmc(n_chains=32, n_iter=3, n_burn=2)
    with pltpu.force_tpu_interpret_mode():
        count_only = m.run(engine="auto")
    m2 = build_rj_mcmc(n_chains=32, n_iter=3, n_burn=2)
    from openmcmc_tpu.fused.dispatch import match_fused_engine as mfe
    assert mfe(m2, resume=count_only) is None

# ---------------------------------------------------------------------------
# likelihood mode: y ~ N(B beta, (tau I)^-1) + conjugate NormalGamma(tau)
# (the reference's matched-transition REGRESSION use case,
# reference tests/test_reversible_jump.py:281-434)
# ---------------------------------------------------------------------------

N_MAX_REG = 8


def build_rj_regression_mcmc(n_chains=64, n_iter=6, n_burn=2, seed=0, **state_over):
    g = GaussianKernelBasis()
    rng = np.random.default_rng(0)
    n_data = 30
    X = np.sort(rng.uniform(-10, 10, (n_data, 1)), axis=0)
    f = sum(b * np.exp(-0.5 * (X[:, 0] - t) ** 2) / np.sqrt(2 * np.pi)
            for t, b in ((-4.0, 4.0), (3.0, 6.0)))
    y = (f + rng.normal(0, 0.1, n_data)).reshape(n_data, 1)
    k0 = 3
    theta = np.zeros((1, N_MAX_REG)); theta[0, :k0] = rng.uniform(-10, 10, k0)
    omega = np.zeros((1, N_MAX_REG)); omega[0, :k0] = 1.0
    beta = np.zeros((N_MAX_REG, 1)); beta[:k0] = 1.0
    state = {
        "X": X, "y": y, "n_basis": np.array([[k0]], np.int32),
        "theta": theta, "omega": omega, "beta": beta,
        "alloc_beta": np.zeros((N_MAX_REG, 1), np.int32),
        "mu_beta": 0.0, "tau_beta": 0.25, "rho": 3.0,
        "a_omega": 3.0, "b_omega": 2.0,
        "P": st.Diagonal(jnp.ones(n_data)), "tau_y": 1.0,
        "a_tau": 2.0, "b_tau": 0.1,
    }
    state.update(state_over)
    state["B"] = np.asarray(g.make(jnp.asarray(X), jnp.asarray(theta), jnp.asarray(omega), k0))
    mdl = Model([
        Normal("y", mean=LinearCombination(form={"beta": "B"}), precision=ScaledMatrix("P", "tau_y")),
        Normal("beta", mean=MixtureParameterVector("mu_beta", "alloc_beta"),
               precision=MixtureParameterMatrix("tau_beta", "alloc_beta"), n_active="n_basis"),
        Poisson("n_basis", rate="rho"),
        Uniform("theta", domain_response_lower=-10.0, domain_response_upper=10.0, n_active="n_basis"),
        Gamma("omega", shape="a_omega", rate="b_omega", n_active="n_basis"),
        Gamma("tau_y", shape="a_tau", rate="b_tau"),
    ])
    from openmcmc_tpu.samplers import NormalGamma

    samplers = [
        ManifoldMALA("beta", mdl, step=0.5, active_count="n_basis"),
        RandomWalkLoop("theta", mdl, step=0.1, domain_limits=np.asarray([[-10.0, 10.0]]),
                       state_update_function=g.move, vector_state_update_function=g.move_vec,
                       active_count="n_basis", updated_names=["theta", "B"]),
        RandomWalkLoop("omega", mdl, step=0.1, domain_limits=np.asarray([[0.5, 2.0]]),
                       state_update_function=g.move, vector_state_update_function=g.move_vec,
                       active_count="n_basis", updated_names=["omega", "B"]),
        ReversibleJump("n_basis", mdl, associated_params=["theta", "omega"], n_max=N_MAX_REG,
                       state_birth_function=g.birth, state_death_function=g.death,
                       matching_params={"variable": "beta", "matrix": "B", "scale": 1.0, "limits": [-10.0, 10.0]}),
        NormalGamma("tau_y", mdl),
    ]
    m = MCMC(state, samplers, mdl, n_burn=n_burn, n_iter=n_iter, n_chains=n_chains, seed=seed)
    m.store_names = ["n_basis", "tau_y"]
    return m


def test_match_rj_likelihood():
    m = build_rj_regression_mcmc()
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_rj"


def test_rj_likelihood_no_match_nonidentity_penalty():
    """The kernel's residual quadratic is unweighted: a non-identity noise
    penalty must fall back to generic."""
    m = build_rj_regression_mcmc(P=st.Diagonal(jnp.full(30, 2.0)))
    assert match_fused_engine(m) is None


def test_rj_likelihood_no_match_fitted_on_basis():
    """A fitted-value request whose predictor reads B must fall back: the kernel
    never streams the basis, and data holds only the stale initial B."""
    m = build_rj_regression_mcmc()
    m.model.response = {"y": "mean"}
    assert match_fused_engine(m) is None


def test_interpret_likelihood_engine_run():
    m = build_rj_regression_mcmc(n_chains=64, n_iter=6, n_burn=2)
    m.store_names = ["n_basis", "tau_y", "beta", "theta", "omega"]
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert res.engine == "fused_rj"
    assert res.store["tau_y"].shape == (64, 6, 1, 1)
    assert np.asarray(res.store["tau_y"]).min() > 0.0
    assert res.store["beta"].shape == (64, 6, N_MAX_REG, 1)
    assert np.isfinite(np.asarray(res.log_post)).all()
    assert set(res.stats.keys()) == {"beta", "theta", "omega", "n_basis", "tau_y"}
    assert res.stats["tau_y"] == {}  # conjugate: no scanned statistics
    assert set(res.acceptance.keys()) == {"beta", "theta", "omega", "n_basis"}


def test_rj_likelihood_resume_continues_exactly():
    def make(n_iter, seed):
        m = build_rj_regression_mcmc(n_chains=32, n_iter=n_iter, n_burn=2, seed=seed)
        m.store_names = ["n_basis", "tau_y", "beta", "theta", "omega"]
        return m

    with pltpu.force_tpu_interpret_mode():
        full = make(6, 0).run(engine="auto")
        seg1 = make(3, 1).run(engine="auto")
        seg2 = make(3, 2).run(engine="fused", resume=seg1)
    assert seg2.engine == "fused_rj"
    for name in ("n_basis", "tau_y", "beta", "theta", "omega"):
        cat = np.concatenate([np.asarray(seg1.store[name]), np.asarray(seg2.store[name])], axis=1)
        np.testing.assert_allclose(np.asarray(full.store[name]), cat, rtol=1e-5, err_msg=name)


@pytest.mark.tpu
@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu", reason="statistical test requires the real TPU PRNG"
)
def test_fused_rj_likelihood_posterior_tpu():
    """Likelihood-mode posterior on the real TPU PRNG vs CPU-generic ground truth
    (pinned from a 96-chain x 800-iter generic run of this exact configuration:
    k = 3.97 +- 1.26, tau = 77.3 +- 22.3; acceptance beta 97.7 / theta 71.7 /
    omega 50.2 / n_basis 14.2)."""
    m = build_rj_regression_mcmc(n_chains=1024, n_iter=800, n_burn=300, seed=5)
    res = m.run(engine="fused")
    assert res.engine == "fused_rj"
    k = np.asarray(res.store["n_basis"]).reshape(-1)
    tau = np.asarray(res.store["tau_y"]).reshape(-1)
    assert abs(k.mean() - 3.97) < 0.3, k.mean()
    assert abs(tau.mean() - 77.3) < 6.0, tau.mean()
    assert abs(tau.std() - 22.3) < 6.0, tau.std()
    acc = {n: float(np.asarray(v).mean()) for n, v in res.acceptance.items()}
    for name, want in (("beta", 97.7), ("theta", 71.7), ("omega", 50.2), ("n_basis", 14.2)):
        assert abs(acc[name] - want) < 2.5, (name, acc[name], want)


def test_rj_likelihood_no_match_replicated_response():
    """Regression (round 4): a replicate-column y (n, r > 1) must fall back to
    generic -- the kernel's residual quadratic reads one response column, and
    the old reshape(-1) silently concatenated the columns into a wrong-length
    vector."""
    rng = np.random.default_rng(3)
    m = build_rj_regression_mcmc(y=rng.normal(size=(30, 2)))
    assert match_fused_engine(m) is None
