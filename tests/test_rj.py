"""Reversible-jump tests, mirroring reference tests/test_reversible_jump.py.

The reference's knot-basis regression workload translated to the padded static-shape
convention: birth/death matched-coefficient transitions checked deterministically
(the reference forces RNG by monkeypatching; here the matched parts are deterministic
given the proposed state, and the noisy coefficient uses a tiny proposal scale), and
the prior-recovery chi-square test runs the full 4-sampler stack over vmapped chains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from openmcmc_tpu import padding
from openmcmc_tpu.distributions import Gamma, Normal, NullDistribution, Poisson, Uniform
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

from openmcmc_tpu.basis import GaussianKernelBasis

N_MAX = 8
N_DATA = 50
LIMITS = (-10.0, 10.0)

# shared Gaussian-kernel basis hooks (openmcmc_tpu.basis); recognized by the
# fused dispatcher, and identical math to reference tests/test_reversible_jump.py:23-38
_BASIS = GaussianKernelBasis()
make_basis = _BASIS.make
birth_fn = _BASIS.birth
death_fn = _BASIS.death


def move_fn(key, updates, state, param_index):
    updates = dict(updates)
    theta = updates.get("theta", state["theta"])
    omega = updates.get("omega", state["omega"])
    updates["B"] = make_basis(state["X"], theta, omega, state["n_basis"])
    return updates, jnp.asarray(0.0), jnp.asarray(0.0)


def pad_cols(vals, n_max=N_MAX):
    arr = np.zeros((1, n_max))
    arr[0, : len(vals)] = vals
    return jnp.asarray(arr)


@pytest.fixture
def rj_state(rng):
    k = 4
    theta = pad_cols([-10.0, -5.0, 5.0, 10.0])
    omega = pad_cols([1.0, 1.0, 1.0, 1.0])
    X = jnp.asarray(np.sort(rng.uniform(LIMITS[0], LIMITS[1], (N_DATA, 1)), axis=0))
    beta = np.zeros((N_MAX, 1))
    beta[:k] = 1.0
    state = {
        "X": X,
        "n_basis": jnp.asarray([[k]], dtype=jnp.int32),
        "theta": theta,
        "omega": omega,
        "beta": jnp.asarray(beta),
        "alloc_beta": jnp.zeros((N_MAX, 1), jnp.int32),
        "mu_beta": jnp.zeros((1, 1)),
        "tau_beta": jnp.full((1, 1), 1.0 / 4.0),
        "rho": jnp.asarray([[3.0]]),
        "a_omega": jnp.asarray([[3.0]]),
        "b_omega": jnp.asarray([[2.0]]),
        "y": jnp.asarray(rng.normal(size=(N_DATA, 1))),
        "P": st.Diagonal(jnp.ones(N_DATA)),
        "tau_y": jnp.asarray([[100.0]]),
    }
    state["B"] = make_basis(X, theta, omega, state["n_basis"])
    return state


@pytest.fixture
def rj_model():
    return Model(
        [
            NullDistribution("y", mean=LinearCombination(form={"beta": "B"}), precision=ScaledMatrix("P", "tau_y")),
            Normal(
                "beta",
                mean=MixtureParameterVector(param="mu_beta", allocation="alloc_beta"),
                precision=MixtureParameterMatrix(param="tau_beta", allocation="alloc_beta"),
                n_active="n_basis",
            ),
            Poisson("n_basis", rate="rho"),
            Uniform("theta", domain_response_lower=LIMITS[0], domain_response_upper=LIMITS[1], n_active="n_basis"),
            Gamma("omega", shape="a_omega", rate="b_omega", n_active="n_basis"),
        ]
    )


def make_rj(model, scale=1.0, limits=list(LIMITS)):
    return ReversibleJump(
        "n_basis",
        model,
        associated_params=["theta", "omega"],
        n_max=N_MAX,
        state_birth_function=birth_fn,
        state_death_function=death_fn,
        matching_params={"variable": "beta", "matrix": "B", "scale": scale, "limits": limits},
    )


# ---------------------------------------------------------------------------
# padding utilities
# ---------------------------------------------------------------------------


def test_padding_append_delete():
    arr = pad_cols([1.0, 2.0, 3.0])
    out = padding.append(arr, jnp.asarray([[9.0]]), 3, axis=1)
    np.testing.assert_allclose(np.asarray(out)[0, :5], [1, 2, 3, 9, 0])
    out2 = padding.delete(out, 1, 4, axis=1)
    np.testing.assert_allclose(np.asarray(out2)[0, :5], [1, 3, 9, 0, 0])
    out3 = padding.delete(out, 3, 4, axis=1)
    np.testing.assert_allclose(np.asarray(out3)[0, :5], [1, 2, 3, 0, 0])


def test_padding_insert_identity_column():
    G = jnp.asarray(np.arange(9.0).reshape(3, 3))
    F = padding.insert_identity_column(G, 1)
    want = np.array([[0.0, 0.0, 1.0], [3.0, 1.0, 4.0], [6.0, 0.0, 7.0]])
    np.testing.assert_allclose(F, want)


def test_masked_distributions(rj_state, rj_model):
    """Masked log_p equals the dense computation on the active sub-arrays."""
    state = rj_state
    k = 4
    # Uniform: k * -log(range)
    got = float(rj_model["theta"].log_p(state))
    np.testing.assert_allclose(got, -k * np.log(20.0), rtol=1e-5)
    # Gamma over active columns
    got_g = float(rj_model["omega"].log_p(state))
    want_g = sps.gamma.logpdf(np.asarray(state["omega"])[0, :k], 3.0, scale=1 / 2.0).sum()
    np.testing.assert_allclose(got_g, want_g, rtol=1e-4)
    # Normal beta prior over active rows
    got_b = float(rj_model["beta"].log_p(state))
    want_b = sps.norm.logpdf(np.asarray(state["beta"])[:k, 0], 0.0, 2.0).sum()
    np.testing.assert_allclose(got_b, want_b, rtol=1e-4)
    # masked gradient: zero on inactive rows, identity Hessian there
    grad, hess = rj_model["beta"].grad_log_p(state, "beta")
    assert np.all(np.asarray(grad)[k:] == 0.0)
    np.testing.assert_allclose(np.asarray(hess)[k:, k:], np.eye(N_MAX - k), rtol=1e-6)


# ---------------------------------------------------------------------------
# matched transitions (reference tests :347-434)
# ---------------------------------------------------------------------------


def _birth_prop_state(state, new_knot, new_omega=1.0):
    k = int(np.asarray(state["n_basis"])[0, 0])
    prop = dict(state)
    prop["n_basis"] = state["n_basis"] + 1
    prop["theta"] = padding.append(state["theta"], jnp.asarray([[new_knot]]), k, axis=1)
    prop["omega"] = padding.append(state["omega"], jnp.asarray([[new_omega]]), k, axis=1)
    prop["B"] = make_basis(prop["X"], prop["theta"], prop["omega"], prop["n_basis"])
    return prop


def test_birth_overlap(rj_state, rj_model, key):
    """New knot coinciding with an existing one: the coefficient splits 50/50 and
    log|det F| = log(0.5) (reference test :347-375)."""
    rj = make_rj(rj_model, scale=1e-6)
    prop = _birth_prop_state(rj_state, 10.0)
    prop2, logp_fwd, logp_rev = rj.matched_birth_transition(key, rj_state, prop, 0.0, 0.0)
    beta = np.asarray(prop2["beta"])[:, 0]
    # the f32 stabilization ridge (1e-6 on the active Gram block) perturbs the exact
    # 50/50 split of the singular duplicate-column system at the ~2e-3 level
    np.testing.assert_allclose(beta[3], 0.5, atol=0.03)
    np.testing.assert_allclose(beta[4], 0.5, atol=0.03)
    np.testing.assert_allclose(beta.sum(), 4.0, atol=0.03)
    np.testing.assert_allclose(float(logp_rev), np.log(0.5), atol=0.03)


def test_birth_no_overlap(rj_state, rj_model, key):
    """New knot far from all others: existing coefficients unchanged, new ~ 0,
    log|det F| = 0 (reference test :378-394)."""
    rj = make_rj(rj_model, scale=1e-6)
    prop = _birth_prop_state(rj_state, 0.0)
    prop2, logp_fwd, logp_rev = rj.matched_birth_transition(key, rj_state, prop, 0.0, 0.0)
    beta = np.asarray(prop2["beta"])[:, 0]
    np.testing.assert_allclose(beta[4], 0.0, atol=1e-3)
    np.testing.assert_allclose(beta.sum(), 4.0, atol=1e-3)
    np.testing.assert_allclose(float(logp_rev), 0.0, atol=1e-3)


def _death_prop_state(state, deletion_index):
    k = int(np.asarray(state["n_basis"])[0, 0])
    prop = dict(state)
    prop["n_basis"] = state["n_basis"] - 1
    prop["theta"] = padding.delete(state["theta"], deletion_index, k, axis=1)
    prop["omega"] = padding.delete(state["omega"], deletion_index, k, axis=1)
    prop["B"] = make_basis(prop["X"], prop["theta"], prop["omega"], prop["n_basis"])
    return prop


def test_death_overlap(rj_state, rj_model, key):
    """Deleting one of two coincident knots: the survivor absorbs both coefficients
    (reference test :397-414)."""
    state = dict(rj_state)
    state["theta"] = pad_cols([-10.0, -5.0, 10.0, 10.0])
    state["B"] = make_basis(state["X"], state["theta"], state["omega"], state["n_basis"])
    rj = make_rj(rj_model, scale=1.0)
    prop = _death_prop_state(state, 3)
    prop2, logp_fwd, logp_rev = rj.matched_death_transition(key, state, prop, 0.0, 0.0, jnp.asarray(3))
    beta = np.asarray(prop2["beta"])[:, 0]
    # duplicate-column systems are exactly singular: the f32 Cholesky gram solve with
    # its 1e-6 stabilization ridge lands within ~1% of the exact 50/50 split
    np.testing.assert_allclose(beta[2], 2.0, atol=0.03)
    np.testing.assert_allclose(beta.sum(), 4.0, atol=0.03)
    np.testing.assert_allclose(float(logp_fwd), np.log(0.5), atol=0.03)
    # reverse density: truncnorm logpdf of the deleted coeff (here 0) at scale 1
    np.testing.assert_allclose(float(logp_rev), sps.truncnorm.logpdf(0.0, -10, 10), atol=1e-3)


def test_death_no_overlap(rj_state, rj_model, key):
    """Deleting a spatially distinct knot with zero coefficient: remaining
    coefficients unchanged, log|det F| = 0 (reference test :417-434)."""
    state = dict(rj_state)
    beta = np.zeros((N_MAX, 1))
    beta[:3] = 1.0
    state["beta"] = jnp.asarray(beta)
    rj = make_rj(rj_model, scale=1.0)
    prop = _death_prop_state(state, 3)
    prop2, logp_fwd, logp_rev = rj.matched_death_transition(key, state, prop, 0.0, 0.0, jnp.asarray(3))
    np.testing.assert_allclose(np.asarray(prop2["beta"])[:3], beta[:3], atol=1e-3)
    np.testing.assert_allclose(float(logp_fwd), 0.0, atol=1e-3)
    np.testing.assert_allclose(float(logp_rev), sps.truncnorm.logpdf(0.0, -10, 10), atol=1e-3)


# ---------------------------------------------------------------------------
# full-stack prior recovery (reference test :255-278)
# ---------------------------------------------------------------------------


def test_prior_recovery(rj_state, rj_model):
    """Null likelihood: the 4-sampler RJ stack must recover the Poisson prior on the
    number of knots (chi-square goodness of fit, pooled over chains)."""
    samplers = [
        ManifoldMALA("beta", rj_model, step=0.5, active_count="n_basis"),
        RandomWalkLoop(
            "theta",
            rj_model,
            step=0.5,
            domain_limits=np.asarray([LIMITS]),
            state_update_function=move_fn,
            active_count="n_basis",
            updated_names=["theta", "B"],
        ),
        RandomWalkLoop(
            "omega",
            rj_model,
            step=0.1,
            domain_limits=np.asarray([[0.5, 2.0]]),
            state_update_function=move_fn,
            active_count="n_basis",
            updated_names=["omega", "B"],
        ),
        make_rj(rj_model, scale=1.0),
    ]
    mcmc = MCMC(rj_state, samplers, rj_model, n_burn=100, n_iter=1200, n_chains=8, seed=5)
    mcmc.store_names = ["n_basis"]
    res = mcmc.run()
    draws = np.asarray(res.store["n_basis"]).reshape(8, -1)[:, ::25]  # thin
    samples = draws.flatten()
    assert samples.min() >= 1 and samples.max() <= N_MAX

    num = np.arange(1, N_MAX + 1)
    expected = samples.size * sps.poisson.pmf(num, 3.0)
    observed, _ = np.histogram(samples, bins=np.linspace(0.5, N_MAX + 0.5, N_MAX + 1))
    big = expected >= 5
    obs_t = observed[big]
    exp_t = expected[big] * obs_t.sum() / expected[big].sum()
    _, p_val = sps.chisquare(obs_t, exp_t)
    assert p_val >= 0.001, (p_val, observed, expected.round(1))


def test_prior_recovery_vectorized_loops(rj_state, rj_model):
    """Same prior-recovery stack with the VECTORIZED RandomWalkLoop fast path (the
    hot configuration used by bench_all): the Poisson prior on n_knots must still
    be recovered."""

    def move_vec(key, updates, state):
        updates = dict(updates)
        theta = updates.get("theta", state["theta"])
        omega = updates.get("omega", state["omega"])
        updates["B"] = make_basis(state["X"], theta, omega, state["n_basis"])
        return updates

    loops = []
    for name, step, limits in [("theta", 0.5, LIMITS), ("omega", 0.1, (0.5, 2.0))]:
        s = RandomWalkLoop(
            name,
            rj_model,
            step=step,
            domain_limits=np.asarray([limits]),
            state_update_function=move_fn,
            vector_state_update_function=move_vec,
            active_count="n_basis",
            updated_names=[name, "B"],
        )
        assert s._vectorized_ok()
        loops.append(s)
    samplers = [
        ManifoldMALA("beta", rj_model, step=0.5, active_count="n_basis"),
        *loops,
        make_rj(rj_model, scale=1.0),
    ]
    mcmc = MCMC(rj_state, samplers, rj_model, n_burn=100, n_iter=1200, n_chains=8, seed=11)
    mcmc.store_names = ["n_basis"]
    res = mcmc.run()
    draws = np.asarray(res.store["n_basis"]).reshape(8, -1)[:, ::25]
    samples = draws.flatten()
    assert samples.min() >= 1 and samples.max() <= N_MAX

    num = np.arange(1, N_MAX + 1)
    expected = samples.size * sps.poisson.pmf(num, 3.0)
    observed, _ = np.histogram(samples, bins=np.linspace(0.5, N_MAX + 0.5, N_MAX + 1))
    big = expected >= 5
    obs_t = observed[big]
    exp_t = expected[big] * obs_t.sum() / expected[big].sum()
    _, p_val = sps.chisquare(obs_t, exp_t)
    assert p_val >= 0.001, (p_val, observed, expected.round(1))
