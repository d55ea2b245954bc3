"""Metropolis-Hastings family tests: posterior recovery for RandomWalk /
RandomWalkLoop / ManifoldMALA on a conjugate Normal-Normal target with a known
posterior, truncated proposals, acceptance accounting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmcmc_tpu.distributions import Normal
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.samplers import ManifoldMALA, RandomWalk, RandomWalkLoop


@pytest.fixture
def normal_target(rng):
    N = 40
    y = rng.normal(1.0, 1.0, N).reshape(1, N)
    mdl = Model(
        [
            Normal("y", mean="mu", precision="tau"),
            Normal("mu", mean="m0", precision="p0"),
        ]
    )
    state = {"y": y, "tau": np.eye(1), "m0": 0.0, "p0": np.eye(1) * 0.5}
    post_prec = N * 1.0 + 0.5
    post_mean = y.sum() / post_prec
    return mdl, state, post_mean, 1.0 / np.sqrt(post_prec)


@pytest.mark.parametrize(
    "make",
    [
        lambda mdl: RandomWalk("mu", mdl, step=0.5),
        lambda mdl: ManifoldMALA("mu", mdl, step=1.0),
    ],
    ids=["random_walk", "mmala"],
)
def test_posterior_recovery(normal_target, make):
    mdl, state, post_mean, post_sd = normal_target
    mcmc = MCMC(state, [make(mdl)], mdl, n_burn=300, n_iter=700, n_chains=16, seed=0)
    res = mcmc.run()
    mu = np.asarray(res.store["mu"])
    assert abs(mu.mean() - post_mean) < 4 * post_sd / np.sqrt(200)
    np.testing.assert_allclose(mu.std(), post_sd, rtol=0.15)
    acc = np.asarray(res.acceptance["mu"])
    assert np.all(acc > 5) and np.all(acc <= 100)


def test_random_walk_loop_updates_each_column(rng):
    """Column-at-a-time updates with independent accept/reject
    (reference metropolis_hastings.py:272-289)."""
    n_rep = 3
    y = rng.normal(0.5, 1.0, (1, n_rep))
    mdl = Model(
        [
            Normal("theta", mean="m0", precision="p0"),
        ]
    )
    state = {"theta": np.zeros((1, n_rep)), "m0": np.zeros((1, 1)), "p0": np.eye(1)}
    mcmc = MCMC(state, [RandomWalkLoop("theta", mdl, step=0.8)], mdl, n_burn=200, n_iter=600, n_chains=8, seed=1)
    res = mcmc.run()
    theta = np.asarray(res.store["theta"])  # (8, 600, 1, 3)
    # each column targets N(0, 1): check moments per column
    np.testing.assert_allclose(theta.mean((0, 1)), np.zeros((1, n_rep)), atol=0.15)
    np.testing.assert_allclose(theta.std((0, 1)), np.ones((1, n_rep)), rtol=0.15)
    # proposal counter: one per column per iteration
    assert int(np.asarray(res.stats["theta"]["proposal"])[0]) == n_rep * (200 + 600)


def test_truncated_random_walk_respects_domain(rng):
    mdl = Model([Normal("theta", mean="m0", precision="p0", domain_response_lower=0.0)])
    state = {"theta": np.full((1, 1), 0.5), "m0": np.zeros((1, 1)), "p0": np.eye(1)}
    sampler = RandomWalk("theta", mdl, step=0.5, domain_limits=np.array([[0.0, np.inf]]))
    mcmc = MCMC(state, [sampler], mdl, n_burn=100, n_iter=400, n_chains=8, seed=2)
    res = mcmc.run()
    theta = np.asarray(res.store["theta"])
    assert theta.min() >= 0.0
    # half-normal moments: mean sqrt(2/pi), sd sqrt(1 - 2/pi)
    np.testing.assert_allclose(theta.mean(), np.sqrt(2 / np.pi), atol=0.1)


def test_acceptance_statistics_counted(normal_target):
    mdl, state, _, _ = normal_target
    mcmc = MCMC(state, [RandomWalk("mu", mdl, step=0.5)], mdl, n_burn=50, n_iter=100, n_chains=4, seed=3)
    res = mcmc.run()
    stats = res.stats["mu"]
    assert np.all(np.asarray(stats["proposal"]) == 150)
    assert np.all(np.asarray(stats["accept"]) <= 150)
    assert np.all(np.asarray(stats["accept"]) > 0)


def test_mmala_uses_fisher_preconditioning(normal_target):
    """mMALA acceptance should be very high on a Gaussian target with step ~ 1."""
    mdl, state, _, _ = normal_target
    mcmc = MCMC(state, [ManifoldMALA("mu", mdl, step=1.0)], mdl, n_burn=100, n_iter=300, n_chains=4, seed=4)
    res = mcmc.run()
    assert np.all(np.asarray(res.acceptance["mu"]) > 60)


@pytest.mark.parametrize(
    "make,target",
    [
        (lambda mdl: RandomWalk("mu", mdl, step=5.0, adapt_step=True), 0.234),
        (lambda mdl: RandomWalk("mu", mdl, step=0.001, adapt_step=True), 0.234),
        (lambda mdl: ManifoldMALA("mu", mdl, step=0.05, adapt_step=True), 0.574),
    ],
    ids=["rw_too_big", "rw_too_small", "mmala_too_small"],
)
def test_step_adaptation_reaches_target(normal_target, make, target):
    """Robbins-Monro adaptation during burn-in drives acceptance toward the target,
    starting from badly mistuned step sizes."""
    mdl, state, post_mean, post_sd = normal_target
    mcmc = MCMC(state, [make(mdl)], mdl, n_burn=1500, n_iter=600, n_chains=8, seed=6)
    res = mcmc.run()
    acc = np.asarray(res.acceptance["mu"])
    # sampling-phase acceptance within a sensible band around the target
    assert np.all(acc / 100.0 > target - 0.17), acc
    assert np.all(acc / 100.0 < target + 0.3), acc
    mu = np.asarray(res.store["mu"])
    assert abs(mu.mean() - post_mean) < 5 * post_sd / np.sqrt(100)
    # adapted step stored per chain
    assert "log_step" in res.stats["mu"]


def test_random_walk_loop_adaptation(rng):
    n_rep = 2
    mdl = Model([Normal("theta", mean="m0", precision="p0")])
    state = {"theta": np.zeros((1, n_rep)), "m0": np.zeros((1, 1)), "p0": np.eye(1)}
    mcmc = MCMC(
        state,
        [RandomWalkLoop("theta", mdl, step=20.0, adapt_step=True)],
        mdl,
        n_burn=1500,
        n_iter=600,
        n_chains=8,
        seed=7,
    )
    res = mcmc.run()
    acc = np.asarray(res.acceptance["theta"]) / 100.0
    assert np.all(acc > 0.25) and np.all(acc < 0.7), acc


# ---------------------------------------------------------------------------
# vectorized RandomWalkLoop (column-factorized fast path)
# ---------------------------------------------------------------------------


def test_rwloop_vectorized_detection():
    import numpy as np

    from openmcmc_tpu.distributions import Gamma, NullDistribution
    from openmcmc_tpu.distributions.location_scale import Normal
    from openmcmc_tpu.parameters import LinearCombination, ScaledMatrix

    # Gamma prior + Null likelihood through the basis -> vectorizable
    mdl = Model(
        [
            NullDistribution("y", mean=LinearCombination(form={"beta": "B"}), precision=ScaledMatrix("P", "tau")),
            Gamma("omega", shape="a", rate="b", n_active="n_basis"),
        ]
    )
    s = RandomWalkLoop(
        "omega", mdl, step=0.1, active_count="n_basis", updated_names=["omega", "B"],
        state_update_function=lambda k, u, st_, i: (u, 0.0, 0.0),
        vector_state_update_function=lambda k, u, st_: u,
    )
    assert s._vectorized_ok()
    # same but no vector hook -> sequential fallback
    s2 = RandomWalkLoop(
        "omega", mdl, step=0.1, active_count="n_basis", updated_names=["omega", "B"],
        state_update_function=lambda k, u, st_, i: (u, 0.0, 0.0),
    )
    assert not s2._vectorized_ok()
    # REAL likelihood through the basis couples columns -> never vectorized
    mdl3 = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "B"}), precision=ScaledMatrix("P", "tau")),
            Gamma("omega", shape="a", rate="b", n_active="n_basis"),
        ]
    )
    s3 = RandomWalkLoop(
        "omega", mdl3, step=0.1, active_count="n_basis", updated_names=["omega", "B"],
        state_update_function=lambda k, u, st_, i: (u, 0.0, 0.0),
        vector_state_update_function=lambda k, u, st_: u,
    )
    assert not s3._vectorized_ok()


def test_rwloop_vectorized_matches_sequential():
    """Same stationary distribution: posterior moments of a truncated Gamma target
    agree between the sequential scan and the vectorized step."""
    import numpy as np
    import scipy.stats as sps

    from openmcmc_tpu.distributions import Gamma
    from openmcmc_tpu.mcmc import MCMC

    n_cols = 6
    mdl = Model([Gamma("omega", shape="a", rate="b")])
    state = {"omega": np.full((1, n_cols), 1.0), "a": 3.0, "b": 2.0}

    def build(vec):
        s = RandomWalkLoop("omega", mdl, step=0.6, domain_limits=np.asarray([[0.05, 8.0]]))
        if not vec:
            s._vec_ok = False  # force the sequential scan on the same model
        return MCMC(dict(state), [s], mdl, n_burn=200, n_iter=400, n_chains=64, seed=3 if vec else 4)

    res_v = build(True).run()
    res_s = build(False).run()
    dv = np.asarray(res_v.store["omega"]).reshape(-1)
    ds = np.asarray(res_s.store["omega"]).reshape(-1)
    # target: Gamma(3, 2) truncated to [0.05, 8] ~= Gamma(3, 2); compare to exact
    exact_mean = 1.5
    for d in (dv, ds):
        assert abs(d.mean() - exact_mean) < 0.05
    assert abs(dv.mean() - ds.mean()) < 0.05
    assert abs(dv.std() - ds.std()) < 0.06
    # acceptance counting identical in expectation; proposal counts exactly equal
    np.testing.assert_array_equal(
        np.asarray(res_v.stats["omega"]["proposal"]), np.asarray(res_s.stats["omega"]["proposal"])
    )
