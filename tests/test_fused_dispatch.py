"""Automatic fused-engine dispatch (MCMC.run(engine="auto"))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from openmcmc_tpu.distributions import Gamma, Normal
from openmcmc_tpu.fused.dispatch import match_fused_engine
from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import LinearCombination, ScaledMatrix
from openmcmc_tpu.samplers import NormalGamma, NormalNormal, RandomWalk


def _smoother_mcmc(rng, n_time=16, n_chains=8, **kw):
    s = np.linspace(0.0, 10.0, n_time)
    P = gmrf.precision_irregular(jnp.asarray(s))
    P = st.Banded(P.bands.at[0, 0].add(0.001))
    y = np.sin(s) + rng.normal(0.0, 0.5, n_time)
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
        "y": y, "b": y.copy(), "mu": np.zeros(n_time), "lambda": 10.0, "P_lambda": P,
        "a_lam": 10.0, "b_lam": 1.0, "tau": 1.0, "P_tau": st.Diagonal(jnp.ones(n_time)),
        "a_tau": 1.0, "b_tau": 1.0,
    }
    return MCMC(state, samplers, mdl, n_burn=4, n_iter=6, n_chains=n_chains, seed=0, **kw)


def _linreg_mcmc(rng, n_chains=8):
    N = 30
    X = np.stack([np.ones(N), np.sort(rng.random(N))], 1)
    y = X @ np.array([2.0, 0.5]) + rng.normal(0, 0.1, N)
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
        "y": y, "X": X, "beta": [0.0, 0.0], "P_tau": st.Diagonal(jnp.ones(N)), "tau": 1.0,
        "P_lambda": st.Diagonal(jnp.ones(2)), "mu": [0.0, 0.0], "lambda": 0.01,
        "a_tau": 1e-3, "b_tau": 1e-3, "a_lambda": 1e-3, "b_lambda": 1e-3,
    }
    return MCMC(state, samplers, mdl, n_burn=4, n_iter=6, n_chains=n_chains, seed=0)


def _rw_mcmc():
    mdl = Model([Normal("y", mean="h", precision="tau"), Normal("h", mean="mu", precision="lambda")])
    state = {
        "y": np.array([[150.0, 155.0, 190.0, 160.0, 173.0]]),
        "h": 200.0, "tau": jnp.eye(1) / 200.0, "mu": 160.0, "lambda": jnp.eye(1) / 100.0,
    }
    return MCMC(state, [RandomWalk("h", mdl, step=5.0)], mdl, n_burn=4, n_iter=6, n_chains=8, seed=0)


def test_matchers_identify_engines(rng):
    assert match_fused_engine(_smoother_mcmc(rng)).engine_name == "fused_smoother_spectral"
    assert match_fused_engine(_linreg_mcmc(rng)).engine_name == "fused_linreg"
    assert match_fused_engine(_rw_mcmc()).engine_name == "fused_random_walk"


def test_non_matching_configs(rng):
    # extreme thinning no longer blocks the match: kernels thin IN-KERNEL
    # (layout.store_index strides the store DMA, draw buffer O(n_iter)); the
    # round-4 65536-sweep storage cap is gone (VERDICT r5 item 4)
    m = _smoother_mcmc(rng, n_thin=20000)
    assert match_fused_engine(m) is not None
    # a NEGATIVE noise-penalty diagonal is invalid for the kernel
    m2 = _smoother_mcmc(rng)
    m2.data["P_tau"] = st.Diagonal(-jnp.ones(16))
    assert match_fused_engine(m2) is None
    with pytest.raises(ValueError, match="no fused engine"):
        m2.run(engine="fused")


def test_smoother_generalized_configs_match_and_run(rng):
    """Round-3 generalization: non-zero prior mean and non-identity diagonal noise
    penalties match the fused smoother and reproduce the generic posterior mean
    (interpret mode: deterministic PRNG, so compare the CONDITIONAL structure via
    finite draws rather than statistics)."""
    m = _smoother_mcmc(rng)
    m.data["mu"] = jnp.ones_like(m.data["mu"]) * 0.7
    m.data["P_tau"] = st.Diagonal(jnp.linspace(0.5, 2.0, 16))
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_smoother_spectral"
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert res.engine == "fused_smoother_spectral"
    assert bool(np.isfinite(np.asarray(res.store["b"])).all())
    assert bool(np.isfinite(np.asarray(res.log_post)).all())


def test_auto_runs_fused_and_repackages(rng):
    """engine='auto' executes the matched kernel (interpret mode on CPU) and returns
    an MCMCResult with the generic driver's array conventions."""
    m = _smoother_mcmc(rng, n_chains=8)
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert m.last_engine == "fused_smoother_spectral"
    assert res.store["b"].shape == (8, 6, 16, 1)
    assert res.store["lambda"].shape == (8, 6, 1, 1)
    assert res.log_post.shape == (8, 6)
    assert bool(np.isfinite(np.asarray(res.store["b"])).all())

    rw = _rw_mcmc()
    with pltpu.force_tpu_interpret_mode():
        res_rw = rw.run(engine="auto")
    assert rw.last_engine == "fused_random_walk"
    assert res_rw.store["h"].shape == (8, 6, 1, 1)
    assert "h" in res_rw.acceptance


def test_dispatch_matches_mmala(rng):
    from openmcmc_tpu.samplers import ManifoldMALA

    N, d = 20, 3
    X = rng.normal(size=(N, d))
    y = X @ rng.normal(size=d)
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P", "tau")),
            Normal("beta", mean="mu0", precision=ScaledMatrix("P0", "one")),
        ]
    )
    state = {
        "y": y.reshape(-1, 1), "X": X, "beta": np.zeros((d, 1)), "P": st.Diagonal(jnp.ones(N)),
        "tau": 1.0, "P0": st.Diagonal(jnp.ones(d)), "mu0": np.zeros((d, 1)), "one": 1.0,
    }
    m = MCMC(state, [ManifoldMALA("beta", mdl, step=1.0)], mdl, n_burn=2, n_iter=3, n_chains=4, seed=0)
    assert match_fused_engine(m).engine_name == "fused_mmala"


def test_extra_likelihood_blocks_match(rng):
    """A model containing any distribution beyond the matched inventory must NOT
    match: the kernel would silently ignore the extra term and sample the wrong
    posterior (advisor finding, round 2)."""
    n_time = 16
    m = _smoother_mcmc(rng, n_time=n_time)
    # add a second fixed-precision likelihood on the latent, ordered BEFORE y
    extra = Normal("y2", mean="b", precision=ScaledMatrix("P_fix", "one"))
    dists = [extra] + [m.model[k] for k in m.model]
    mdl2 = Model(dists)
    state = dict(m.data)
    state.update(m.initial_chain_state)
    state.update({"y2": np.zeros(n_time), "P_fix": st.Diagonal(jnp.ones(n_time)), "one": 1.0})
    from openmcmc_tpu.samplers import NormalGamma as NG, NormalNormal as NN

    samplers = [NN("b", mdl2), NG("lambda", mdl2), NG("tau", mdl2)]
    m2 = MCMC(state, samplers, mdl2, n_burn=4, n_iter=6, n_chains=8, seed=0)
    assert match_fused_engine(m2) is None


def test_fused_resume_support_and_raises(rng):
    """Round-3: the conjugate engines' whole carry is (lam, tau), so resume works
    -- under the deterministic stub a full smoother run equals two chained half
    runs exactly. Resume + mesh is not shardable and engine='fused' raises."""
    from jax.sharding import Mesh

    def fresh():
        return _smoother_mcmc(np.random.default_rng(42), n_chains=8)

    with pltpu.force_tpu_interpret_mode():
        full = fresh().run(engine="auto")
        m1 = fresh()
        m1.n_iter = 3
        seg1 = m1.run(engine="auto")
        m2 = fresh()
        m2.n_iter = 3
        seg2 = m2.run(engine="fused", resume=seg1)
    assert seg2.engine == "fused_smoother_spectral"
    b_cat = np.concatenate([np.asarray(seg1.store["b"]), np.asarray(seg2.store["b"])], axis=1)
    np.testing.assert_allclose(np.asarray(full.store["b"]), b_cat, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(full.store["tau"]),
                               np.concatenate([np.asarray(seg1.store["tau"]),
                                               np.asarray(seg2.store["tau"])], axis=1), rtol=1e-5)

    # resume + mesh: per-shard resume slicing is not implemented -> fused raises
    m = _smoother_mcmc(np.random.default_rng(42), n_chains=8,
                       mesh=Mesh(np.array(jax.devices()[:4]), ("chains",)))
    with pytest.raises(ValueError, match="resume"):
        m.run(engine="fused", resume=full)


def test_x64_blocks_match(rng):
    with jax.enable_x64():
        assert match_fused_engine(_smoother_mcmc(rng)) is None


def test_fused_contract_matches_generic(rng):
    """engine='auto' must reproduce the generic driver's store keys, store shapes,
    stats pytree structure and the MCMCResult.engine marker."""
    m_gen = _smoother_mcmc(rng, store_names=["b", "tau"])
    res_gen = m_gen.run(engine="generic")
    m_fused = _smoother_mcmc(rng, store_names=["b", "tau"])
    with pltpu.force_tpu_interpret_mode():
        res_fused = m_fused.run(engine="auto")
    assert m_fused.last_engine == "fused_smoother_spectral"
    assert res_fused.engine == "fused_smoother_spectral"
    assert res_gen.engine == "generic"
    assert set(res_fused.store.keys()) == set(res_gen.store.keys()) == {"b", "tau"}
    for name in res_gen.store:
        assert res_fused.store[name].shape == res_gen.store[name].shape
    assert jax.tree_util.tree_structure(res_fused.stats) == jax.tree_util.tree_structure(res_gen.stats)

    # MH family: acceptance proposal counts use the burn + sampling window
    rw_gen = _rw_mcmc()
    res_rw_gen = rw_gen.run(engine="generic")
    rw_fused = _rw_mcmc()
    with pltpu.force_tpu_interpret_mode():
        res_rw_fused = rw_fused.run(engine="auto")
    assert set(res_rw_fused.stats.keys()) == set(res_rw_gen.stats.keys())
    np.testing.assert_array_equal(
        np.asarray(res_rw_fused.stats["h"]["proposal"]), np.asarray(res_rw_gen.stats["h"]["proposal"])
    )


def test_rw_vector_param_matches_and_runs():
    """Round-3 generalization: vector location parameter h (p = 3) with per-dim
    diagonal precisions matches fused_random_walk and runs under interpret."""
    p, n = 3, 6
    rng = np.random.default_rng(0)
    y = rng.normal(size=(p, n)) + np.array([[1.0], [2.0], [3.0]])
    mdl = Model([Normal("y", mean="h", precision="tau"), Normal("h", mean="mu", precision="lambda")])
    state = {
        "y": y, "h": np.zeros((p, 1)),
        "tau": jnp.eye(p) * jnp.asarray([0.5, 1.0, 2.0]), "mu": np.zeros((p, 1)),
        "lambda": jnp.eye(p) * 0.01,
    }
    m = MCMC(state, [RandomWalk("h", mdl, step=0.8)], mdl, n_burn=4, n_iter=6, n_chains=8, seed=0)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_random_walk"
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert res.store["h"].shape == (8, 6, p, 1)
    assert np.asarray(res.stats["h"]["proposal"])[0] == 10


def test_fused_fitted_values_match_generic(rng):
    """Round-3: model.response no longer blocks the fused match; fitted values are
    recomputed post-hoc from the stored draws and must equal predictor(draw) exactly
    (and carry the generic driver's store key/shape conventions)."""
    N = 30
    X = np.stack([np.ones(N), np.sort(rng.random(N))], 1)
    y = X @ np.array([2.0, 0.5]) + rng.normal(0, 0.1, N)
    lc = LinearCombination(form={"beta": "X"})
    mdl = Model(
        [
            Normal("y", mean=lc, precision=ScaledMatrix("P_tau", "tau")),
            Normal("beta", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("tau", shape="a_tau", rate="b_tau"),
            Gamma("lambda", shape="a_lambda", rate="b_lambda"),
        ],
        response={"y": "mean"},
    )
    samplers = [NormalNormal("beta", mdl), NormalGamma("tau", mdl), NormalGamma("lambda", mdl)]
    state = {
        "y": y, "X": X, "beta": [0.0, 0.0], "P_tau": st.Diagonal(jnp.ones(N)), "tau": 1.0,
        "P_lambda": st.Diagonal(jnp.ones(2)), "mu": [0.0, 0.0], "lambda": 0.01,
        "a_tau": 1.0, "b_tau": 1.0, "a_lambda": 1.0, "b_lambda": 1.0,
    }
    m = MCMC(state, samplers, mdl, n_burn=4, n_iter=6, n_chains=8, seed=0)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_linreg"
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert "y_fitted" in res.store
    beta = np.asarray(res.store["beta"])  # (chains, draws, 2, 1)
    fitted = np.asarray(res.store["y_fitted"])  # (chains, draws, N, 1)
    # generic-driver shape convention: same as per-iteration predictor output
    m_gen = MCMC(dict(state), samplers, mdl, n_burn=4, n_iter=6, n_chains=8, seed=0)
    res_gen = m_gen.run(engine="generic")
    assert fitted.shape == res_gen.store["y_fitted"].shape
    np.testing.assert_allclose(fitted, np.einsum("nk,cdko->cdno", X, beta), rtol=1e-5)

    # a predictor depending on non-stored state cannot be reproduced -> no match
    mdl_bad = Model(list(mdl.values()), response={"y": "mean"})
    state_bad = dict(state)
    m_bad = MCMC(state_bad, samplers, mdl_bad, n_burn=4, n_iter=6, n_chains=8, seed=0,
                 store_names=["beta"])
    # store_names filtering happens AFTER fitted computation, so this still matches;
    # the unavailable case is a predictor input that is neither data nor sampled
    assert match_fused_engine(m_bad) is not None


@pytest.mark.parametrize("n_thin", [2, 10])
def test_fused_thinning_matches_generic_semantics(n_thin):
    """Reference semantics (mcmc.py:98): every iteration -- burn included --
    runs n_thin sweeps and every n_thin-th post-burn sweep is stored. Since
    round 5 the kernels thin IN-KERNEL (store_index strides the store DMA), so
    the draw buffer is O(n_iter) for any n_thin. Under the interpret stub the
    RW chain is deterministic, so the thinned fused store must equal an exact
    numpy mirror."""
    n_burn, n_iter = 3, 4
    y = np.array([150.0, 155.0, 190.0, 160.0, 173.0])
    mu, tau, lam, step, h0 = 160.0, 1.0 / 200.0, 1.0 / 100.0, 5.0, 200.0
    mdl = Model([Normal("y", mean="h", precision="tau"), Normal("h", mean="mu", precision="lambda")])
    state = {"y": y.reshape(1, -1), "h": h0, "tau": jnp.eye(1) * tau,
             "mu": mu, "lambda": jnp.eye(1) * lam}
    m = MCMC(state, [RandomWalk("h", mdl, step=step)], mdl,
             n_burn=n_burn, n_iter=n_iter, n_thin=n_thin, n_chains=8, seed=0)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_random_walk"
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert res.store["h"].shape == (8, n_iter, 1, 1)
    assert res.log_post.shape == (8, n_iter)
    # counter window: (n_burn + n_iter) * n_thin sweeps, like the generic driver
    assert int(np.asarray(res.stats["h"]["proposal"])[0]) == (n_burn + n_iter) * n_thin

    # exact numpy mirror with the interpreter's constant "randomness" (the
    # engines draw proposal normals via the Giles inverse-CDF, tests/
    # test_pallas_interpret.py _icdf)
    from test_pallas_interpret import _icdf

    U_HALF = 0.5 / 16777216.0
    z0 = _icdf(U_HALF)
    log_u = np.log(U_HALF)
    n, s1, s2 = len(y), y.sum(), (y**2).sum()
    const = 0.5 * (n * np.log(tau) - n * np.log(2 * np.pi)) + 0.5 * (np.log(lam) - np.log(2 * np.pi))

    def lp(h):
        return const - 0.5 * tau * (s2 - 2 * h * s1 + n * h * h) - 0.5 * lam * (h - mu) ** 2

    h, cur = h0, lp(h0)
    draws = []
    for it in range((n_burn + n_iter) * n_thin):
        hp = h + step * z0
        lpp = lp(hp)
        if log_u < lpp - cur:
            h, cur = hp, lpp
        if it >= n_burn * n_thin and (it - n_burn * n_thin) % n_thin == n_thin - 1:
            draws.append(h)
    np.testing.assert_allclose(np.asarray(res.store["h"][0]).reshape(-1), np.asarray(draws), rtol=1e-4)


def test_fused_mesh_sharded_runs_on_multiple_devices():
    """Round-3: a chain-axis Mesh no longer blocks the fused match; the launch runs
    as one independent kernel per device over its chain shard (shard_map, no
    collectives), with per-shard PRNG seed offsets. Validated on a 4-device CPU
    mesh under interpret mode (8 concurrently-interpreted kernels deadlock the
    interpreter's semaphore threads on this 1-core box; 4 run in ~2 s); global
    result arrays carry the chain sharding."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("chains",))
    mdl = Model([Normal("y", mean="h", precision="tau"), Normal("h", mean="mu", precision="lambda")])
    state = {
        "y": np.array([[150.0, 155.0, 190.0, 160.0, 173.0]]),
        "h": 200.0, "tau": jnp.eye(1) / 200.0, "mu": 160.0, "lambda": jnp.eye(1) / 100.0,
    }
    m = MCMC(state, [RandomWalk("h", mdl, step=5.0)], mdl,
             n_burn=4, n_iter=6, n_chains=8, seed=0, mesh=mesh)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_random_walk"
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert res.engine == "fused_random_walk"
    h = res.store["h"]
    assert h.shape == (8, 6, 1, 1)
    shard_sizes = {s.data.shape[0] for s in h.addressable_shards}
    assert shard_sizes == {2}  # 8 chains over 4 devices
    assert bool(np.isfinite(np.asarray(h)).all())
    # per-shard results identical under the stubbed (deterministic) interpret PRNG:
    # the seed offsets differ but the zero bit-stream makes every chain the same
    np.testing.assert_allclose(np.asarray(h[0]), np.asarray(h[-1]))
    assert np.asarray(res.stats["h"]["proposal"]).shape == (8,)

    # unsharded run on the same config must produce the identical draws
    m1 = MCMC(dict(state), [RandomWalk("h", mdl, step=5.0)], mdl,
              n_burn=4, n_iter=6, n_chains=8, seed=0)
    with pltpu.force_tpu_interpret_mode():
        res1 = m1.run(engine="auto")
    np.testing.assert_allclose(np.asarray(h), np.asarray(res1.store["h"]))


def test_rw_truncated_matches_and_runs():
    """Round-3: domain_limits no longer blocks the RW match; truncated proposals run
    in-kernel with the asymmetric density correction. Out-of-box initial values
    fall back to generic."""
    from openmcmc_tpu.samplers import RandomWalk as RW

    mdl = Model([Normal("y", mean="h", precision="tau"), Normal("h", mean="mu", precision="lambda")])
    state = {
        "y": np.array([[150.0, 155.0, 190.0, 160.0, 173.0]]),
        "h": 175.0, "tau": jnp.eye(1) / 200.0, "mu": 160.0, "lambda": jnp.eye(1) / 100.0,
    }
    m = MCMC(state, [RW("h", mdl, step=8.0, domain_limits=[[120.0, 185.0]])], mdl,
             n_burn=4, n_iter=6, n_chains=8, seed=0)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_random_walk"
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    h = np.asarray(res.store["h"])
    assert h.shape == (8, 6, 1, 1)
    assert float(h.min()) >= 120.0 and float(h.max()) <= 185.0

    # initial value outside the box -> generic fallback
    state2 = dict(state)
    state2["h"] = 200.0
    m2 = MCMC(state2, [RW("h", mdl, step=8.0, domain_limits=[[120.0, 185.0]])], mdl,
              n_burn=4, n_iter=6, n_chains=8, seed=0)
    assert match_fused_engine(m2) is None


def test_rw_vector_step_matches_and_runs():
    """Per-dimension (p, 1) step sizes match fused_random_walk (generic broadcast
    rules, reference metropolis_hastings.py:222-225). Round-4: adapt + vector
    steps ALSO match -- the generic Robbins-Monro nudge is one scalar added to the
    whole log_step array (metropolis.py:90-96), i.e. a per-chain scale on the
    fixed base vector, which is exactly the kernel's carried log_scale."""
    from openmcmc_tpu.samplers import RandomWalk as RW

    p, n = 3, 6
    rng = np.random.default_rng(1)
    y = rng.normal(size=(p, n)) + np.array([[1.0], [2.0], [3.0]])
    mdl = Model([Normal("y", mean="h", precision="tau"), Normal("h", mean="mu", precision="lambda")])
    state = {
        "y": y, "h": np.zeros((p, 1)),
        "tau": jnp.eye(p) * jnp.asarray([0.5, 1.0, 2.0]), "mu": np.zeros((p, 1)),
        "lambda": jnp.eye(p) * 0.01,
    }
    steps = np.array([[0.5], [0.8], [1.2]])
    m = MCMC(state, [RW("h", mdl, step=steps)], mdl, n_burn=4, n_iter=6, n_chains=8, seed=0)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_random_walk"
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert res.store["h"].shape == (8, 6, p, 1)
    assert bool(np.isfinite(np.asarray(res.store["h"])).all())

    m2 = MCMC(dict(state), [RW("h", mdl, step=steps, adapt_step=True)], mdl,
              n_burn=4, n_iter=6, n_chains=8, seed=0)
    runner2 = match_fused_engine(m2)
    assert runner2 is not None and runner2.engine_name == "fused_random_walk"
    with pltpu.force_tpu_interpret_mode():
        res2 = m2.run(engine="auto")
    # generic stats contract: log_step has the step's (p, 1) shape per chain,
    # and the per-dimension ratios stay fixed (one shared scale)
    ls = np.asarray(res2.stats["h"]["log_step"])
    assert ls.shape == (8, p, 1)
    scale = ls - np.log(steps)[None]
    np.testing.assert_allclose(scale, np.broadcast_to(scale[:, :1, :], scale.shape), rtol=0, atol=1e-6)


def test_mmala_adapt_matches_and_runs(rng):
    """Round-3: adapt_step no longer blocks the mMALA match (round-4: for the
    spectral tier too -- see test_spectral_mmala_adapt_matches_and_resumes)."""
    from openmcmc_tpu.samplers import ManifoldMALA

    N, d = 20, 3
    X = rng.normal(size=(N, d))
    y = X @ rng.normal(size=d)
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P", "tau")),
            Normal("beta", mean="mu0", precision=ScaledMatrix("P0", "one")),
        ]
    )
    state = {
        "y": y.reshape(-1, 1), "X": X, "beta": np.zeros((d, 1)), "P": st.Diagonal(jnp.ones(N)),
        "tau": 1.0, "P0": st.Diagonal(jnp.ones(d)), "mu0": np.zeros((d, 1)), "one": 1.0,
    }
    m = MCMC(state, [ManifoldMALA("beta", mdl, step=1.0, adapt_step=True)], mdl,
             n_burn=3, n_iter=4, n_chains=8, seed=0)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_mmala"
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert "log_step" in res.stats["beta"]
    assert res.stats["beta"]["log_step"].shape == (8, 1, 1)
    assert bool(np.isfinite(np.asarray(res.store["beta"])).all())


def test_spectral_mmala_adapt_matches_and_resumes(rng):
    """Round-4 (verdict item 6): the spectral mMALA tier adapts in-kernel and
    takes per-chain warm starts, so adapt_step configurations at p > 16 no
    longer fall back to generic, and resume continues a run exactly (under the
    deterministic interpret PRNG a full run equals two chained halves)."""
    from openmcmc_tpu.samplers import ManifoldMALA

    N, d = 30, 24  # d > fused/mmala.py MAX_P = 16 -> spectral tier
    X = rng.normal(size=(N, d))
    y = X @ rng.normal(size=d)
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P", "tau")),
            Normal("beta", mean="mu0", precision=ScaledMatrix("P0", "one")),
        ]
    )
    state = {
        "y": y.reshape(-1, 1), "X": X, "beta": np.zeros((d, 1)), "P": st.Diagonal(jnp.ones(N)),
        "tau": 1.0, "P0": st.Diagonal(jnp.ones(d)), "mu0": np.zeros((d, 1)), "one": 1.0,
    }

    def make(n_iter, seed, n_burn=3):
        m = MCMC(dict(state), [ManifoldMALA("beta", mdl, step=1.0, adapt_step=True)], mdl,
                 n_burn=n_burn, n_iter=n_iter, n_chains=8, seed=seed)
        return m

    m = make(6, 0)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_mmala_spectral"
    assert runner.supports_resume
    with pltpu.force_tpu_interpret_mode():
        full = make(6, 0).run(engine="auto")
        seg1 = make(3, 1).run(engine="auto")
        seg2 = make(3, 2).run(engine="fused", resume=seg1)
    assert full.engine == seg2.engine == "fused_mmala_spectral"
    assert "log_step" in full.stats["beta"] and full.stats["beta"]["log_step"].shape == (8, 1, 1)
    cat = np.concatenate([np.asarray(seg1.store["beta"]), np.asarray(seg2.store["beta"])], axis=1)
    np.testing.assert_allclose(np.asarray(full.store["beta"]), cat, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(full.stats["beta"]["log_step"]), np.asarray(seg2.stats["beta"]["log_step"]),
        rtol=1e-6,
    )


def test_fused_rw_resume_continues_exactly():
    """Round-3: resume works for the RW engine (per-chain warm-start inputs).
    Under the deterministic interpret stub, a full run must equal a half run
    plus a resumed half EXACTLY -- state, adapted step, accept/proposal counters
    all carry across the boundary; non-resumable engines still raise for
    engine='fused' and run generic for 'auto'."""
    from openmcmc_tpu.samplers import RandomWalk as RW

    mdl = Model([Normal("y", mean="h", precision="tau"), Normal("h", mean="mu", precision="lambda")])
    state = {
        "y": np.array([[150.0, 155.0, 190.0, 160.0, 173.0]]),
        "h": 200.0, "tau": jnp.eye(1) / 200.0, "mu": 160.0, "lambda": jnp.eye(1) / 100.0,
    }

    def make(n_iter, seed):
        return MCMC(dict(state), [RW("h", mdl, step=40.0, adapt_step=True, adapt_rate=0.1)],
                    mdl, n_burn=3, n_iter=n_iter, n_chains=8, seed=seed)

    with pltpu.force_tpu_interpret_mode():
        full = make(6, 0).run(engine="auto")
        seg1 = make(3, 1).run(engine="auto")
        m2 = make(3, 2)
        seg2 = m2.run(engine="fused", resume=seg1)
    assert seg2.engine == "fused_random_walk"
    h_cat = np.concatenate([np.asarray(seg1.store["h"]), np.asarray(seg2.store["h"])], axis=1)
    np.testing.assert_allclose(np.asarray(full.store["h"]), h_cat, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(full.stats["h"]["log_step"]),
                               np.asarray(seg2.stats["h"]["log_step"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(full.stats["h"]["accept"]),
                                  np.asarray(seg2.stats["h"]["accept"]))
    # proposal window accumulates: (3 burn + 3) + 3 resumed
    assert int(np.asarray(seg2.stats["h"]["proposal"])[0]) == 9
    assert int(np.asarray(full.stats["h"]["proposal"])[0]) == 9


def test_fused_mmala_resume_continues_exactly(rng):
    """mMALA resume: full == half + resumed half under the deterministic stub."""
    from openmcmc_tpu.samplers import ManifoldMALA

    N, d = 20, 3
    X = rng.normal(size=(N, d))
    y = X @ rng.normal(size=d)
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P", "tau")),
            Normal("beta", mean="mu0", precision=ScaledMatrix("P0", "one")),
        ]
    )
    state = {
        "y": y.reshape(-1, 1), "X": X, "beta": np.zeros((d, 1)), "P": st.Diagonal(jnp.ones(N)),
        "tau": 1.0, "P0": st.Diagonal(jnp.ones(d)), "mu0": np.zeros((d, 1)), "one": 1.0,
    }

    def make(n_iter, seed):
        return MCMC(dict(state), [ManifoldMALA("beta", mdl, step=0.9, adapt_step=True, adapt_rate=0.1)],
                    mdl, n_burn=3, n_iter=n_iter, n_chains=8, seed=seed)

    with pltpu.force_tpu_interpret_mode():
        full = make(6, 0).run(engine="auto")
        seg1 = make(3, 1).run(engine="auto")
        seg2 = make(3, 2).run(engine="fused", resume=seg1)
    assert seg2.engine == "fused_mmala"
    cat = np.concatenate([np.asarray(seg1.store["beta"]), np.asarray(seg2.store["beta"])], axis=1)
    np.testing.assert_allclose(np.asarray(full.store["beta"]), cat, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(full.stats["beta"]["accept"]),
                                  np.asarray(seg2.stats["beta"]["accept"]))
    assert int(np.asarray(seg2.stats["beta"]["proposal"])[0]) == 9


def test_thinned_match_never_mutates_the_driver():
    """Regression (round 4): thinning used to scale n_burn/n_iter by temporarily
    mutating the LIVE MCMC object around the kernel call -- the same hazard the
    per-device chain-count plumbing removed from _sharded (a cached concurrent
    trace could observe the mid-mutation counts). match_fused_engine now matches
    against a sweep-scaled shallow clone; the driver object must never see an
    attribute write once handed to the dispatcher."""

    class _Sealed(MCMC):
        def __setattr__(self, name, value):
            # the clone copies _seal_id but has a new id() -> writes allowed there
            if getattr(self, "_seal_id", None) == id(self) and name in ("n_burn", "n_iter", "n_thin"):
                raise AssertionError(f"fused dispatch mutated the live driver: {name}")
            object.__setattr__(self, name, value)

    y = np.array([150.0, 155.0, 190.0, 160.0, 173.0])
    mdl = Model([Normal("y", mean="h", precision="tau"), Normal("h", mean="mu", precision="lambda")])
    state = {"y": y.reshape(1, -1), "h": 200.0, "tau": jnp.eye(1) / 200.0,
             "mu": 160.0, "lambda": jnp.eye(1) / 100.0}
    m = _Sealed(state, [RandomWalk("h", mdl, step=5.0)], mdl,
                n_burn=3, n_iter=4, n_thin=2, n_chains=8, seed=0)
    m._seal_id = id(m)
    runner = match_fused_engine(m)
    assert runner is not None
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="auto")
    assert (m.n_burn, m.n_iter, m.n_thin) == (3, 4, 2)
    assert res.store["h"].shape == (8, 4, 1, 1)
    assert int(np.asarray(res.stats["h"]["proposal"])[0]) == (3 + 4) * 2


def test_replicated_response_columns_fall_back_to_generic(rng):
    """Regression (round 4): a replicate-column response y of shape (p, n > 1)
    (the reference's core data convention, reference distribution.py:7-14) used
    to silently match the single-column smoother/linreg/mMALA kernels, which
    read only the first flattened entries -- engine="auto" returned a wrong
    posterior. Replicated responses must fall back to the generic driver
    (which sums the likelihood over columns)."""
    from openmcmc_tpu.samplers import ManifoldMALA

    # smoother: y (p, 3)
    m = _smoother_mcmc(rng)
    m.data["y"] = jnp.tile(m.data["y"].reshape(-1, 1), (1, 3))
    assert match_fused_engine(m) is None

    # linreg: y (N, 2)
    m2 = _linreg_mcmc(rng)
    m2.data["y"] = jnp.tile(m2.data["y"].reshape(-1, 1), (1, 2))
    assert match_fused_engine(m2) is None

    # replicated prior mean mu (p, 2) is equally unrepresentable
    m3 = _smoother_mcmc(rng)
    m3.data["mu"] = jnp.zeros((16, 2))
    assert match_fused_engine(m3) is None

    # mMALA: y (N, 2)
    N, d = 20, 3
    X = rng.normal(size=(N, d))
    y = X @ rng.normal(size=d)
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P", "tau")),
            Normal("beta", mean="mu0", precision=ScaledMatrix("P0", "one")),
        ]
    )
    state = {
        "y": np.stack([y, y], 1), "X": X, "beta": np.zeros((d, 1)), "P": st.Diagonal(jnp.ones(N)),
        "tau": 1.0, "P0": st.Diagonal(jnp.ones(d)), "mu0": np.zeros((d, 1)), "one": 1.0,
    }
    m4 = MCMC(state, [ManifoldMALA("beta", mdl, step=1.0)], mdl, n_burn=2, n_iter=3, n_chains=4, seed=0)
    assert match_fused_engine(m4) is None

    # the fused RANDOM WALK, by contrast, reduces y to per-dimension sufficient
    # statistics over columns, so its replicated y (1, 5) still matches
    assert match_fused_engine(_rw_mcmc()).engine_name == "fused_random_walk"


def test_data_rebinding_invalidates_cached_programs(rng):
    """Regression (round 4): the run-config cache key used to exclude data, so
    ``m.data['y'] = new_y`` between two runs of the SAME MCMC object silently
    served the cached program (generic trace or fused match) built for the OLD
    response. Data entries are immutable jax arrays, so rebinding is the only
    mutation route; the key now folds in entry identity and must re-trace.
    A rebound-data second run is exactly a fresh object's run (same seed)."""
    y = np.array([[150.0, 155.0, 190.0, 160.0, 173.0]])
    mdl = Model([Normal("y", mean="h", precision="tau"), Normal("h", mean="mu", precision="lambda")])

    def make(y_arr):
        state = {"y": y_arr, "h": 200.0, "tau": jnp.eye(1) / 200.0,
                 "mu": 160.0, "lambda": jnp.eye(1) / 100.0}
        return MCMC(state, [RandomWalk("h", mdl, step=5.0)], mdl,
                    n_burn=3, n_iter=4, n_chains=8, seed=0)

    # generic path: warm the trace cache, rebind, re-run
    m = make(y)
    m.run(engine="generic")
    key_before = m._run_config_key()
    y2 = y + 40.0
    m.data["y"] = jnp.asarray(y2)
    assert m._run_config_key() != key_before
    got = m.run(engine="generic")
    want = make(y2).run(engine="generic")
    np.testing.assert_array_equal(np.asarray(got.store["h"]), np.asarray(want.store["h"]))

    # fused path: the cached MATCH must also be invalidated (its closure bakes y)
    m = make(y)
    with pltpu.force_tpu_interpret_mode():
        m.run(engine="auto")
        assert m.last_engine == "fused_random_walk"
        m.data["y"] = jnp.asarray(y2)
        got = m.run(engine="auto")
        fresh = make(y2)
        want = fresh.run(engine="auto")
    assert fresh.last_engine == "fused_random_walk"
    np.testing.assert_array_equal(np.asarray(got.store["h"]), np.asarray(want.store["h"]))


def _truncated_smoother_mcmc(rng, n_time=16, n_chains=8, lo=0.0, hi=1.2, tridiag=True):
    if tridiag:
        s = np.linspace(0.0, 10.0, n_time)
        P = gmrf.precision_irregular(jnp.asarray(s))
        P = st.Banded(P.bands.at[0, 0].add(0.001))
        p = n_time
    else:
        P = gmrf.precision_lattice(4, 4, ridge=1e-3)
        p = st.dim(P)
    y = np.abs(np.sin(np.linspace(0, 10, p))) + rng.normal(0.0, 0.3, p)
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda"),
                   domain_response_lower=lo, domain_response_upper=hi),
            Gamma("lambda", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    samplers = [NormalNormal("b", mdl), NormalGamma("lambda", mdl), NormalGamma("tau", mdl)]
    state = {
        "y": y, "b": np.clip(y, lo + 1e-3, hi - 1e-3), "mu": np.zeros(p), "lambda": 10.0,
        "P_lambda": P, "a_lam": 10.0, "b_lam": 1.0, "tau": 1.0,
        "P_tau": st.Diagonal(jnp.ones(p)), "a_tau": 1.0, "b_tau": 1.0,
    }
    return MCMC(state, samplers, mdl, n_burn=4, n_iter=6, n_chains=n_chains, seed=0)


def test_truncated_smoother_matches_thomas_and_runs(rng):
    """A box-truncated tridiagonal smoother dispatches the truncated Thomas
    engine (never spectral: no coordinate sweep exists in eigencoordinates);
    draws respect the box; a truncated LATTICE prior has no fused match and
    engine='auto' falls back to the generic driver (VERDICT r5 item 2)."""
    m = _truncated_smoother_mcmc(rng)
    runner = match_fused_engine(m)
    assert runner is not None and runner.engine_name == "fused_gmrf_smoother_truncated"
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine="fused")
    assert res.engine == "fused_gmrf_smoother_truncated"
    b = np.asarray(res.store["b"])
    assert b.shape == (8, 6, 16, 1)
    assert b.min() >= -1e-6 and b.max() <= 1.2 + 1e-6
    assert set(res.store) >= {"b", "lambda", "tau"}
    assert np.isfinite(np.asarray(res.log_post)).all()

    m_lat = _truncated_smoother_mcmc(rng, tridiag=False)
    assert match_fused_engine(m_lat) is None
    res = m_lat.run(engine="auto")
    assert res.engine == "generic"


def test_truncated_smoother_resume_carries_latent(rng):
    """Resume of the truncated engine warm-starts the CARRIED latent: the
    chromatic sweep conditions on b, so the continuation must pass the final
    draws into the kernel (init["b"]), not restart from the data init."""
    from unittest import mock

    from openmcmc_tpu.fused import gmrf_smoother

    m = _truncated_smoother_mcmc(rng)
    calls = []
    real = gmrf_smoother.run_fused_smoother

    def spy(*args, **kw):
        calls.append(kw)
        return real(*args, **kw)

    with mock.patch.object(gmrf_smoother, "run_fused_smoother", spy):
        with pltpu.force_tpu_interpret_mode():
            res1 = m.run(engine="fused")
            res2 = m.run(resume=res1, engine="fused")
    assert res2.engine == "fused_gmrf_smoother_truncated"
    b2 = np.asarray(res2.store["b"])
    assert b2.min() >= -1e-6 and b2.max() <= 1.2 + 1e-6
    assert calls[0]["init"] is None
    warm = calls[-1]["init"]
    assert warm is not None and "b" in warm, "resume must warm-start the carried latent"
    np.testing.assert_allclose(
        np.asarray(warm["b"]).reshape(8, 16), np.asarray(res1.final_state["b"]).reshape(8, 16)
    )


@pytest.mark.parametrize("family", ["spectral_smoother", "linreg", "truncated_thomas"])
def test_inkernel_thinning_equals_strided_full_run(family):
    """Under the deterministic interpret PRNG, a thinned run's stored draws
    must equal the strided subsequence of the unthinned run's (same seed, same
    per-sweep trajectory; only the store DMA gating differs). Covers the
    conjugate engines' in-kernel thinning beyond the RW numpy-mirror test.
    n_burn=0 on both sides: burn SWEEP counts scale with n_thin by design."""
    def build(n_iter, n_thin):
        # fresh generator per build: both runs must see IDENTICAL data
        fresh = np.random.default_rng(7)
        if family == "spectral_smoother":
            m = _smoother_mcmc(fresh, n_chains=8)
        elif family == "linreg":
            m = _linreg_mcmc(fresh)
        else:
            m = _truncated_smoother_mcmc(fresh)
        m.n_burn, m.n_iter, m.n_thin = 0, n_iter, n_thin
        return m

    with pltpu.force_tpu_interpret_mode():
        res_full = build(8, 1).run(engine="fused")
        res_thin = build(4, 2).run(engine="fused")
    assert res_full.engine == res_thin.engine != "generic"
    for key in res_thin.store:
        full = np.asarray(res_full.store[key])
        thin = np.asarray(res_thin.store[key])
        np.testing.assert_allclose(thin, full[:, 1::2], rtol=1e-5, atol=1e-6, err_msg=key)
    np.testing.assert_allclose(
        np.asarray(res_thin.log_post), np.asarray(res_full.log_post)[:, 1::2], rtol=1e-5
    )
