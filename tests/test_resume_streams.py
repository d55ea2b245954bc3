"""Resume-stream parity matrix (VERDICT r5 item 5).

For EVERY engine x resume combination the contract is: either the continuation
draws a fresh, non-replaying PRNG stream, or the driver raises loudly — never a
silent reuse of the fresh-run stream. The invariants checked per engine:

1. ``result.final_key`` differs from the fresh-run chain keys
   (``jax.random.split(m.key, n_chains)``): a later GENERIC resume of any
   result must not replay what a fresh run would draw. The distributed
   smoother violated exactly this in round 4 (``final_key = split(self.key)``,
   mcmc.py:392) — fixed in round 5.
2. ``m.run(resume=result, engine=...)`` either succeeds — and its own
   ``final_key`` advances again (chaining never cycles) — or raises ValueError.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from openmcmc_tpu.distributions import Categorical, Gamma, Normal
from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import (
    LinearCombination,
    MixtureParameterMatrix,
    MixtureParameterVector,
    ScaledMatrix,
)
from openmcmc_tpu.samplers import (
    ManifoldMALA,
    MixtureAllocation,
    NormalGamma,
    NormalNormal,
    RandomWalk,
)

RNG = np.random.default_rng(0)


def _smoother(truncated=False, mesh=None):
    n_time = 16
    s = np.linspace(0.0, 10.0, n_time)
    P = gmrf.precision_irregular(jnp.asarray(s))
    P = st.Banded(P.bands.at[0, 0].add(0.001))
    y = np.abs(np.sin(s)) + RNG.normal(0.0, 0.3, n_time)
    trunc_kw = dict(domain_response_lower=0.0, domain_response_upper=2.0) if truncated else {}
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda"), **trunc_kw),
            Gamma("lambda", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    samplers = [NormalNormal("b", mdl), NormalGamma("lambda", mdl), NormalGamma("tau", mdl)]
    state = {
        "y": y, "b": np.clip(y, 1e-3, 2.0 - 1e-3) if truncated else y.copy(),
        "mu": np.zeros(n_time), "lambda": 10.0, "P_lambda": P,
        "a_lam": 10.0, "b_lam": 1.0, "tau": 1.0, "P_tau": st.Diagonal(jnp.ones(n_time)),
        "a_tau": 1.0, "b_tau": 1.0,
    }
    return MCMC(state, samplers, mdl, n_burn=3, n_iter=4, n_chains=8, seed=0, mesh=mesh)


def _rw():
    mdl = Model([Normal("y", mean="h", precision="tau"), Normal("h", mean="mu", precision="lambda")])
    state = {
        "y": np.array([[150.0, 155.0, 190.0, 160.0, 173.0]]),
        "h": 200.0, "tau": jnp.eye(1) / 200.0, "mu": 160.0, "lambda": jnp.eye(1) / 100.0,
    }
    return MCMC(state, [RandomWalk("h", mdl, step=5.0)], mdl, n_burn=3, n_iter=4, n_chains=8, seed=0)


def _linreg():
    N = 20
    X = np.stack([np.ones(N), np.sort(RNG.random(N))], 1)
    y = X @ np.array([2.0, 0.5]) + RNG.normal(0, 0.1, N)
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
    return MCMC(state, samplers, mdl, n_burn=3, n_iter=4, n_chains=8, seed=0)


def _mmala():
    N, d = 12, 3
    X = RNG.normal(size=(N, d))
    y = X @ RNG.normal(size=d)
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
    return MCMC(state, [ManifoldMALA("beta", mdl, step=1.0)], mdl, n_burn=2, n_iter=3, n_chains=4, seed=0)


def _mixture():
    n, K = 40, 2
    y = np.where(RNG.random(n) > 0.5, 2.0, -2.0) + 0.5 * RNG.normal(size=n)
    mdl = Model(
        [
            Normal("y", mean=MixtureParameterVector("mu", "Z"), precision=MixtureParameterMatrix("lam", "Z")),
            Categorical("Z", prob="w"),
            Normal("mu", mean="mu0", precision="p0"),
            Gamma("lam", shape="a0", rate="b0"),
        ]
    )
    state = {
        "y": y.reshape(n, 1), "w": np.full((n, K), 0.5), "Z": np.zeros((n, 1), np.int32),
        "mu": np.array([[-1.0], [1.0]]), "lam": np.ones((K, 1)),
        "mu0": np.zeros((K, 1)), "p0": st.Diagonal(jnp.full((K,), 0.1)),
        "a0": np.full((K, 1), 2.0), "b0": np.ones((K, 1)),
    }
    m = MCMC(
        state,
        [MixtureAllocation("Z", mdl, response_param="y"), NormalNormal("mu", mdl), NormalGamma("lam", mdl)],
        mdl, n_burn=3, n_iter=4, n_chains=8, seed=0, store_names=["Z", "mu", "lam"],
    )
    m.model.response = None
    return m


ENGINES = [
    ("generic_smoother", _smoother, "generic", "fused_free"),
    ("fused_spectral_smoother", _smoother, "auto", "fused_smoother_spectral"),
    ("fused_truncated_smoother", lambda: _smoother(truncated=True), "auto", "fused_gmrf_smoother_truncated"),
    ("fused_rw", _rw, "auto", "fused_random_walk"),
    ("fused_linreg", _linreg, "auto", "fused_linreg"),
    ("fused_mmala", _mmala, "auto", "fused_mmala"),
    ("fused_mixture_conjugate", _mixture, "auto", "fused_mixture_conjugate"),
]


@pytest.mark.parametrize("name,build,engine,expect", ENGINES, ids=[e[0] for e in ENGINES])
def test_resume_streams_advance(name, build, engine, expect):
    m = build()
    with pltpu.force_tpu_interpret_mode():
        res = m.run(engine=engine)
    if expect != "fused_free":
        assert res.engine == expect, res.engine
    fresh_keys = np.asarray(jax.random.split(m.key, m.n_chains))
    # (1) a later generic resume never replays the fresh-run stream
    assert not np.array_equal(np.asarray(res.final_key), fresh_keys), name
    # (2) resuming succeeds with a further-advanced stream, or raises loudly
    with pltpu.force_tpu_interpret_mode():
        try:
            res2 = m.run(resume=res, engine=engine)
        except ValueError:
            return
    assert not np.array_equal(np.asarray(res2.final_key), np.asarray(res.final_key)), name
    assert not np.array_equal(np.asarray(res2.final_key), fresh_keys), name


def test_distributed_smoother_final_key_advances():
    """The round-4 bug: the distributed smoother returned final_key =
    split(self.key) — the SAME keys a fresh generic run would use, so a later
    generic resume replayed the fresh stream. Now advanced; resume still raises
    loudly."""
    from openmcmc_tpu.parallel import make_mesh_2d

    mesh = make_mesh_2d(2, 4)
    m = _smoother(mesh=mesh)
    res = m.run()
    assert res.engine == "distributed_gmrf_smoother"
    fresh_keys = np.asarray(jax.random.split(m.key, m.n_chains))
    assert not np.array_equal(np.asarray(res.final_key), fresh_keys)
    with pytest.raises(ValueError, match="does not support resume"):
        m.run(resume=res)
