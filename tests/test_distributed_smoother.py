"""Sequence-sharded smoother through the MCMC API (round-2 VERDICT gap #4).

The flagship conjugate smoother runs as one MCMC(mesh=...) call with the latent
field sharded over a 'seq' mesh axis (2-D chains x seq layout), and its posterior
matches the single-device generic driver on a small case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmcmc_tpu.distributions import Gamma, Normal
from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parallel import make_mesh_2d
from openmcmc_tpu.parameters import ScaledMatrix
from openmcmc_tpu.samplers import NormalGamma, NormalNormal, RandomWalk


def _smoother(n_time, n_chains, mesh=None, n_burn=50, n_iter=200, store_b=True):
    rng = np.random.default_rng(0)
    s = np.linspace(0.0, 10.0, n_time)
    P = gmrf.precision_irregular(jnp.asarray(s))
    P = st.Banded(P.bands.at[0, 0].add(0.01))
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
        "y": y, "b": y.copy(), "mu": np.zeros(n_time), "lambda": 5.0, "P_lambda": P,
        "a_lam": 4.0, "b_lam": 1.0, "tau": 1.0, "P_tau": st.Diagonal(jnp.ones(n_time)),
        "a_tau": 2.0, "b_tau": 1.0,
    }
    m = MCMC(state, samplers, mdl, n_burn=n_burn, n_iter=n_iter, n_chains=n_chains, seed=3, mesh=mesh)
    if not store_b:
        m.store_names = ["lambda", "tau"]
    return m


def test_distributed_smoother_matches_single_device():
    mesh = make_mesh_2d(2, 4)  # 2 chain groups x 4 sequence shards (8 CPU devices)
    n_time, n_chains = 32, 16
    m_dist = _smoother(n_time, n_chains, mesh=mesh, n_burn=100, n_iter=600)
    res_dist = m_dist.run()
    assert res_dist.engine == "distributed_gmrf_smoother"
    assert res_dist.store["b"].shape == (n_chains, 600, n_time, 1)

    m_single = _smoother(n_time, n_chains, mesh=None, n_burn=100, n_iter=600)
    res_single = m_single.run()

    for name in ("lambda", "tau"):
        d = np.asarray(res_dist.store[name]).reshape(-1)
        s = np.asarray(res_single.store[name]).reshape(-1)
        # same posterior within MC error (independent streams; ~n_chains*ess draws)
        se = s.std() / np.sqrt(200.0)
        assert abs(d.mean() - s.mean()) < 6 * se + 0.05 * abs(s.mean()), (name, d.mean(), s.mean())
    bd = np.asarray(res_dist.store["b"]).mean((0, 1)).ravel()
    bs = np.asarray(res_single.store["b"]).mean((0, 1)).ravel()
    sd = np.asarray(res_single.store["b"]).std((0, 1)).ravel()
    tol = 6 * sd / np.sqrt(400.0) + 0.02
    assert np.all(np.abs(bd - bs) < tol), np.max(np.abs(bd - bs) / tol)
    # log_post finite and comparable in level
    assert np.isfinite(np.asarray(res_dist.log_post)).all()
    assert abs(np.asarray(res_dist.log_post).mean() - np.asarray(res_single.log_post).mean()) < 10.0


def test_seq_mesh_requires_smoother_family():
    mesh = make_mesh_2d(2, 4)
    mdl = Model([Normal("y", mean="h", precision="tauI"), Normal("h", mean="mu", precision="lamI")])
    state = {"y": np.array([[1.0, 2.0]]), "h": 0.0, "tauI": jnp.eye(1), "mu": 0.0, "lamI": jnp.eye(1)}
    m = MCMC(state, [RandomWalk("h", mdl, step=1.0)], mdl, n_burn=2, n_iter=3, n_chains=4, mesh=mesh)
    with pytest.raises(ValueError, match="seq"):
        m.run()


def test_store_names_without_latent():
    """Large-field mode: store only the scales (the latent would not fit in HBM
    across iterations); final_state still carries the full field."""
    mesh = make_mesh_2d(2, 4)
    m = _smoother(64, 8, mesh=mesh, n_burn=10, n_iter=20, store_b=False)
    res = m.run()
    assert set(res.store.keys()) == {"lambda", "tau"}
    assert res.final_state["b"].shape == (8, 64, 1)
    assert np.isfinite(np.asarray(res.final_state["b"])).all()
