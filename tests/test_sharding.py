"""Multi-device tests on the simulated 8-device CPU mesh: sharded chains produce the
same posterior as unsharded, and pooled collectives reduce correctly over the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmcmc_tpu.distributions import Gamma, Normal
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parallel import make_mesh, pooled_mean_var, shard_chains
from openmcmc_tpu.parameters import ScaledMatrix
from openmcmc_tpu.samplers import NormalGamma, NormalNormal


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def _smoother_mcmc(rng, n_chains, mesh=None):
    n_time = 20
    from openmcmc_tpu.linalg import gmrf

    P_lam = gmrf.precision_irregular(jnp.arange(n_time, dtype=jnp.float32))
    P_lam = st.Banded(P_lam.bands.at[0, 0].add(0.001))
    y = np.sin(np.arange(n_time) / 4.0) + rng.normal(0, 0.3, n_time)
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
        "y": y,
        "b": y.copy(),
        "mu": np.zeros(n_time),
        "lambda": 10.0,
        "P_lambda": P_lam,
        "a_lam": 10.0,
        "b_lam": 1.0,
        "tau": 1.0,
        "P_tau": st.Diagonal(jnp.ones(n_time)),
        "a_tau": 1.0,
        "b_tau": 1.0,
    }
    return MCMC(state, samplers, mdl, n_burn=50, n_iter=100, n_chains=n_chains, seed=3, mesh=mesh)


def test_sharded_run_matches_unsharded(rng):
    mesh = make_mesh()
    res_sharded = _smoother_mcmc(rng, 16, mesh=mesh).run()
    res_plain = _smoother_mcmc(np.random.default_rng(42), 16, mesh=None).run()
    np.testing.assert_allclose(
        np.asarray(res_sharded.store["b"]), np.asarray(res_plain.store["b"]), rtol=1e-4, atol=1e-5
    )
    # output actually sharded across devices
    assert len(res_sharded.store["b"].sharding.device_set) == 8


def test_pooled_mean_var_collective(rng):
    mesh = make_mesh()
    draws = jnp.asarray(rng.normal(size=(64, 10)))
    sharded = shard_chains(draws, mesh)
    mean, var = pooled_mean_var(sharded, mesh)
    np.testing.assert_allclose(mean, np.asarray(draws).mean(0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(var, np.asarray(draws).var(0), rtol=1e-3, atol=1e-4)


def test_shard_chains_placement(rng):
    mesh = make_mesh()
    x = shard_chains(jnp.zeros((32, 4)), mesh)
    assert len(x.sharding.device_set) == 8
