"""Direct posterior cross-validation against the ACTUAL reference implementation.

The reference package (sede-open/openMCMC, mounted read-only at /root/reference) is
imported and run on the same data as this framework's driver; posterior means must
agree within combined Monte-Carlo error. This is the strongest parity evidence the
suite has: not a reimplementation of the reference's math, but the reference itself.

Skipped automatically when the reference tree is not mounted.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(REF), reason="reference tree not mounted"
)
if REF not in sys.path:
    sys.path.insert(0, REF)


def _sem(draws, axis=None):
    """Monte-Carlo standard error of a posterior-mean estimate, autocorrelation-
    inflated by a crude factor 3 (Gibbs draws mix in a few steps here)."""
    n = draws.shape[-1] if axis is None else draws.shape[axis]
    return 3.0 * np.std(draws, axis=axis) / np.sqrt(n)


def test_linear_regression_posterior_matches_reference(rng):
    """examples/3 workload: NormalNormal(beta) + 2x NormalGamma."""
    from openmcmc.distribution.distribution import Gamma as RGamma
    from openmcmc.distribution.location_scale import Normal as RNormal
    from openmcmc.mcmc import MCMC as RMCMC
    from openmcmc.model import Model as RModel
    from openmcmc.parameter import Identity as RIdentity
    from openmcmc.parameter import LinearCombination as RLC
    from openmcmc.parameter import ScaledMatrix as RSM
    from openmcmc.sampler.sampler import NormalGamma as RNG
    from openmcmc.sampler.sampler import NormalNormal as RNN

    N = 100
    x = np.sort(rng.random(N))
    X = np.stack([np.ones(N), x], 1)
    y = X @ np.array([2.0, 0.5]) + rng.normal(0, 0.1, N)

    rmodel = RModel(
        [
            RNormal("y", mean=RLC(form={"beta": "X"}), precision=RSM(matrix="P_tau", scalar="tau")),
            RNormal("beta", mean=RIdentity("mu"), precision=RSM(matrix="P_lam", scalar="lam")),
            RGamma("tau", shape=RIdentity("a_tau"), rate=RIdentity("b_tau")),
            RGamma("lam", shape=RIdentity("a_lam"), rate=RIdentity("b_lam")),
        ]
    )
    rstate = {
        "y": y.reshape(-1, 1), "X": X, "beta": np.zeros((2, 1)), "mu": np.zeros((2, 1)),
        "P_tau": np.eye(N), "P_lam": np.eye(2), "tau": 1.0, "lam": 1.0,
        "a_tau": 1.0, "b_tau": 1.0, "a_lam": 1.0, "b_lam": 1.0,
    }
    rsamplers = [RNN("beta", rmodel), RNG("tau", rmodel), RNG("lam", rmodel)]
    rmcmc = RMCMC(rstate, rsamplers, rmodel, n_burn=200, n_iter=800)
    rmcmc.run_mcmc()
    ref_beta = rmcmc.store["beta"]  # (2, 800)
    ref_mean = ref_beta.mean(axis=1).ravel()
    ref_err = _sem(ref_beta, axis=1).ravel()

    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import LinearCombination, ScaledMatrix
    from openmcmc_tpu.samplers import NormalGamma, NormalNormal

    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P_tau", "tau")),
            Normal("beta", mean="mu", precision=ScaledMatrix("P_lam", "lam")),
            Gamma("tau", shape="a_tau", rate="b_tau"),
            Gamma("lam", shape="a_lam", rate="b_lam"),
        ]
    )
    state = {
        "y": y, "X": X, "beta": np.zeros(2), "mu": np.zeros(2),
        "P_tau": st.Diagonal(jnp.ones(N)), "P_lam": st.Diagonal(jnp.ones(2)),
        "tau": 1.0, "lam": 1.0, "a_tau": 1.0, "b_tau": 1.0, "a_lam": 1.0, "b_lam": 1.0,
    }
    samplers = [NormalNormal("beta", mdl), NormalGamma("tau", mdl), NormalGamma("lam", mdl)]
    m = MCMC(dict(state), samplers, mdl, n_burn=200, n_iter=500, n_chains=32, seed=0)
    res = m.run()
    ours = np.asarray(res.store["beta"]).reshape(32, 500, 2)
    our_mean = ours.mean((0, 1))
    our_err = 3.0 * ours.mean(1).std(0) / np.sqrt(32)

    tol = 4.0 * np.sqrt(ref_err**2 + our_err**2) + 1e-3
    assert np.all(np.abs(our_mean - ref_mean) < tol), (our_mean, ref_mean, tol)

    # precision scales agree on the log scale
    ref_tau = float(rmcmc.store["tau"].mean())
    our_tau = float(np.asarray(res.store["tau"]).mean())
    assert abs(np.log(our_tau) - np.log(ref_tau)) < 0.15, (our_tau, ref_tau)


def test_gmrf_smoother_posterior_matches_reference(rng):
    """examples/4 workload: sparse RW1 temporal smoother (the north star)."""
    import scipy.sparse as sp
    from openmcmc import gmrf as rgmrf
    from openmcmc.distribution.distribution import Gamma as RGamma
    from openmcmc.distribution.location_scale import Normal as RNormal
    from openmcmc.mcmc import MCMC as RMCMC
    from openmcmc.model import Model as RModel
    from openmcmc.parameter import Identity as RIdentity
    from openmcmc.parameter import ScaledMatrix as RSM
    from openmcmc.sampler.sampler import NormalGamma as RNG
    from openmcmc.sampler.sampler import NormalNormal as RNN

    n_time = 50
    s = np.linspace(0.0, 30.0, n_time)
    b_true = np.sin(s / 10.0) + 2.0
    y = b_true + rng.normal(0.0, 0.5, n_time)
    P_ref = rgmrf.precision_irregular(s) + 0.001 * sp.eye(n_time)

    rmodel = RModel(
        [
            RNormal("y", mean=RIdentity("b"), precision=RSM(matrix="P_tau", scalar="tau")),
            RNormal("b", mean=RIdentity("mu"), precision=RSM(matrix="P_lam", scalar="lam")),
            RGamma("tau", shape=RIdentity("a_tau"), rate=RIdentity("b_tau")),
            RGamma("lam", shape=RIdentity("a_lam"), rate=RIdentity("b_lam")),
        ]
    )
    rstate = {
        "y": y.reshape(-1, 1), "b": y.reshape(-1, 1).copy(), "mu": np.zeros((n_time, 1)),
        "P_tau": np.eye(n_time), "P_lam": sp.csr_matrix(P_ref),
        "tau": 1.0, "lam": 10.0, "a_tau": 1.0, "b_tau": 1.0, "a_lam": 10.0, "b_lam": 1.0,
    }
    rsamplers = [RNN("b", rmodel), RNG("tau", rmodel), RNG("lam", rmodel)]
    rmcmc = RMCMC(rstate, rsamplers, rmodel, n_burn=200, n_iter=600)
    rmcmc.run_mcmc()
    ref_b = rmcmc.store["b"]  # (n_time, 600)
    ref_mean = ref_b.mean(axis=1)
    ref_err = _sem(ref_b, axis=1)

    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.linalg import structured as st
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import ScaledMatrix
    from openmcmc_tpu.samplers import NormalGamma, NormalNormal

    bands = np.zeros((2, n_time))
    dense = P_ref.toarray()
    bands[0] = np.diag(dense)
    bands[1, : n_time - 1] = np.diag(dense, -1)

    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lam", "lam")),
            Gamma("tau", shape="a_tau", rate="b_tau"),
            Gamma("lam", shape="a_lam", rate="b_lam"),
        ]
    )
    state = {
        "y": y, "b": y.copy(), "mu": np.zeros(n_time),
        "P_tau": st.Diagonal(jnp.ones(n_time)), "P_lam": st.Banded(jnp.asarray(bands)),
        "tau": 1.0, "lam": 10.0, "a_tau": 1.0, "b_tau": 1.0, "a_lam": 10.0, "b_lam": 1.0,
    }
    samplers = [NormalNormal("b", mdl), NormalGamma("tau", mdl), NormalGamma("lam", mdl)]
    m = MCMC(dict(state), samplers, mdl, n_burn=200, n_iter=400, n_chains=32, seed=1)
    res = m.run()
    ours = np.asarray(res.store["b"]).reshape(32, 400, n_time)
    our_mean = ours.mean((0, 1))
    our_err = 3.0 * ours.mean(1).std(0) / np.sqrt(32)

    # max over 50 dims inflates the tail: use a 5-sigma combined gate
    tol = 5.0 * np.sqrt(ref_err**2 + our_err**2) + 1e-3
    assert np.all(np.abs(our_mean - ref_mean) < tol), float(np.max(np.abs(our_mean - ref_mean) / tol))

    ref_tau = float(rmcmc.store["tau"].mean())
    our_tau = float(np.asarray(res.store["tau"]).mean())
    assert abs(np.log(our_tau) - np.log(ref_tau)) < 0.2, (our_tau, ref_tau)


def test_random_walk_posterior_matches_reference(rng):
    """examples/2 workload: RandomWalk MH on a conjugate Normal location."""
    from openmcmc.distribution.location_scale import Normal as RNormal
    from openmcmc.mcmc import MCMC as RMCMC
    from openmcmc.model import Model as RModel
    from openmcmc.parameter import Identity as RIdentity
    from openmcmc.sampler.metropolis_hastings import RandomWalk as RRW

    y = np.array([150.0, 155.0, 190.0, 160.0, 173.0])
    rmodel = RModel(
        [
            RNormal("y", mean=RIdentity("h"), precision=RIdentity("tau")),
            RNormal("h", mean=RIdentity("mu"), precision=RIdentity("lam")),
        ]
    )
    rstate = {
        "y": y.reshape(1, -1), "h": np.array([[200.0]]), "mu": np.array([[160.0]]),
        "tau": np.eye(1) / 200.0, "lam": np.eye(1) / 100.0,
    }
    rmcmc = RMCMC(rstate, [RRW("h", rmodel, step=np.array([[5.0]]))], rmodel,
                  n_burn=500, n_iter=4000)
    rmcmc.run_mcmc()
    ref_h = rmcmc.store["h"].ravel()
    ref_mean = float(ref_h.mean())

    from openmcmc_tpu.distributions import Normal
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.samplers import RandomWalk

    mdl = Model([Normal("y", mean="h", precision="tau"), Normal("h", mean="mu", precision="lam")])
    state = {
        "y": y.reshape(1, -1), "h": 200.0, "mu": 160.0,
        "tau": jnp.eye(1) / 200.0, "lam": jnp.eye(1) / 100.0,
    }
    m = MCMC(dict(state), [RandomWalk("h", mdl, step=5.0)], mdl,
             n_burn=500, n_iter=1000, n_chains=32, seed=2)
    res = m.run()
    our_h = np.asarray(res.store["h"]).reshape(-1)
    # analytic posterior mean for the conjugate model as the common yardstick
    tau, lam = 1.0 / 200.0, 1.0 / 100.0
    post_mean = (lam * 160.0 + tau * y.sum()) / (lam + 5 * tau)
    assert abs(ref_mean - post_mean) < 2.5
    assert abs(float(our_h.mean()) - post_mean) < 1.0
    assert abs(float(our_h.mean()) - ref_mean) < 3.0
