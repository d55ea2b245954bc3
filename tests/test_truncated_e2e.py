"""End-to-end truncated workloads: truncated conjugate NormalNormal (the sequential
canonical Gibbs sweep, reference gmrf.py:201-266 in a real driver loop) and a
LogNormal-response model driven by RandomWalk."""

import jax.numpy as jnp
import numpy as np
import scipy.stats as sps

from openmcmc_tpu.distributions import LogNormal, Normal
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import ScaledMatrix
from openmcmc_tpu.samplers import NormalNormal, RandomWalk


def test_truncated_normal_normal_gibbs(rng):
    """Nonnegative latent mean with a truncated Gaussian prior: the conjugate update
    must use the truncated canonical Gibbs sweep and respect the domain."""
    n = 4
    mu_true = np.array([0.3, 0.1, 0.8, 0.05])
    y = rng.normal(mu_true, 0.3, size=(50, n)).T  # (n, 50)
    mdl = Model(
        [
            Normal("y", mean="m", precision=ScaledMatrix("P", "tau")),
            Normal(
                "m",
                mean="mu0",
                precision=ScaledMatrix("P0", "one"),
                domain_response_lower=0.0,
                domain_response_upper=2.0,
            ),
        ]
    )
    state = {
        "y": y,
        "m": np.full((n, 1), 0.5),
        "mu0": np.zeros((n, 1)),
        "P": st.Diagonal(jnp.full((n,), 1 / 0.09)),
        "P0": st.Diagonal(jnp.ones(n)),
        "tau": 1.0,
        "one": 1.0,
    }
    mcmc = MCMC(state, [NormalNormal("m", mdl)], mdl, n_burn=200, n_iter=400, n_chains=16, seed=0)
    res = mcmc.run()
    m = np.asarray(res.store["m"])
    assert m.min() >= 0.0 and m.max() <= 2.0
    # posterior mean approx the (truncation-adjusted) GLS value; loose check
    post_prec = 50 / 0.09 + 1.0
    want = (y.sum(1) / 0.09) / post_prec
    got = m.mean((0, 1)).ravel()
    assert np.all(np.abs(got - np.clip(want, 0, 2)) < 0.1), (got, want)


def test_lognormal_response_random_walk(rng):
    """LogNormal-response model sampled with RW: posterior of the log-scale mean."""
    n = 40
    true_mu = 0.5
    x = np.exp(rng.normal(true_mu, 0.5, size=(1, n)))
    mdl = Model(
        [
            LogNormal("x", mean="mu", precision="tau"),
            Normal("mu", mean="m0", precision="p0"),
        ]
    )
    state = {"x": x, "tau": np.eye(1) * 4.0, "m0": 0.0, "p0": np.eye(1) * 0.01}
    mcmc = MCMC(state, [RandomWalk("mu", mdl, step=0.3, adapt_step=True)], mdl,
                n_burn=400, n_iter=800, n_chains=16, seed=1)
    res = mcmc.run()
    mu = np.asarray(res.store["mu"])
    post_prec = n * 4.0 + 0.01
    want = 4.0 * np.log(x).sum() / post_prec
    assert abs(mu.mean() - want) < 4 / np.sqrt(post_prec) / np.sqrt(50), (mu.mean(), want)
