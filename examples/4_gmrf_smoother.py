"""Example 4: GMRF temporal smoother (the north-star benchmark workload).

TPU-native port of reference examples/4_GMRF_smoother.ipynb: first-order random-walk
(tridiagonal) GMRF prior on a latent signal, conjugate Normal-Normal + Normal-Gamma
Gibbs sweep. The tridiagonal precision stays Banded end-to-end: the conditional
Cholesky/solve kernels are O(n_time) scans vectorized over chains.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from openmcmc_tpu.diagnostics import ess_per_param, rhat_per_param
from openmcmc_tpu.distributions import Gamma, Normal
from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import ScaledMatrix
from openmcmc_tpu.samplers import NormalGamma, NormalNormal


def main(n_chains: int = 1024):
    rng = np.random.default_rng(0)
    n_time = 100
    TIME = pd.date_range("2022-04-01T01:00:00", "2022-04-01T01:01:00", periods=n_time)
    P_lambda = gmrf.precision_temporal(TIME)
    P_lambda = st.Banded(P_lambda.bands.at[0, 0].add(0.001))  # full rank

    t = (TIME - TIME[0]).total_seconds().values
    true_tau = 1.0
    b_true = np.sin(t / 20) + 2 * np.cos(t / 12) + 2
    y = b_true + rng.normal(0, np.sqrt(1 / true_tau), n_time)

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
        "lambda": 100.0,
        "P_lambda": P_lambda,
        "a_lam": 10.0,
        "b_lam": 1.0,
        "tau": 1.0,
        "P_tau": st.Diagonal(jnp.ones(n_time)),
        "a_tau": 1.0,
        "b_tau": 1.0,
    }

    m = MCMC(state, samplers, model=mdl, n_burn=200, n_iter=500, n_chains=n_chains, seed=0)
    t0 = time.perf_counter()
    res = m.run()
    jax.block_until_ready(res.store)
    wall = time.perf_counter() - t0

    b = res.store["b"][..., 0]  # (chains, iters, n_time)
    post = np.asarray(b).mean((0, 1))
    rmse = float(np.sqrt(((post - b_true) ** 2).mean()))
    ess = ess_per_param(b, chunk_size=16)
    print(f"{n_chains} chains x 700 iters in {wall:.2f}s (includes compile on first call)")
    print(f"posterior-mean RMSE vs truth: {rmse:.3f}")
    print(f"tau posterior mean: {float(jnp.mean(res.store['tau'])):.3f} (true {true_tau})")
    print(f"mean ESS over b dims: {float(jnp.mean(ess)):.0f}; max rhat: {float(jnp.max(rhat_per_param(b))):.4f}")


if __name__ == "__main__":
    main()
