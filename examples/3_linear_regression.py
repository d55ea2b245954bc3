"""Example 3: Bayesian linear regression with conjugate Gibbs sampling.

TPU-native port of reference examples/3_linear_regression.ipynb: NormalNormal on the
coefficients + NormalGamma on the noise and prior precisions, 1024 parallel chains.
"""

import jax.numpy as jnp
import numpy as np

from openmcmc_tpu.diagnostics import summary
from openmcmc_tpu.distributions import Gamma, Normal
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import LinearCombination, ScaledMatrix
from openmcmc_tpu.samplers import NormalGamma, NormalNormal


def main():
    rng = np.random.default_rng(0)
    N = 100
    true_beta = np.array([2.0, 0.5])
    true_tau = 100.0
    x = np.sort(rng.random(N))
    X = np.stack([np.ones(N), x], 1)
    y = X @ true_beta + rng.normal(0, np.sqrt(1 / true_tau), N)

    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P_tau", "tau")),
            Normal("beta", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("tau", shape="a_tau", rate="b_tau"),
            Gamma("lambda", shape="a_lambda", rate="b_lambda"),
        ],
        response={"y": "mean"},
    )
    samplers = [NormalNormal("beta", mdl), NormalGamma("tau", mdl), NormalGamma("lambda", mdl)]
    state = {
        "y": y,
        "X": X,
        "beta": [0.0, 0.0],
        "P_tau": st.Diagonal(jnp.ones(N)),
        "tau": 1.0,
        "P_lambda": st.Diagonal(jnp.ones(2)),
        "mu": [0.0, 0.0],
        "lambda": 0.01,
        "a_tau": 1e-3,
        "b_tau": 1e-3,
        "a_lambda": 1e-3,
        "b_lambda": 1e-3,
    }

    m = MCMC(state, samplers, model=mdl, n_burn=1000, n_iter=1000, n_chains=1024, seed=0)
    res = m.run()

    beta = res.store["beta"][..., 0]  # (chains, iters, 2)
    s = summary(beta)
    print("posterior beta mean:", np.round(np.asarray(s["mean"]), 3), "(true:", true_beta, ")")
    print("posterior beta sd:  ", np.round(np.asarray(s["sd"]), 4))
    print("ess:", np.round(np.asarray(s["ess"]), 0), "rhat:", np.round(np.asarray(s["rhat"]), 4))
    print("posterior tau mean:", float(jnp.mean(res.store["tau"])), "(true:", true_tau, ")")
    fitted = res.store["y_fitted"]
    q = np.quantile(np.asarray(fitted).reshape(-1, N), [0.025, 0.5, 0.975], axis=0)
    cover = np.mean((X @ true_beta >= q[0]) & (X @ true_beta <= q[2]))
    print(f"95% fitted band covers the true line at {100 * cover:.0f}% of locations")


if __name__ == "__main__":
    main()
