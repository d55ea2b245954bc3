"""Example 2: RandomWalk MH vs conjugate NormalNormal on the heights model.

TPU-native port of reference examples/2_samplers.ipynb, but with 512 parallel chains
instead of one: posterior summaries come from cross-chain draws rather than eyeballing
a single trace.
"""

import jax.numpy as jnp
import numpy as np

from openmcmc_tpu.diagnostics import summary
from openmcmc_tpu.distributions import Normal
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.samplers import HMC, NormalNormal, RandomWalk


def main():
    mdl = Model(
        [
            Normal("y", mean="h", precision="tau"),
            Normal("h", mean="mu", precision="lambda"),
        ]
    )
    state = {
        "y": np.array([[150.0, 155.0, 190.0, 160.0, 173.0]]),
        "h": 200.0,
        "tau": jnp.eye(1) / 200.0,
        "mu": 160.0,
        "lambda": jnp.eye(1) / 100.0,
    }

    # exact conjugate posterior for reference
    n, ybar = 5, np.mean(state["y"])
    post_prec = n / 200.0 + 1 / 100.0
    post_mean = (n / 200.0 * ybar + 160.0 / 100.0) / post_prec
    print(f"analytic posterior: mean {post_mean:.2f}, sd {1/np.sqrt(post_prec):.2f}")

    for name, sampler in [
        ("RandomWalk", RandomWalk("h", model=mdl, step=5.0)),
        # HMC (beyond the reference): 8 leapfrog steps per proposal with burn-in
        # step adaptation -- near-iid draws where the random walk crawls
        ("HMC", HMC("h", model=mdl, step=1.0, n_leapfrog=8, adapt_step=True)),
        ("NormalNormal (conjugate)", NormalNormal("h", model=mdl)),
    ]:
        m = MCMC(state, [sampler], model=mdl, n_burn=200, n_iter=1000, n_chains=512, seed=0)
        res = m.run()
        s = summary(res.store["h"][..., 0, 0])
        print(
            f"{name}: mean {float(s['mean']):.2f} sd {float(s['sd']):.2f} "
            f"ess {float(s['ess']):.0f} rhat {float(s['rhat']):.3f}"
        )
        if name in ("RandomWalk", "HMC"):
            print(f"  acceptance: {float(jnp.mean(res.acceptance['h'])):.0f}%")


if __name__ == "__main__":
    main()
