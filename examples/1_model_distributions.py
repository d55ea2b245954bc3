"""Example 1: distributions, models, log-densities and gradients.

TPU-native port of the reference's examples/1_model_distributions.ipynb workload:
a two-level Normal model for heights, evaluated and differentiated through jit.
"""

import jax
import jax.numpy as jnp

from openmcmc_tpu.distributions import Normal
from openmcmc_tpu.mcmc import _coerce_state
from openmcmc_tpu.model import Model


def main():
    my_dist = Normal("y", mean="h", precision="tau")
    mdl = Model(
        [
            Normal("y", mean="h", precision="tau"),
            Normal("h", mean="mu", precision="lambda"),
        ]
    )

    state = _coerce_state(
        {
            "y": [150.0, 155.0, 190.0, 160.0, 173.0],
            "h": 180.0,
            "tau": jnp.eye(1) / 200.0,
            "mu": 160.0,
            "lambda": jnp.eye(1) / 100.0,
        }
    )
    state["y"] = state["y"].reshape(1, -1)  # one response, five replicates

    draws = my_dist.sample(jax.random.PRNGKey(0), state, n=5)
    print("5 draws of y | h:", jnp.round(draws, 1))

    log_p = jax.jit(mdl.log_p)(state)
    print("model log_p:", float(log_p))

    gradient, hessian = mdl.grad_log_p(state, param="h")
    print("grad wrt h:", gradient)
    print("negative hessian wrt h:", hessian)


if __name__ == "__main__":
    main()
