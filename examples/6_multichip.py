"""Example 6: scaling chains over a device mesh.

No reference analog (the reference is single-process): chains are sharded over a
jax.sharding.Mesh; sampling is communication-free and pooled diagnostics reduce over
ICI. Run with real multi-chip hardware, or simulate on CPU:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/6_multichip.py
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the container's TPU plugin ignores the env var; force the CPU backend so the
    # documented simulation command works (same workaround as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from openmcmc_tpu.distributions import Gamma, Normal
from openmcmc_tpu.linalg import gmrf, structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parallel import make_mesh, pooled_mean_var
from openmcmc_tpu.parameters import ScaledMatrix
from openmcmc_tpu.samplers import NormalGamma, NormalNormal


def main():
    n_dev = jax.device_count()
    mesh = make_mesh()
    print(f"devices: {n_dev}, mesh: {mesh}")

    rng = np.random.default_rng(0)
    n_time = 50
    P = gmrf.precision_irregular(jnp.arange(n_time, dtype=jnp.float32))
    P = st.Banded(P.bands.at[0, 0].add(0.001))
    y = np.sin(np.arange(n_time) / 8.0) + rng.normal(0, 0.3, n_time)

    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lam", "lam")),
            Gamma("lam", shape="al", rate="bl"),
            Gamma("tau", shape="at", rate="bt"),
        ]
    )
    samplers = [NormalNormal("b", mdl), NormalGamma("lam", mdl), NormalGamma("tau", mdl)]
    state = {
        "y": y, "b": y.copy(), "mu": np.zeros(n_time), "lam": 10.0, "P_lam": P,
        "al": 10.0, "bl": 1.0, "tau": 1.0, "P_tau": st.Diagonal(jnp.ones(n_time)),
        "at": 1.0, "bt": 1.0,
    }
    n_chains = 128 * n_dev
    m = MCMC(state, samplers, model=mdl, n_burn=100, n_iter=300, n_chains=n_chains, seed=0, mesh=mesh)
    res = m.run()
    print("store sharded over", len(res.store["b"].sharding.device_set), "devices")

    # pooled diagnostics ride ICI collectives; the sampling loop never communicates
    mean, var = pooled_mean_var(res.store["b"][:, -1, :, 0], mesh)
    print("pooled cross-chain posterior mean head:", np.round(np.asarray(mean[:5]), 3))
    print("pooled cross-chain posterior var head: ", np.round(np.asarray(var[:5]), 4))


if __name__ == "__main__":
    main()
