"""Example 10: the fused whole-run engines and their generic-driver contract.

``MCMC.run(engine="auto")`` structurally matches a model + sampler configuration
against the fused Pallas families (openmcmc_tpu.fused) and, when one applies,
executes the ENTIRE run -- burn-in, every Gibbs/MH sweep, storage -- as a single
kernel launch. The result is contract-identical to the generic scan/vmap driver:

- store keys and shapes (including post-hoc fitted responses via
  ``Model(..., response={...})``),
- log_post, acceptance stats counted over burn + sampling,
- Robbins-Monro ``adapt_step`` with the same burn-in window and target,
- truncated random-walk proposals (``domain_limits``),
- ``n_thin`` (the launch runs n_thin-scaled sweeps; the draw axis is strided),
- chain-axis ``Mesh`` sharding (one independent kernel per device shard).

This example runs the adapted + truncated random-walk heights model (reference
examples/2_samplers.ipynb) both ways and compares. On CPU the fused engines run
under Pallas interpret mode (deterministic PRNG stub), so the comparison below
is contract/shape-level there; on a real TPU both paths are statistical and the
posteriors match within MC error.
"""

import jax
import numpy as np
import jax.numpy as jnp

from openmcmc_tpu.diagnostics import summary
from openmcmc_tpu.distributions import Normal
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.samplers import RandomWalk


def build(seed, n_burn=1500, n_iter=1000, n_chains=4096):
    mdl = Model(
        [
            Normal("y", mean="h", precision="tau"),
            Normal("h", mean="mu", precision="lambda"),
        ],
        response={"y": "mean"},  # fitted values stored as y_fitted
    )
    state = {
        "y": np.array([[150.0, 155.0, 190.0, 160.0, 173.0]]),
        "h": 170.0,
        "tau": jnp.eye(1) / 200.0,
        "mu": 160.0,
        "lambda": jnp.eye(1) / 100.0,
    }
    sampler = RandomWalk(
        "h",
        mdl,
        step=40.0,  # far too large: adaptation must fix it during burn-in
        adapt_step=True,
        target_accept=0.44,
        domain_limits=[[100.0, 220.0]],
    )
    return MCMC(state, [sampler], mdl, n_burn=n_burn, n_iter=n_iter, n_thin=2,
                n_chains=n_chains, seed=seed)


def main():
    on_tpu = jax.default_backend() == "tpu"
    # CPU interpret mode executes the kernel iteration-by-iteration: keep it tiny
    sizes = {} if on_tpu else dict(n_burn=8, n_iter=10, n_chains=64)

    m_gen = build(seed=0, **sizes)
    res_gen = m_gen.run(engine="generic")
    print("generic:", summary(res_gen.store["h"]))
    print("generic adapted step:",
          float(np.exp(np.asarray(res_gen.stats["h"]["log_step"])).mean()))

    m_fused = build(seed=1, **sizes)
    if on_tpu:
        res_fused = m_fused.run(engine="auto")
    else:
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            res_fused = m_fused.run(engine="auto")
    print("engine used:", res_fused.engine)
    assert res_fused.engine == "fused_random_walk"
    assert set(res_fused.store) == set(res_gen.store), (
        set(res_fused.store), set(res_gen.store))
    for name in res_gen.store:
        assert res_fused.store[name].shape == res_gen.store[name].shape

    if on_tpu:
        h_f = np.asarray(res_fused.store["h"]).reshape(-1)
        h_g = np.asarray(res_gen.store["h"]).reshape(-1)
        print("fused:  ", summary(res_fused.store["h"]))
        print("fused adapted step:",
              float(np.exp(np.asarray(res_fused.stats["h"]["log_step"])).mean()))
        se = h_g.std() / np.sqrt(h_g.size)
        assert abs(h_f.mean() - h_g.mean()) < 8 * se
    print("store keys (both drivers):", sorted(res_gen.store))
    print("OK")


if __name__ == "__main__":
    main()
