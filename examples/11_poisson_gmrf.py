"""Example 11: Poisson counts over a latent GMRF — non-conjugate inference.

A model family the reference's components support in principle (Poisson response,
LinearCombinationWithTransform exp link, reference distribution.py:461-523 and
parameter.py:231-297) but none of its examples exercise:

    y_i ~ Poisson(exp(b_i))          counts
    b   ~ N(m0, (P0)^{-1})           latent RW1 GMRF field

The latent-field conditional is non-conjugate, so we compare this framework's two
beyond-reference samplers against the reference-style manifold MALA:

  - EllipticalSlice: tuning-free — no step size, gradients or acceptance target;
  - HMC: leapfrog trajectories with burn-in step adaptation;
  - ManifoldMALA: the reference's strongest option (one preconditioned step).

All three must agree on the posterior (they do, within MC error); the point is
the tuning burden and the per-draw mixing.

Run: python examples/11_poisson_gmrf.py
"""

import time

import jax.numpy as jnp
import numpy as np

from openmcmc_tpu.diagnostics import ess_per_param
from openmcmc_tpu.distributions import Normal, Poisson
from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import LinearCombinationWithTransform
from openmcmc_tpu.samplers import HMC, EllipticalSlice, ManifoldMALA


def main(n_chains: int = 512, p: int = 40):
    rng = np.random.default_rng(0)
    s = np.linspace(0.0, 10.0, p)
    b_true = 1.0 + 0.8 * np.sin(s)
    y = rng.poisson(np.exp(b_true)).astype(float).reshape(p, 1)
    P = gmrf.precision_irregular(jnp.asarray(s))
    P = st.Banded((P.bands * 4.0).at[0].add(0.05))  # smoothing RW1 prior

    mdl = Model(
        [
            Poisson("y", rate=LinearCombinationWithTransform(form={"b": "I"}, transform={"b": True})),
            Normal("b", mean="m0", precision="P0"),
        ]
    )
    state = {"y": y, "I": np.eye(p), "b": np.zeros((p, 1)), "m0": np.ones((p, 1)), "P0": P}

    results = {}
    for name, sampler in (
        ("EllipticalSlice", EllipticalSlice("b", mdl)),
        ("HMC", HMC("b", mdl, step=0.05, n_leapfrog=12, adapt_step=True)),
        ("ManifoldMALA", ManifoldMALA("b", mdl, step=0.9, adapt_step=True)),
    ):
        mc = MCMC(dict(state), [sampler], mdl, n_burn=500, n_iter=1000,
                  n_chains=n_chains, seed=3)
        res = mc.run()
        _ = float(jnp.max(res.store["b"]))  # warm/compile barrier
        t0 = time.perf_counter()
        res = mc.run()
        _ = float(jnp.max(res.store["b"]))
        wall = time.perf_counter() - t0
        d = np.asarray(res.store["b"]).reshape(n_chains, 1000, p)
        ess = float(np.asarray(ess_per_param(jnp.asarray(d), chunk_size=8)).mean())
        results[name] = (d.mean((0, 1)), d.std((0, 1)))
        corr = np.corrcoef(results[name][0], b_true)[0, 1]
        print(f"{name:16s} wall={wall:5.2f}s  mean ESS={ess:9.0f}  corr(post-mean, truth)={corr:.3f}")

    m_ref, s_ref = results["ManifoldMALA"]
    for name in ("EllipticalSlice", "HMC"):
        m, sd = results[name]
        dmax = float(np.max(np.abs(m - m_ref) / s_ref))
        print(f"{name} vs mMALA: max |posterior-mean diff| = {dmax:.3f} sd")
        assert dmax < 0.1, name
    return results


if __name__ == "__main__":
    main()
