"""End-to-end Gaussian mixture model: MixtureAllocation + NormalGamma + NormalNormal
components in one Gibbs loop (the full mixture machinery of reference sampler.py:210-355
driven jointly, which the reference never exercises end-to-end)."""

import jax
import jax.numpy as jnp
import numpy as np

from openmcmc_tpu.distributions import Categorical, Gamma, Normal
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import MixtureParameterMatrix, MixtureParameterVector
from openmcmc_tpu.samplers import MixtureAllocation, NormalGamma, RandomWalkLoop


def test_two_component_mixture_recovery(rng):
    n, m = 200, 2
    true_means = np.array([-2.0, 3.0])
    true_lam = np.array([4.0, 1.0])
    true_alloc = rng.integers(0, m, n)
    y = rng.normal(true_means[true_alloc], 1 / np.sqrt(true_lam[true_alloc])).reshape(n, 1)

    mdl = Model(
        [
            Normal(
                "y",
                mean=MixtureParameterVector(param="means", allocation="Z"),
                precision=MixtureParameterMatrix(param="lams", allocation="Z"),
            ),
            Categorical("Z", prob="prior"),
            Normal("means", mean="mu0", precision="P0"),
            Gamma("lams", shape="a0", rate="b0"),
        ]
    )
    samplers = [
        MixtureAllocation("Z", mdl, response_param="y"),
        # component means via one-at-a-time random walk (reference supports this;
        # conjugate NormalNormal over mixture means is out of reference scope too)
        RandomWalkLoop("means", mdl, step=0.3),
        NormalGamma("lams", mdl),
    ]
    state = {
        "y": y,
        "Z": (y > 0).astype(np.int32),  # rough init by sign
        "means": np.array([-1.0, 1.0]).reshape(m, 1),
        "lams": np.ones((m, 1)),
        "prior": np.full((n, m), 0.5),
        "mu0": np.zeros((m, 1)),
        "P0": st.Diagonal(jnp.full((m,), 0.01)),
        "a0": np.full((m, 1), 2.0),
        "b0": np.full((m, 1), 1.0),
    }
    mcmc = MCMC(state, samplers, mdl, n_burn=300, n_iter=500, n_chains=8, seed=0)
    res = mcmc.run()

    means = np.asarray(res.store["means"])  # (8, 500, 2, 1)
    est = np.sort(means.mean((0, 1)).ravel())
    np.testing.assert_allclose(est, np.sort(true_means), atol=0.3)
    lams = np.asarray(res.store["lams"]).mean((0, 1)).ravel()
    # precisions recovered within a factor (RW-mean mixing is slow but adequate)
    assert 1.5 < max(lams) < 8.0 and 0.4 < min(lams) < 2.5, lams
    # allocations: most points assigned to the component nearest their true mean
    z_final = np.asarray(res.final_state["Z"])[:, :, 0]  # (8, n)
    mean_order = np.argsort(means.mean((0, 1)).ravel())
    frac_correct = []
    for chain in range(8):
        pred = mean_order[np.searchsorted([0.5], z_final[chain])] if False else z_final[chain]
        # map: component with smaller mean should match true component 0
        remap = np.argsort(means[chain, -100:].mean(0).ravel())
        frac_correct.append(np.mean(np.argsort(remap)[pred] == true_alloc))
    assert np.mean(frac_correct) > 0.85, frac_correct
