"""Example 5: reversible-jump knot selection with padded static shapes.

The reference exercises RJ-MCMC in its test suite (tests/test_reversible_jump.py);
here it is a first-class example: a Gaussian-kernel basis regression where the number
of knots is unknown, sampled by birth/death moves with prediction-matched coefficient
transitions. All shapes are static: parameters are padded to n_max columns with an
integer active count (see openmcmc_tpu.padding).
"""

import jax
import jax.numpy as jnp
import numpy as np

from openmcmc_tpu import padding
from openmcmc_tpu.distributions import Gamma, Normal, Poisson, Uniform
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import (
    LinearCombination,
    MixtureParameterMatrix,
    MixtureParameterVector,
    ScaledMatrix,
)
from openmcmc_tpu.samplers import ManifoldMALA, RandomWalkLoop, ReversibleJump

from openmcmc_tpu.basis import GaussianKernelBasis

N_MAX, N_DATA, LIMITS = 10, 80, (-10.0, 10.0)

# shared basis hooks: one implementation for tests/examples/benchmarks, and the
# structure engine="auto" recognizes for the fused RJ kernel
_BASIS = GaussianKernelBasis()
make_basis = _BASIS.make
birth_fn = _BASIS.birth
death_fn = _BASIS.death
move_fn = _BASIS.move
move_vec_fn = _BASIS.move_vec


def main():
    rng = np.random.default_rng(1)
    # true signal: 3 bumps
    X = np.sort(rng.uniform(*LIMITS, (N_DATA, 1)), axis=0)
    true_knots = np.array([-6.0, 0.0, 5.0])
    signal = sum(2.0 * np.exp(-0.5 * (X - k) ** 2) / np.sqrt(2 * np.pi) for k in true_knots)
    y = signal + rng.normal(0, 0.05, (N_DATA, 1))

    k0 = 4
    theta = np.zeros((1, N_MAX)); theta[0, :k0] = np.linspace(-8, 8, k0)
    omega = np.zeros((1, N_MAX)); omega[0, :k0] = 1.0
    state = {
        "X": X, "y": y,
        "n_basis": np.array([[k0]], dtype=np.int32),
        "theta": theta, "omega": omega,
        "beta": np.zeros((N_MAX, 1)),
        "alloc_beta": np.zeros((N_MAX, 1), dtype=np.int32),
        "mu_beta": 0.0, "tau_beta": 1.0 / 4.0,
        "rho": 3.0, "a_omega": 3.0, "b_omega": 2.0,
        "P": st.Diagonal(jnp.ones(N_DATA)), "tau_y": 1.0 / 0.05**2,
    }
    state["B"] = np.asarray(make_basis(jnp.asarray(X), jnp.asarray(theta), jnp.asarray(omega), k0))

    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "B"}), precision=ScaledMatrix("P", "tau_y")),
            Normal(
                "beta",
                mean=MixtureParameterVector("mu_beta", "alloc_beta"),
                precision=MixtureParameterMatrix("tau_beta", "alloc_beta"),
                n_active="n_basis",
            ),
            Poisson("n_basis", rate="rho"),
            Uniform("theta", domain_response_lower=LIMITS[0], domain_response_upper=LIMITS[1], n_active="n_basis"),
            Gamma("omega", shape="a_omega", rate="b_omega", n_active="n_basis"),
        ]
    )
    samplers = [
        ManifoldMALA("beta", mdl, step=0.4, active_count="n_basis"),
        RandomWalkLoop("theta", mdl, step=0.5, domain_limits=np.asarray([LIMITS]),
                       state_update_function=move_fn, vector_state_update_function=move_vec_fn,
                       active_count="n_basis", updated_names=["theta", "B"]),
        RandomWalkLoop("omega", mdl, step=0.1, domain_limits=np.asarray([[0.5, 2.0]]),
                       state_update_function=move_fn, vector_state_update_function=move_vec_fn,
                       active_count="n_basis", updated_names=["omega", "B"]),
        ReversibleJump("n_basis", mdl, associated_params=["theta", "omega"], n_max=N_MAX,
                       state_birth_function=birth_fn, state_death_function=death_fn,
                       matching_params={"variable": "beta", "matrix": "B", "scale": 1.0, "limits": [-10.0, 10.0]}),
    ]

    m = MCMC(state, samplers, model=mdl, n_burn=500, n_iter=2000, n_chains=32, seed=0)
    m.store_names = ["n_basis", "beta", "B"]
    res = m.run()

    nb = np.asarray(res.store["n_basis"]).reshape(32, -1)
    vals, counts = np.unique(nb[:, ::20], return_counts=True)
    print("posterior over number of knots (true signal has 3 bumps):")
    for v, c in zip(vals.astype(int), counts):
        print(f"  n={v}: {c / counts.sum():.2f}")
    # posterior fit
    fitted = np.einsum("cinm,cims->cins", np.asarray(res.store["B"]), np.asarray(res.store["beta"]))
    post_fit = fitted.mean((0, 1))
    rmse = float(np.sqrt(((post_fit - signal) ** 2).mean()))
    print(f"fit RMSE vs true signal: {rmse:.4f} (noise sd 0.05)")
    print(f"RJ acceptance: {float(np.asarray(res.acceptance['n_basis']).mean()):.0f}%")


if __name__ == "__main__":
    main()
