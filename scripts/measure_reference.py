"""Measure the reference implementation on the BASELINE.json workload configs.

Runs /root/reference (numpy/scipy, single chain, one CPU core) on each workload and
records wall-clock + ESS into reference_measured.json. Run once per container; the
TPU-side comparison lives in bench_all.py.
"""

import json
import sys
import time

sys.path.insert(0, "/root/reference/src")

import numpy as np
import pandas as pd
from scipy import sparse
from scipy.stats import norm

RESULTS = {}


def ess_of(draws_2d):
    """draws_2d: (dim, n_iter) -> mean multi-chain ESS over dims (our estimator)."""
    import os

    sys.path.insert(0, "/root/repo")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from openmcmc_tpu.diagnostics import ess_per_param

    return float(np.asarray(ess_per_param(jnp.asarray(draws_2d.T[None, :, :]))).mean())


def measure(name, build_and_run):
    t0 = time.perf_counter()
    draws, iters = build_and_run()
    wall = time.perf_counter() - t0
    if name.startswith("mixture"):
        # ESS on the identified quantity (component means sorted per draw) — the
        # mixture posterior is label-permutation invariant; the TPU side applies the
        # same transform in bench_all.py. For a single non-switching chain this is a
        # no-op; if the chain does switch labels mid-run it RAISES the reference ESS,
        # so the comparison never flatters the TPU side.
        draws = np.sort(draws, axis=0)
    ess = ess_of(draws)
    RESULTS[name] = {
        "wall_s": round(wall, 3),
        "iters": iters,
        "iters_per_s": round(iters / wall, 1),
        "ess": round(ess, 1),
        "ess_per_s": round(ess / wall, 2),
    }
    print(name, RESULTS[name], flush=True)


def linreg():
    from openmcmc.distribution.distribution import Gamma
    from openmcmc.distribution.location_scale import Normal
    from openmcmc.mcmc import MCMC
    from openmcmc.model import Model
    from openmcmc.parameter import LinearCombination, ScaledMatrix
    from openmcmc.sampler.sampler import NormalGamma, NormalNormal

    np.random.seed(0)
    N = 100
    true_beta = np.array([2, 0.5])
    x = np.sort(np.random.rand(N))
    X = np.stack([np.ones(N), x], 1)
    y = X @ true_beta + norm.rvs(loc=0, scale=0.1, size=N)
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
        "y": y,
        "X": X,
        "beta": [0, 0],
        "P_tau": sparse.csc_matrix(np.eye(N)),
        "tau": 1,
        "P_lambda": sparse.csc_matrix(np.eye(2)),
        "mu": [0, 0],
        "lambda": 0.01,
        "a_tau": 1e-3,
        "b_tau": 1e-3,
        "a_lambda": 1e-3,
        "b_lambda": 1e-3,
    }
    m = MCMC(state, samplers, model=mdl, n_burn=1000, n_iter=1000)
    m.run_mcmc()
    return m.store["beta"], 2000


def random_walk():
    from openmcmc.distribution.location_scale import Normal
    from openmcmc.mcmc import MCMC
    from openmcmc.model import Model
    from openmcmc.sampler.metropolis_hastings import RandomWalk

    np.random.seed(0)
    mdl = Model([Normal("y", mean="h", precision="tau"), Normal("h", mean="mu", precision="lambda")])
    state = {
        "y": np.array([150, 155, 190, 160, 173], ndmin=2, dtype=float),
        "h": np.array(200.0, ndmin=2),
        "tau": np.array(1 / 200, ndmin=2),
        "mu": np.array(160.0, ndmin=2),
        "lambda": np.array(1 / 100, ndmin=2),
    }
    m = MCMC(state, [RandomWalk("h", model=mdl, step=5.0)], model=mdl, n_burn=0, n_iter=1000)
    m.run_mcmc()
    return m.store["h"], 1000


def mmala():
    from openmcmc.distribution.location_scale import Normal
    from openmcmc.mcmc import MCMC
    from openmcmc.model import Model
    from openmcmc.parameter import LinearCombination, ScaledMatrix
    from openmcmc.sampler.metropolis_hastings import ManifoldMALA

    np.random.seed(0)
    N, d = 100, 5
    X = np.random.normal(size=(N, d))
    beta_true = np.random.normal(size=(d, 1))
    y = X @ beta_true + 0.1 * np.random.normal(size=(N, 1))
    mdl = Model(
        [
            Normal("y", mean=LinearCombination(form={"beta": "X"}), precision=ScaledMatrix("P", "tau")),
            Normal("beta", mean="mu0", precision=ScaledMatrix("P0", "one")),
        ]
    )
    state = {
        "y": y,
        "X": X,
        "beta": np.zeros((d, 1)),
        "P": sparse.csc_matrix(np.eye(N) * 100.0),
        "tau": 1.0,
        "P0": sparse.csc_matrix(np.eye(d) * 0.01),
        "mu0": np.zeros((d, 1)),
        "one": 1.0,
    }
    m = MCMC(state, [ManifoldMALA("beta", model=mdl, step=np.array(1.0))], model=mdl, n_burn=200, n_iter=1000)
    m.run_mcmc()
    return m.store["beta"], 1200


def gmrf_smoother():
    from openmcmc import gmrf
    from openmcmc.distribution.distribution import Gamma
    from openmcmc.distribution.location_scale import Normal
    from openmcmc.mcmc import MCMC
    from openmcmc.model import Model
    from openmcmc.parameter import ScaledMatrix
    from openmcmc.sampler.sampler import NormalGamma, NormalNormal

    np.random.seed(0)
    n_time = 100
    TIME = pd.date_range("2022-04-01T01:00:00", "2022-04-01T01:01:00", periods=n_time)
    P_lambda = gmrf.precision_temporal(time=TIME)
    P_lambda = sparse.lil_matrix(P_lambda)
    P_lambda[0, 0] += 0.001
    P_lambda = P_lambda.tocsc()
    t = (TIME - TIME[0]).total_seconds()
    b = np.sin(t / 20) + 2 * np.cos(t / 12) + 2
    y = b + norm.rvs(loc=0, scale=1.0, size=n_time)
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("lambda", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    state = {
        "y": y,
        "b": y,
        "mu": np.zeros(n_time),
        "lambda": 100,
        "P_lambda": P_lambda,
        "a_lam": 10,
        "b_lam": 1,
        "tau": 1,
        "P_tau": sparse.csc_matrix(np.eye(n_time)),
        "a_tau": 1,
        "b_tau": 1,
    }
    samplers = [NormalNormal("b", mdl), NormalGamma("lambda", mdl), NormalGamma("tau", mdl)]
    m = MCMC(state, samplers, model=mdl, n_burn=200, n_iter=500)
    m.run_mcmc()
    return m.store["b"], 700


def truncated_smoother():
    """gmrf_smoother with a box-truncated latent prior: the reference's
    NormalNormal then runs gibbs_canonical_truncated_normal (one sequential
    scipy truncnorm draw per dimension per sweep, reference gmrf.py:201-266,
    sampler.py:199-206)."""
    from openmcmc import gmrf
    from openmcmc.distribution.distribution import Gamma
    from openmcmc.distribution.location_scale import Normal
    from openmcmc.mcmc import MCMC
    from openmcmc.model import Model
    from openmcmc.parameter import ScaledMatrix
    from openmcmc.sampler.sampler import NormalGamma, NormalNormal

    np.random.seed(0)
    n_time = 100
    TIME = pd.date_range("2022-04-01T01:00:00", "2022-04-01T01:01:00", periods=n_time)
    P_lambda = sparse.lil_matrix(gmrf.precision_temporal(time=TIME))
    P_lambda[0, 0] += 0.001
    P_lambda = P_lambda.tocsc()
    t = (TIME - TIME[0]).total_seconds()
    b = np.sin(t / 20) + 2 * np.cos(t / 12) + 2
    y = b + norm.rvs(loc=0, scale=1.0, size=n_time)
    lo, hi = 0.0, 3.5  # actively truncates: b_true spans ~[-1, 5]
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            # the reference's gibbs_canonical_truncated_normal requires SCALAR
            # bounds (its `lower == -np.inf` fast-path check, gmrf.py:231,
            # raises on arrays; scalars are then broadcast at gmrf.py:241-242)
            Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda"),
                   domain_response_lower=lo, domain_response_upper=hi),
            Gamma("lambda", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    state = {
        "y": y, "b": np.clip(y, lo + 1e-3, hi - 1e-3), "mu": np.zeros(n_time),
        "lambda": 100, "P_lambda": P_lambda, "a_lam": 10, "b_lam": 1,
        "tau": 1, "P_tau": sparse.csc_matrix(np.eye(n_time)), "a_tau": 1, "b_tau": 1,
    }
    samplers = [NormalNormal("b", mdl), NormalGamma("lambda", mdl), NormalGamma("tau", mdl)]
    m = MCMC(state, samplers, model=mdl, n_burn=100, n_iter=250)
    m.run_mcmc()
    return m.store["b"], 350


def _small_world_Q(p=1024, mean_degree=6, seed=0):
    """Proper CAR precision on an Erdos-Renyi expander graph: the adjacency
    whose RCM bandwidth stays large (measured bw ~ 735 at p = 1024; ring
    graphs with a few long links still compress to bw ~ 100) — the regime
    where banded orderings cannot help and the reference's SuperLU generality
    is the capability under test (reference gmrf.py:489-520)."""
    rng = np.random.default_rng(seed)
    ne = p * mean_degree // 2
    a = rng.integers(0, p, ne * 2)
    b = rng.integers(0, p, ne * 2)
    keep = a != b
    A = sparse.coo_matrix((np.ones(keep.sum()), (a[keep], b[keep])), shape=(p, p))
    A = ((A + A.T) > 0).astype(np.float64)
    deg = np.asarray(A.sum(axis=1)).ravel()
    return (sparse.diags(deg + 0.5) - A).tocsc()


def car_smoother():
    """CAR smoother on the small-world graph: reference factors the sparse
    conditional precision with SuperLU every sweep (gmrf.py:489-520)."""
    from openmcmc.distribution.distribution import Gamma
    from openmcmc.distribution.location_scale import Normal
    from openmcmc.mcmc import MCMC
    from openmcmc.model import Model
    from openmcmc.parameter import ScaledMatrix
    from openmcmc.sampler.sampler import NormalGamma, NormalNormal

    np.random.seed(0)
    p = 1024
    Q = _small_world_Q(p)
    field = np.sin(np.linspace(0, 12, p))
    y = field + norm.rvs(loc=0, scale=0.5, size=p)
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("lambda", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    state = {
        "y": y, "b": y.copy(), "mu": np.zeros(p),
        "lambda": 2.0, "P_lambda": Q, "a_lam": 2.0, "b_lam": 1.0,
        "tau": 1.0, "P_tau": sparse.identity(p, format="csc"), "a_tau": 1.0, "b_tau": 1.0,
    }
    samplers = [NormalNormal("b", mdl), NormalGamma("lambda", mdl), NormalGamma("tau", mdl)]
    m = MCMC(state, samplers, model=mdl, n_burn=20, n_iter=60)
    m.run_mcmc()
    return m.store["b"], 80


def reversible_jump():
    sys.path.insert(0, "/root/reference/tests")
    import importlib

    trj = importlib.import_module("test_reversible_jump")
    from openmcmc.mcmc import MCMC

    np.random.seed(0)
    basis_limits = np.array([-10, 10])
    scale_limits = np.array([0.5, 2])
    # reuse the reference's own fixture logic
    state = trj.fix_state.__wrapped__(basis_limits)
    model = trj.fix_model.__wrapped__(basis_limits)
    samplers = trj.fix_samplers.__wrapped__(model, basis_limits, scale_limits)
    m = MCMC(state=state, samplers=samplers, model=model, n_burn=0, n_iter=5000)
    m.run_mcmc()
    return m.store["n_basis"], 5000


def reversible_jump_regression():
    """The reference's matched-transition regression use case: same knot-basis RJ
    stack, but y ~ N(B beta, (tau_y I)^-1) with a conjugate NormalGamma(tau_y)
    appended to the sweep (the reference test fixture's y IS generated from this
    model, reference tests/test_reversible_jump.py fix_state; the Null response is
    swapped for the real Gaussian likelihood)."""
    sys.path.insert(0, "/root/reference/tests")
    import importlib

    trj = importlib.import_module("test_reversible_jump")
    from openmcmc import parameter
    from openmcmc.distribution.distribution import Gamma
    from openmcmc.distribution.location_scale import Normal
    from openmcmc.mcmc import MCMC
    from openmcmc.model import Model
    from openmcmc.sampler.sampler import NormalGamma

    np.random.seed(0)
    basis_limits = np.array([-10, 10])
    scale_limits = np.array([0.5, 2])
    state = trj.fix_state.__wrapped__(basis_limits)
    null_model = trj.fix_model.__wrapped__(basis_limits)
    response = Normal(
        response="y",
        mean=parameter.LinearCombination(form={"beta": "B"}),
        precision=parameter.ScaledMatrix(matrix="P", scalar="tau_y"),
    )
    model = Model([response] + [null_model[k] for k in null_model if k != "y"]
                  + [Gamma("tau_y", shape="a_tau", rate="b_tau")])
    state["a_tau"] = 2.0 * np.ones((1, 1))
    state["b_tau"] = 0.01 * np.ones((1, 1))
    state["tau_y"] = 100.0
    samplers = trj.fix_samplers.__wrapped__(model, basis_limits, scale_limits)
    samplers.append(NormalGamma(param="tau_y", model=model))
    m = MCMC(state=state, samplers=samplers, model=model, n_burn=0, n_iter=2000)
    m.run_mcmc()
    return m.store["n_basis"], 2000


def mixture():
    """Gaussian mixture: MixtureAllocation + RandomWalkLoop(means) + NormalGamma(lams)
    (reference sampler.py:291-355 allocation machinery driven end-to-end)."""
    from openmcmc.distribution.distribution import Categorical, Gamma
    from openmcmc.distribution.location_scale import Normal
    from openmcmc.mcmc import MCMC
    from openmcmc.model import Model
    from openmcmc.parameter import MixtureParameterMatrix, MixtureParameterVector
    from openmcmc.sampler.metropolis_hastings import RandomWalkLoop
    from openmcmc.sampler.sampler import MixtureAllocation, NormalGamma

    np.random.seed(0)
    n, m_comp = 200, 2
    true_means = np.array([-2.0, 3.0])
    true_lam = np.array([4.0, 1.0])
    alloc = np.random.randint(0, m_comp, n)
    y = np.random.normal(true_means[alloc], 1.0 / np.sqrt(true_lam[alloc])).reshape(n, 1)
    model = Model(
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
    state = {
        "y": y,
        "Z": (y > 0).astype(int),
        "means": np.array([-1.0, 1.0]).reshape(m_comp, 1),
        "lams": np.ones((m_comp, 1)),
        "prior": np.full((n, m_comp), 0.5),
        "mu0": np.zeros((m_comp, 1)),
        "P0": np.eye(m_comp) * 0.01,
        "a0": np.full((m_comp, 1), 2.0),
        "b0": np.full((m_comp, 1), 1.0),
    }
    samplers = [
        MixtureAllocation(param="Z", model=model, response_param="y"),
        RandomWalkLoop(param="means", model=model, step=np.array([[0.3]]), domain_limits=np.array([[-20.0, 20.0], [-20.0, 20.0]])),
        NormalGamma(param="lams", model=model),
    ]
    m = MCMC(state=state, samplers=samplers, model=model, n_burn=500, n_iter=1000)
    m.run_mcmc()
    return m.store["means"], 1500


def lattice_smoother():
    """2-D spatial field: 64 x 64 lattice (p = 4096), 5-point-stencil intrinsic
    GMRF prior + ridge, iid noise. The flagship 'large sparse precision' workload:
    the reference factors Q through SuperLU (gmrf.py:489-520) every NormalNormal
    sweep AND every stored log_p."""
    from openmcmc.distribution.distribution import Gamma
    from openmcmc.distribution.location_scale import Normal
    from openmcmc.mcmc import MCMC
    from openmcmc.model import Model
    from openmcmc.parameter import ScaledMatrix
    from openmcmc.sampler.sampler import NormalGamma, NormalNormal

    np.random.seed(0)
    side = 64
    p = side * side
    # 5-point stencil: D - A over the 4-neighbour grid graph, + small ridge
    A = sparse.lil_matrix((p, p))
    for i in range(side):
        for j in range(side):
            k = i * side + j
            if i + 1 < side:
                A[k, k + side] = A[k + side, k] = -1.0
            if j + 1 < side:
                A[k, k + 1] = A[k + 1, k] = -1.0
    deg = -np.asarray(A.sum(axis=1)).ravel()
    P_lambda = (sparse.diags(deg) + A + 1e-3 * sparse.eye(p)).tocsc()
    xs, ys_ = np.meshgrid(np.linspace(0, 6, side), np.linspace(0, 6, side))
    field = np.sin(xs) * np.cos(ys_)
    y = field.ravel() + norm.rvs(loc=0, scale=0.3, size=p)
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("P_lambda", "lambda")),
            Gamma("lambda", shape="a_lam", rate="b_lam"),
            Gamma("tau", shape="a_tau", rate="b_tau"),
        ]
    )
    state = {
        "y": y, "b": y.copy(), "mu": np.zeros(p),
        "lambda": 10.0, "P_lambda": P_lambda, "a_lam": 10.0, "b_lam": 1.0,
        "tau": 1.0, "P_tau": sparse.eye(p, format="csc"), "a_tau": 1.0, "b_tau": 1.0,
    }
    samplers = [NormalNormal("b", mdl), NormalGamma("lambda", mdl), NormalGamma("tau", mdl)]
    m = MCMC(state, samplers, model=mdl, n_burn=20, n_iter=80)
    m.run_mcmc()
    return m.store["b"], 100


def mixture_large():
    """Large mixture: n = 100,000 points, K = 16 components (the scale the fused
    mixture engine streams from HBM; reference sampler.py:291-355 has no n or K
    limit, just one CPU)."""
    from openmcmc.distribution.distribution import Categorical, Gamma
    from openmcmc.distribution.location_scale import Normal
    from openmcmc.mcmc import MCMC
    from openmcmc.model import Model
    from openmcmc.parameter import MixtureParameterMatrix, MixtureParameterVector
    from openmcmc.sampler.metropolis_hastings import RandomWalkLoop
    from openmcmc.sampler.sampler import MixtureAllocation, NormalGamma

    np.random.seed(0)
    n, m_comp = 100_000, 16
    true_means = np.linspace(-22.5, 22.5, m_comp)
    alloc = np.random.randint(0, m_comp, n)
    y = np.random.normal(true_means[alloc], 0.7).reshape(n, 1)
    model = Model(
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
    state = {
        "y": y,
        "Z": np.clip(((y.ravel() + 24.0) / 3.0).astype(int), 0, m_comp - 1).reshape(n, 1),
        "means": (true_means + np.random.normal(0, 0.3, m_comp)).reshape(m_comp, 1),
        "lams": np.ones((m_comp, 1)),
        "prior": np.full((n, m_comp), 1.0 / m_comp),
        "mu0": np.zeros((m_comp, 1)),
        "P0": np.eye(m_comp) * 0.01,
        "a0": np.full((m_comp, 1), 2.0),
        "b0": np.full((m_comp, 1), 1.0),
    }
    samplers = [
        MixtureAllocation(param="Z", model=model, response_param="y"),
        RandomWalkLoop(param="means", model=model, step=np.array([[0.3]]),
                       domain_limits=np.tile(np.array([[-40.0, 40.0]]), (m_comp, 1))),
        NormalGamma(param="lams", model=model),
    ]
    m = MCMC(state=state, samplers=samplers, model=model, n_burn=50, n_iter=150)
    m.run_mcmc()
    return m.store["means"], 200


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    table = [
        ("linreg_gibbs", linreg),
        ("random_walk_mh", random_walk),
        ("mmala", mmala),
        ("gmrf_smoother", gmrf_smoother),
        ("reversible_jump", reversible_jump),
        ("reversible_jump_regression", reversible_jump_regression),
        ("mixture", mixture),
        ("lattice_smoother", lattice_smoother),
        ("mixture_large", mixture_large),
        ("truncated_smoother", truncated_smoother),
        ("car_smoother", car_smoother),
    ]
    out_path = "/root/repo/reference_measured.json"
    import os

    if os.path.exists(out_path):
        with open(out_path) as f:
            RESULTS.update(json.load(f))
    for name, fn in table:
        if only is None or name == only:
            measure(name, fn)
    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS, indent=1))
