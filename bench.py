"""Benchmark: aggregate ESS/sec on the GMRF temporal smoother, 8k parallel chains.

North-star workload from BASELINE.json / reference examples/4_GMRF_smoother.ipynb:
n_time=100 RW1 temporal GMRF, Normal-Normal + 2x Normal-Gamma conjugate Gibbs,
n_burn=200, n_iter=500. The reference runs one chain on one CPU core; this framework
runs n_chains vmapped chains on one TPU chip with banded-Cholesky scan kernels.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline = (our aggregate ESS/sec) / (reference ESS/sec measured in
baseline_measured.json on this container: 269.8 ESS/sec for the mean-over-dims ESS of
the smoothed field b).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from openmcmc_tpu.diagnostics import ess_per_param
from openmcmc_tpu.distributions import Gamma, Normal
from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.mcmc import MCMC
from openmcmc_tpu.model import Model
from openmcmc_tpu.parameters import ScaledMatrix
from openmcmc_tpu.samplers import NormalGamma, NormalNormal

N_TIME = 100
N_BURN = 200
N_ITER = 500
N_CHAINS = 8192


def build_mcmc(n_chains: int, n_burn: int, n_iter: int) -> MCMC:
    rng = np.random.default_rng(0)
    s = np.linspace(0.0, 60.0, N_TIME)  # 60 seconds of samples, as the example
    P_lambda = gmrf.precision_irregular(jnp.asarray(s))
    P_lambda = st.Banded(P_lambda.bands.at[0, 0].add(0.001))
    b_true = np.sin(s / 20.0) + 2.0 * np.cos(s / 12.0) + 2.0
    y = b_true + rng.normal(0.0, 1.0, N_TIME)

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
        "y": y,
        "b": y.copy(),
        "mu": np.zeros(N_TIME),
        "lambda": 100.0,
        "P_lambda": P_lambda,
        "a_lam": 10.0,
        "b_lam": 1.0,
        "tau": 1.0,
        "P_tau": st.Diagonal(jnp.ones(N_TIME)),
        "a_tau": 1.0,
        "b_tau": 1.0,
    }
    mcmc = MCMC(state, samplers, mdl, n_burn=n_burn, n_iter=n_iter, n_chains=n_chains, seed=7)
    mcmc.store_names = ["b", "tau", "lambda"]
    mcmc.model.response = None  # skip fitted-value storage in the benchmark
    return mcmc


def main():
    # The benchmark drives the PUBLIC API end-to-end: MCMC.run(engine="auto"),
    # which structurally matches this model to the fully-fused one-launch
    # SPECTRAL smoother (fused/spectral.py -- iterations elementwise in
    # eigencoordinates, one MXU matmul per stored draw; statistically identical
    # to the generic driver, tests/test_spectral.py). The timed number therefore
    # includes dispatch matching + MCMCResult repackaging -- the user-visible
    # throughput, and a canary for any dispatcher regression that would stop the
    # flagship model from matching (asserted below).
    mcmc = build_mcmc(N_CHAINS, N_BURN, N_ITER)

    def go():
        return mcmc.run(engine="auto")

    def sync(res):
        # jax.block_until_ready does NOT reliably synchronize fused-Pallas outputs
        # over the axon tunnel (measured: "ready" after 0.3 ms, actual completion
        # 15 s later on the subsequent fetch); a scalar host fetch is a true barrier.
        return float(jnp.max(res.store["tau"]))

    out = go()
    assert out.engine == "fused_smoother_spectral", out.engine
    sync(out)
    # steady-state throughput (bench_all.py methodology): median of 3 rounds of
    # REPS back-to-back runs ended by ONE true barrier, with the barrier's own
    # tunnel round-trip measured and subtracted -- per-dispatch tunnel jitter
    # (10-40 ms) otherwise swamps a ~40 ms device program
    REPS = 5
    walls = []
    walls_raw = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = go()
        sync(out)
        t1 = time.perf_counter()
        sync(out)
        barrier = time.perf_counter() - t1
        walls_raw.append((t1 - t0) / REPS)
        walls.append(max((t1 - t0 - barrier) / REPS, 1e-9))
    wall = sorted(walls)[1]
    wall_incl_barrier = sorted(walls_raw)[1]

    # aggregate multi-chain ESS of the smoothed field (mean over its 100 dims)
    b_draws = out.store["b"].reshape(N_CHAINS, N_ITER, N_TIME)
    ess_b = ess_per_param(b_draws, chunk_size=8)  # bounded-memory FFT batches
    ess_total = float(jnp.mean(ess_b))
    ess_per_sec = ess_total / wall

    # posterior sanity: tau should be near its true value 1.0
    tau_mean = float(jnp.mean(out.store["tau"]))

    with open("baseline_measured.json") as f:
        baseline = json.load(f)
    ref_ess_per_sec = baseline["ref_ess_per_sec_b_mean"]

    print(
        json.dumps(
            {
                "metric": "aggregate_ess_per_sec_gmrf_smoother_8k_chains",
                "value": round(ess_per_sec, 1),
                "unit": "ESS/s (mean over b dims, multi-chain)",
                "vs_baseline": round(ess_per_sec / ref_ess_per_sec, 1),
                "detail": {
                    "engine": out.engine,
                    "api": "MCMC.run(engine='auto')",
                    "wall_s": round(wall, 3),
                    "wall_incl_host_barrier_s": round(wall_incl_barrier, 3),
                    "n_chains": N_CHAINS,
                    "n_iter": N_ITER,
                    "n_burn": N_BURN,
                    "iters_per_sec": round((N_BURN + N_ITER) / wall, 1),
                    "tau_posterior_mean": round(tau_mean, 3),
                    "baseline_ess_per_sec": ref_ess_per_sec,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
