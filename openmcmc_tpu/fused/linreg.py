"""Fully-fused Bayesian linear-regression engine: the whole MCMC run in one Pallas launch.

The reference linear-regression workload (reference examples/3_linear_regression.ipynb,
driven by /root/reference/src/openmcmc/mcmc.py:87) is a three-sampler Gibbs sweep:

    beta | y, tau, lam ~ N(Q^{-1} b, Q^{-1}),
                         Q = lam*diag(Plam) + tau*G,  b = lam*Plam*mu + tau*c
    tau  | beta        ~ Gamma(a_tau + N/2, b_tau + (y - X beta)' P (y - X beta) / 2)
    lam  | beta        ~ Gamma(a_lam + p/2, b_lam + (beta - mu)' Plam (beta - mu) / 2)

The key structural fact: the data (X, y) only enters through the sufficient statistics

    G = X' P X   (p, p),    c = X' P y   (p,),    yPy = y' P y,

so after a one-time host-side reduction the per-iteration work is O(p^2) scalars per
chain -- no N-sized arrays in the hot loop at all. This engine fuses ALL burn+sample
iterations into a single kernel: unrolled p x p Cholesky + substitutions on
(1, BLOCK_B) rows (p static, <= 16), on-chip PRNG normals and fixed-round
Marsaglia-Tsang Gamma draws, the analytic log posterior, and double-buffered async DMA
of each stored iteration to HBM. Chains ride the lane axis.

Second instance of the one-launch pattern established by fused/gmrf_smoother.py;
parity-tested against the generic driver in tests/test_fused_linreg.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmcmc_tpu.fused.prng import (
    LOG_2PI,
    begin_iteration as _begin_iteration,
    gamma_mt,
    normal_icdf,
    seed_bits as _seed_bits,
)
from openmcmc_tpu.fused.layout import chain_slice, store_index as _store_index

BLOCK_B = 2048
MAX_P = 16


def _make_kernel(p, n_obs, n_burn, n_keep, a_lam, b_lam, a_tau, b_tau, lam0, tau0, out_rows, warm=False, n_thin=1):
    a_tau_star = a_tau + 0.5 * n_obs
    a_lam_star = a_lam + 0.5 * p
    from scipy.special import gammaln

    lgam_lam = float(a_lam * np.log(b_lam) - gammaln(a_lam))
    lgam_tau = float(a_tau * np.log(b_tau) - gammaln(a_tau))

    def kernel(seed_ref, scal_ref, *refs):
        if warm:
            init_ref, out_ref, stage_ref, sems = refs
        else:
            out_ref, stage_ref, sems = refs
        # scal_ref (SMEM): [G (p*p) | c (p) | plam (p) | mu (p) | yPy | logdet_plam | logdet_ptau]
        pid = pl.program_id(0)
        _seed_bits(seed_ref[0] + pid)

        def G(i, j):
            return scal_ref[i * p + j]

        def c(i):
            return scal_ref[p * p + i]

        def plam(i):
            return scal_ref[p * p + p + i]

        def mu(i):
            return scal_ref[p * p + 2 * p + i]

        yPy = scal_ref[p * p + 3 * p]
        logdet_plam = scal_ref[p * p + 3 * p + 1]
        logdet_ptau = scal_ref[p * p + 3 * p + 2]

        def iteration(it, carry):

            _begin_iteration(it)
            lam, tau = carry  # (1, BLOCK_B) rows

            # ---- NormalNormal: beta | y, tau, lam (unrolled p x p Cholesky) ----
            z = normal_icdf((p, BLOCK_B))
            L = [[None] * p for _ in range(p)]
            rhs = []
            for i in range(p):
                rhs.append(lam * (plam(i) * mu(i)) + tau * c(i))
            for j in range(p):
                s = lam * plam(j) + tau * G(j, j)
                for k in range(j):
                    s = s - L[j][k] * L[j][k]
                d = jnp.sqrt(s)
                L[j][j] = d
                for i in range(j + 1, p):
                    s = tau * G(i, j)
                    for k in range(j):
                        s = s - L[i][k] * L[j][k]
                    L[i][j] = s / d
            # w = L^{-1} rhs ; beta = L^{-T} (w + z)
            w = []
            for i in range(p):
                s = rhs[i]
                for k in range(i):
                    s = s - L[i][k] * w[k]
                w.append(s / L[i][i])
            beta = [None] * p
            for i in range(p - 1, -1, -1):
                s = w[i] + z[i : i + 1, :]
                for k in range(i + 1, p):
                    s = s - L[k][i] * beta[k]
                beta[i] = s / L[i][i]

            # ---- NormalGamma: tau | beta -----------------------------------
            quad_tau = yPy
            for i in range(p):
                quad_tau = quad_tau - 2.0 * c(i) * beta[i]
                for j in range(p):
                    quad_tau = quad_tau + G(i, j) * beta[i] * beta[j]
            tau_new = gamma_mt(a_tau_star, b_tau + 0.5 * quad_tau)

            # ---- NormalGamma: lam | beta -----------------------------------
            quad_lam = jnp.zeros_like(lam)
            for i in range(p):
                r = beta[i] - mu(i)
                quad_lam = quad_lam + plam(i) * r * r
            lam_new = gamma_mt(a_lam_star, b_lam + 0.5 * quad_lam)

            # ---- analytic log posterior (matches Model.log_p) ---------------
            log_like = 0.5 * (n_obs * jnp.log(tau_new) + logdet_ptau - n_obs * LOG_2PI - tau_new * quad_tau)
            log_beta = 0.5 * (p * jnp.log(lam_new) + logdet_plam - p * LOG_2PI - lam_new * quad_lam)
            log_lam = lgam_lam + (a_lam - 1.0) * jnp.log(lam_new) - b_lam * lam_new
            log_tau = lgam_tau + (a_tau - 1.0) * jnp.log(tau_new) - b_tau * tau_new
            log_post = log_like + log_beta + log_lam + log_tau

            # ---- store (double-buffered DMA to HBM) ------------------------
            idx = _store_index(it, n_burn, n_thin)

            @pl.when(idx >= 0)
            def _():
                slot = lax.rem(idx, 2)

                @pl.when(idx >= 2)
                def _():
                    pltpu.make_async_copy(
                        stage_ref.at[slot], out_ref.at[idx - 2, :, pl.ds(pid * BLOCK_B, BLOCK_B)], sems.at[slot]
                    ).wait()

                rows = beta + [lam_new, tau_new, log_post]
                rows += [jnp.zeros((1, BLOCK_B), jnp.float32)] * (out_rows - len(rows))
                stage_ref[pl.ds(slot, 1)] = jnp.concatenate(rows, axis=0)[None, :, :]
                pltpu.make_async_copy(
                    stage_ref.at[slot], out_ref.at[idx, :, pl.ds(pid * BLOCK_B, BLOCK_B)], sems.at[slot]
                ).start()

            return lam_new, tau_new

        if warm:
            # per-chain warm start (resume): rows [lam | tau] (index-mapped block)
            lam0_row = init_ref[0:1, :]
            tau0_row = init_ref[1:2, :]
        else:
            lam0_row = jnp.full((1, BLOCK_B), lam0, jnp.float32)
            tau0_row = jnp.full((1, BLOCK_B), tau0, jnp.float32)
        lax.fori_loop(0, n_burn + n_keep * n_thin, iteration, (lam0_row, tau0_row))

        for last in range(max(0, n_keep - 2), n_keep):
            slot = last % 2
            pltpu.make_async_copy(
                stage_ref.at[slot], out_ref.at[last, :, pl.ds(pid * BLOCK_B, BLOCK_B)], sems.at[slot]
            ).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_burn", "n_iter", "n_chains", "n_thin", "a_lam", "b_lam", "a_tau", "b_tau", "lam0", "tau0",
    ),
)
def run_fused_linreg(
    seed: int,
    X: jnp.ndarray,
    y: jnp.ndarray,
    n_burn: int,
    n_iter: int,
    n_chains: int,
    a_tau: float = 1e-3,
    b_tau: float = 1e-3,
    a_lam: float = 1e-3,
    b_lam: float = 1e-3,
    lam0: float = 0.01,
    tau0: float = 1.0,
    n_thin: int = 1,
    mu=None,
    plam_diag=None,
    ptau_diag=None,
    init=None,
):
    """Run the full Bayesian linear regression MCMC in one fused kernel.

    X: (N, p) design matrix (p <= 16), y: (N,) responses. Model: y ~ N(X beta,
    (tau diag(ptau))^{-1}), beta ~ N(mu, (lam diag(plam))^{-1}), Gamma priors on tau
    and lam. Returns dict with beta: (n_chains, n_iter, p), tau/lam/log_post:
    (n_chains, n_iter). Matches the generic-driver model of reference examples/3.
    """
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32).reshape(-1)
    n_obs, p = X.shape
    if p > MAX_P:
        raise ValueError(f"fused linreg supports p <= {MAX_P}, got {p}")
    mu = jnp.zeros((p,), jnp.float32) if mu is None else jnp.asarray(mu, jnp.float32).reshape(-1)
    plam = jnp.ones((p,), jnp.float32) if plam_diag is None else jnp.asarray(plam_diag, jnp.float32).reshape(-1)
    ptau = jnp.ones((n_obs,), jnp.float32) if ptau_diag is None else jnp.asarray(ptau_diag, jnp.float32).reshape(-1)

    # sufficient statistics: the only place the N-sized data is touched
    XtP = X.T * ptau[None, :]
    G = jnp.matmul(XtP, X, precision=lax.Precision.HIGHEST)
    c = jnp.matmul(XtP, y[:, None], precision=lax.Precision.HIGHEST).reshape(-1)
    yPy = jnp.sum(y * ptau * y).reshape(1)
    logdet_plam = jnp.sum(jnp.log(plam)).reshape(1)
    logdet_ptau = jnp.sum(jnp.log(ptau)).reshape(1)
    scal = jnp.concatenate([G.reshape(-1), c, plam, mu, yPy, logdet_plam, logdet_ptau]).astype(jnp.float32)

    out_rows = p + 3 + ((-(p + 3)) % 8)
    b_total = n_chains + ((-n_chains) % BLOCK_B)
    kernel = _make_kernel(
        p, float(n_obs), n_burn, n_iter, float(a_lam), float(b_lam), float(a_tau), float(b_tau),
        float(lam0), float(tau0), out_rows, warm=init is not None, n_thin=n_thin,
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
    args = [jnp.asarray([seed], jnp.int32), scal]
    if init is not None:
        rows_in = jnp.stack([
            jnp.asarray(init["lam"], jnp.float32).reshape(-1),
            jnp.asarray(init["tau"], jnp.float32).reshape(-1),
        ])
        rows_in = jnp.pad(rows_in, ((0, 0), (0, b_total - n_chains)))
        in_specs.append(pl.BlockSpec((2, BLOCK_B), lambda i: (0, i)))
        args.append(rows_in)
    (out,) = pl.pallas_call(
        kernel,
        grid=(b_total // BLOCK_B,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),),
        out_shape=(jax.ShapeDtypeStruct((n_iter, out_rows, b_total), jnp.float32),),
        scratch_shapes=[
            pltpu.VMEM((2, out_rows, BLOCK_B), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*args)

    draws = jnp.transpose(chain_slice(out, n_chains), (2, 0, 1))  # (chains, iters, rows)
    return {
        "beta": draws[:, :, :p],
        "lam": draws[:, :, p],
        "tau": draws[:, :, p + 1],
        "log_post": draws[:, :, p + 2],
    }
