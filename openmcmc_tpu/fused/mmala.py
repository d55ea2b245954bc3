"""Fully-fused manifold-MALA engine: the whole gradient-based MH run in one launch.

Fourth fused family: a GRADIENT-based Metropolis sampler (simplified manifold MALA,
Girolami & Calderhead 2011; reference metropolis_hastings.py:292-373). Covers the
linear-Gaussian target with fixed precisions:

    y ~ N(X beta, (tau P)^{-1}),   beta ~ N(mu0, (lam Plam)^{-1}),   tau, lam fixed,

whose negative Hessian A = tau X'PX + lam diag(Plam) is CONSTANT. Everything the
per-step mMALA math needs is therefore a one-time host-side computation:

    grad log pi(b) = v - A b          with v = tau X'Py + lam Plam mu0
    proposal mean  mu(b) = b + (s^2/2) A^{-1} (v - A b) = (1 - s^2/2) b + (s^2/2) c
    proposal       N(mu(b), s^2 A^{-1}),  L = chol(A) precomputed

where c = A^{-1} v is the posterior mean. Per chain-iteration: one (p, lane) matvec
against the SMEM-resident L rows for the draw, two quadratic forms for the forward/
reverse proposal densities, the carried target log-density, branchless accept --
~O(p^2) scalar ops, p <= 16. The reference evaluates 2 gradients + 2 Hessians + 2
Cholesky factorizations + 2 model log-densities per step for the same kernel.

Parity-tested against the generic ManifoldMALA driver in tests/test_fused_mmala.py.
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
    normal_icdf,
    seed_bits as _seed_bits,
    uniform,
)
from openmcmc_tpu.fused.layout import chain_slice, store_index as _store_index

BLOCK_B = 2048
MAX_P = 16


def _make_kernel(p, n_obs, tau, lam, step, n_burn, n_keep, out_rows, adapt, target, rate, warm, n_thin=1):
    s2 = step * step

    def kernel(seed_ref, scal_ref, *refs):
        if warm:
            init_ref, out_ref, stage_ref, sems = refs
        else:
            out_ref, stage_ref, sems = refs
        # scal_ref (SMEM): [A (p*p) | L (p*p) | v (p) | c (p) | beta0 (p) |
        #                   yPy | logdet_tauP | logdet_lamPlam | logdetL]
        pid = pl.program_id(0)
        _seed_bits(seed_ref[0] + pid)

        def A(i, j):
            return scal_ref[i * p + j]

        def L(i, j):
            return scal_ref[p * p + i * p + j]

        def v(i):
            return scal_ref[2 * p * p + i]

        def c(i):
            return scal_ref[2 * p * p + p + i]

        def b0(i):
            return scal_ref[2 * p * p + 2 * p + i]

        yPy = scal_ref[2 * p * p + 3 * p]
        logdet_tauP = scal_ref[2 * p * p + 3 * p + 1]
        logdet_lamPlam = scal_ref[2 * p * p + 3 * p + 2]
        logdetL = scal_ref[2 * p * p + 3 * p + 3]

        lik_const = 0.5 * (logdet_tauP - n_obs * LOG_2PI)
        pri_const = 0.5 * (logdet_lamPlam - p * LOG_2PI)

        def log_target(b):
            # log pi(b) = const - 1/2 b'Ab + b'v - 1/2 (tau y'Py + lam mu0'Plam mu0)
            # the b-independent quadratic of the data/prior means is folded into yPy
            quad = jnp.zeros_like(b[0])
            lin = jnp.zeros_like(b[0])
            for i in range(p):
                lin = lin + v(i) * b[i]
                for j in range(p):
                    quad = quad + A(i, j) * b[i] * b[j]
            return lik_const + pri_const - 0.5 * (quad + yPy) + lin

        def prop_logq(b_to, mu_rows, s2v):
            # log N(b_to; mu, s^2 A^{-1}) = logdetL - p/2 log(2 pi s^2) - ||L'(b-mu)||^2/(2 s^2)
            ssq = jnp.zeros_like(b_to[0])
            for j in range(p):
                w = jnp.zeros_like(b_to[0])
                for i in range(j, p):  # (L^T r)_j = sum_i L[i, j] r_i
                    w = w + L(i, j) * (b_to[i] - mu_rows[i])
                ssq = ssq + w * w
            log_s2 = jnp.log(s2v) if adapt else np.log(s2)
            return logdetL - 0.5 * p * (LOG_2PI + log_s2) - 0.5 * ssq / s2v

        def iteration(it, carry):

            _begin_iteration(it)
            b = carry[:p]
            lp = carry[p]
            acc = carry[p + 1]
            log_step = carry[p + 2]
            step_v = jnp.exp(log_step) if adapt else step
            s2v = step_v * step_v
            z = normal_icdf((p, BLOCK_B))
            mu_cur = [(1.0 - 0.5 * s2v) * b[i] + 0.5 * s2v * c(i) for i in range(p)]
            # draw: b' = mu + step * L^{-T} z (backward substitution, unrolled)
            eps = [None] * p
            for i in range(p - 1, -1, -1):
                w = z[i : i + 1, :]
                for k in range(i + 1, p):
                    w = w - L(k, i) * eps[k]
                eps[i] = w / L(i, i)
            b_prop = [mu_cur[i] + step_v * eps[i] for i in range(p)]
            lp_prop = log_target(b_prop)
            mu_prop = [(1.0 - 0.5 * s2v) * b_prop[i] + 0.5 * s2v * c(i) for i in range(p)]
            log_accept = lp_prop - lp + prop_logq(b, mu_prop, s2v) - prop_logq(b_prop, mu_cur, s2v)
            accept = jnp.log(uniform((1, BLOCK_B))) < log_accept
            b_new = [jnp.where(accept, b_prop[i], b[i]) for i in range(p)]
            lp_new = jnp.where(accept, lp_prop, lp)
            # running accept count over burn + sampling (generic counting window)
            acc_new = acc + accept.astype(jnp.float32)
            if adapt:
                # Robbins-Monro toward the target acceptance, burn-in only
                alpha = jnp.exp(jnp.minimum(log_accept, 0.0))
                nudged = log_step + rate * (alpha - target)
                log_step = jnp.where(it < n_burn, nudged, log_step)

            idx = _store_index(it, n_burn, n_thin)

            @pl.when(idx >= 0)
            def _():
                slot = lax.rem(idx, 2)

                @pl.when(idx >= 2)
                def _():
                    pltpu.make_async_copy(
                        stage_ref.at[slot], out_ref.at[idx - 2, :, pl.ds(pid * BLOCK_B, BLOCK_B)], sems.at[slot]
                    ).wait()

                rows = b_new + [lp_new, accept.astype(jnp.float32), acc_new, log_step]
                rows += [jnp.zeros((1, BLOCK_B), jnp.float32)] * (out_rows - len(rows))
                stage_ref[pl.ds(slot, 1)] = jnp.concatenate(rows, axis=0)[None, :, :]
                pltpu.make_async_copy(
                    stage_ref.at[slot], out_ref.at[idx, :, pl.ds(pid * BLOCK_B, BLOCK_B)], sems.at[slot]
                ).start()

            return tuple(b_new) + (lp_new, acc_new, log_step)

        if warm:
            # per-chain warm start (resume): rows [b (p) | log_step | acc]
            b_init = tuple(init_ref[i : i + 1, :] for i in range(p))
            ls0 = init_ref[p : p + 1, :]
            acc0 = init_ref[p + 1 : p + 2, :]
        else:
            b_init = tuple(jnp.full((1, BLOCK_B), 0.0, jnp.float32) + b0(i) for i in range(p))
            ls0 = jnp.full((1, BLOCK_B), float(np.log(step)), jnp.float32)
            acc0 = jnp.zeros((1, BLOCK_B), jnp.float32)
        carry0 = b_init + (log_target(list(b_init)), acc0, ls0)
        lax.fori_loop(0, n_burn + n_keep * n_thin, iteration, carry0)

        for last in range(max(0, n_keep - 2), n_keep):
            slot = last % 2
            pltpu.make_async_copy(
                stage_ref.at[slot], out_ref.at[last, :, pl.ds(pid * BLOCK_B, BLOCK_B)], sems.at[slot]
            ).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_burn", "n_iter", "n_chains", "n_thin", "tau", "lam", "step", "adapt_step", "target_accept", "adapt_rate"),
)
def run_fused_mmala(
    seed: int,
    X: jnp.ndarray,
    y: jnp.ndarray,
    n_burn: int,
    n_iter: int,
    n_chains: int,
    tau: float = 1.0,
    lam: float = 1.0,
    step: float = 1.0,
    ptau_diag=None,
    plam_diag=None,
    mu0=None,
    beta0=None,
    adapt_step: bool = False,
    target_accept: float = 0.574,
    adapt_rate: float = 0.05,
    n_thin: int = 1,
    init=None,
):
    """Run the full manifold-MALA chain for beta | y in one fused kernel.

    X: (N, p) design (p <= 16), y: (N,). Model: y ~ N(X beta, (tau diag(ptau))^{-1}),
    beta ~ N(mu0, (lam diag(plam))^{-1}). Returns dict with beta: (chains, iters, p),
    log_post/accept: (chains, iters), accept_total: (chains,) counted over burn +
    sampling (generic-driver counting window). ``adapt_step``: per-chain burn-in
    Robbins-Monro adaptation of log(step) toward ``target_accept`` (MALA-optimal
    0.574 default), frozen at sampling; final log_step returned."""
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32).reshape(-1)
    n_obs, p = X.shape
    if p > MAX_P:
        raise ValueError(f"fused mMALA supports p <= {MAX_P}, got {p}")
    ptau = jnp.ones((n_obs,), jnp.float32) if ptau_diag is None else jnp.asarray(ptau_diag, jnp.float32).reshape(-1)
    plam = jnp.ones((p,), jnp.float32) if plam_diag is None else jnp.asarray(plam_diag, jnp.float32).reshape(-1)
    mu0 = jnp.zeros((p,), jnp.float32) if mu0 is None else jnp.asarray(mu0, jnp.float32).reshape(-1)
    beta0 = jnp.zeros((p,), jnp.float32) if beta0 is None else jnp.asarray(beta0, jnp.float32).reshape(-1)

    XtP = X.T * ptau[None, :]
    A = tau * jnp.matmul(XtP, X, precision=lax.Precision.HIGHEST) + lam * jnp.diag(plam)
    v = tau * jnp.matmul(XtP, y[:, None], precision=lax.Precision.HIGHEST).reshape(-1) + lam * plam * mu0
    from openmcmc_tpu.linalg import smallmat as sm

    L = sm.cholesky_small(A)
    c = sm.cho_solve_small(L, v[:, None]).reshape(-1)
    # b-independent quadratic: tau y'Py + lam mu0'Plam mu0 (so log pi matches Model.log_p)
    yPy = (tau * jnp.sum(y * ptau * y) + lam * jnp.sum(mu0 * plam * mu0)).reshape(1)
    logdet_tauP = (n_obs * jnp.log(jnp.asarray(tau)) + jnp.sum(jnp.log(ptau))).reshape(1)
    logdet_lamPlam = (p * jnp.log(jnp.asarray(lam)) + jnp.sum(jnp.log(plam))).reshape(1)
    logdetL = jnp.sum(jnp.log(jnp.diagonal(L))).reshape(1)
    scal = jnp.concatenate(
        [A.reshape(-1), L.reshape(-1), v, c, beta0, yPy, logdet_tauP, logdet_lamPlam, logdetL]
    ).astype(jnp.float32)

    out_rows = p + 4 + ((-(p + 4)) % 8)
    b_total = n_chains + ((-n_chains) % BLOCK_B)
    kernel = _make_kernel(
        p, float(n_obs), float(tau), float(lam), float(step), n_burn, n_iter, out_rows,
        bool(adapt_step), float(target_accept), float(adapt_rate), init is not None,
        n_thin=n_thin,
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
    args = [jnp.asarray([seed], jnp.int32), scal]
    if init is not None:
        b_in = jnp.asarray(init["beta"], jnp.float32).reshape(n_chains, p)
        ls_in = jnp.broadcast_to(
            jnp.asarray(init.get("log_step", np.log(step)), jnp.float32).reshape(-1), (n_chains,)
        )
        acc_in = jnp.broadcast_to(
            jnp.asarray(init.get("acc", 0.0), jnp.float32).reshape(-1), (n_chains,)
        )
        rows_in = jnp.concatenate([b_in.T, ls_in[None, :], acc_in[None, :]], axis=0)
        rows_in = jnp.pad(rows_in, ((0, 0), (0, b_total - n_chains)))
        in_specs.append(pl.BlockSpec((p + 2, BLOCK_B), lambda i: (0, i)))
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

    draws = jnp.transpose(chain_slice(out, n_chains), (2, 0, 1))
    return {
        "beta": draws[:, :, :p],
        "log_post": draws[:, :, p],
        "accept": draws[:, :, p + 1],
        "accept_total": draws[:, -1, p + 2],
        "log_step": draws[:, -1, p + 3],
    }
