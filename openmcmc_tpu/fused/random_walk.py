"""Fully-fused random-walk Metropolis engine: the whole MH run in one Pallas launch.

Third fused family (after the conjugate smoother and linreg engines): a METROPOLIS
sampler, showing the one-launch pattern is not specific to conjugate Gibbs. Covers the
reference examples/2_samplers.ipynb workload (reference metropolis_hastings.py:176-269
driving mcmc.py:87) in its general VECTOR form: a p-dimensional location h with

    y_ij ~ N(h_i, 1/tau_i)  (j = 1..n),    h_i ~ N(mu_i, 1/lam_i),

random-walk proposals h' = h + step * z with a joint accept. The data enters only
through the per-dimension sufficient statistics N, S1_i = sum_j y_ij,
S2_i = sum_j y_ij^2, so each iteration is ~15 p-row ops per chain: propose, one
carried log-density update (the current value rides the loop carry -- nothing is
recomputed), branchless accept. Log-posterior includes the full normalizing
constants, matching Model.log_p exactly. Chains ride the lane axis; draws stream to
HBM via double-buffered DMA.

Parity-tested against the generic driver in tests/test_fused_rw.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmcmc_tpu.fused.prng import (
    LOG_2PI,
    begin_iteration as _begin_iteration,
    normal_icdf,
    seed_bits as _seed_bits,
    truncnorm_draw,
    truncnorm_logpdf,
    uniform,
)
from openmcmc_tpu.fused.layout import chain_slice, store_index as _store_index

BLOCK_B = 2048
MAX_P = 32


def _make_kernel(p, n_obs, n_burn, n_keep, out_rows, adapt, target, rate, trunc, warm, n_thin=1):
    def kernel(seed_ref, scal_ref, *refs):
        if warm:
            init_ref, out_ref, stage_ref, sems = refs
        else:
            out_ref, stage_ref, sems = refs
        # scal_ref (SMEM): [S1 (p) | S2 (p) | mu (p) | tau (p) | lam (p) | h0 (p)
        #                   | step (p) | lo (p) | hi (p)  (lo/hi: truncated only)]
        pid = pl.program_id(0)
        _seed_bits(seed_ref[0] + pid)

        def s1(i):
            return scal_ref[i]

        def s2(i):
            return scal_ref[p + i]

        def mu(i):
            return scal_ref[2 * p + i]

        def tau(i):
            return scal_ref[3 * p + i]

        def lam(i):
            return scal_ref[4 * p + i]

        def h0(i):
            return scal_ref[5 * p + i]

        def stp(i):
            return scal_ref[6 * p + i]

        def lo(i):
            return scal_ref[7 * p + i]

        def hi(i):
            return scal_ref[8 * p + i]

        # joint log-density constants (match Model.log_p)
        const = 0.0
        for i in range(p):
            const = const + 0.5 * (n_obs * jnp.log(tau(i)) - n_obs * LOG_2PI)
            const = const + 0.5 * (jnp.log(lam(i)) - LOG_2PI)

        def log_post(h):
            total = const
            for i in range(p):
                quad_lik = s2(i) - 2.0 * h[i] * s1(i) + n_obs * h[i] * h[i]
                total = total - 0.5 * tau(i) * quad_lik - 0.5 * lam(i) * (h[i] - mu(i)) ** 2
            return total

        def iteration(it, carry):

            _begin_iteration(it)
            h = carry[:p]
            lp = carry[p]
            acc = carry[p + 1]
            # per-chain log step-SCALE: the adapted multiplier on the (p,) base
            # steps; ratios between dimensions stay fixed, like the generic
            # driver's vector log_step nudged by one scalar alpha term
            log_scale = carry[p + 2]
            scale = jnp.exp(log_scale) if adapt else 1.0

            def step_i(i):
                return stp(i) * scale

            if trunc:
                # truncated proposals need the asymmetric density correction
                # (reference metropolis_hastings.py:249-257)
                h_prop = [truncnorm_draw(h[i], step_i(i), lo(i), hi(i), (1, BLOCK_B)) for i in range(p)]
                corr = 0.0
                for i in range(p):
                    corr = corr + truncnorm_logpdf(h[i], h_prop[i], step_i(i), lo(i), hi(i))
                    corr = corr - truncnorm_logpdf(h_prop[i], h[i], step_i(i), lo(i), hi(i))
            else:
                z = normal_icdf((p, BLOCK_B))
                h_prop = [h[i] + step_i(i) * z[i : i + 1, :] for i in range(p)]
                corr = 0.0
            lp_prop = log_post(h_prop)
            log_accept = lp_prop - lp + corr
            accept = jnp.log(uniform((1, BLOCK_B))) < log_accept
            h_new = [jnp.where(accept, h_prop[i], h[i]) for i in range(p)]
            lp_new = jnp.where(accept, lp_prop, lp)
            # running accept count over burn + sampling, so the reported acceptance
            # rate uses the generic driver's counting window (accumulated from -n_burn)
            acc_new = acc + accept.astype(jnp.float32)
            if adapt:
                # Robbins-Monro toward the target acceptance, burn-in only (the
                # generic driver's adapt=True window); frozen once sampling starts
                alpha = jnp.exp(jnp.minimum(log_accept, 0.0))
                nudged = log_scale + rate * (alpha - target)
                log_scale = jnp.where(it < n_burn, nudged, log_scale)

            idx = _store_index(it, n_burn, n_thin)

            @pl.when(idx >= 0)
            def _():
                slot = lax.rem(idx, 2)

                @pl.when(idx >= 2)
                def _():
                    pltpu.make_async_copy(
                        stage_ref.at[slot], out_ref.at[idx - 2, :, pl.ds(pid * BLOCK_B, BLOCK_B)], sems.at[slot]
                    ).wait()

                # stored log_step = adapted scale applied to the FIRST base step;
                # with a vector step the scale is shared by all components, so
                # the dispatcher reconstructs the full vector as
                # log(step_vec) + (log_step - log(step_vec[0]))
                rows = h_new + [lp_new, accept.astype(jnp.float32), acc_new, log_scale + jnp.log(stp(0))]
                rows += [jnp.zeros((1, BLOCK_B), jnp.float32)] * (out_rows - len(rows))
                stage_ref[pl.ds(slot, 1)] = jnp.concatenate(rows, axis=0)[None, :, :]
                pltpu.make_async_copy(
                    stage_ref.at[slot], out_ref.at[idx, :, pl.ds(pid * BLOCK_B, BLOCK_B)], sems.at[slot]
                ).start()

            return tuple(h_new) + (lp_new, acc_new, log_scale)

        if warm:
            # per-chain warm start (resume): rows [h (p) | log_scale | acc];
            # init_ref is this program's (p + 2, BLOCK_B) block (index-mapped)
            h_init = tuple(init_ref[i : i + 1, :] for i in range(p))
            scale0 = init_ref[p : p + 1, :]
            acc0 = init_ref[p + 1 : p + 2, :]
        else:
            h_init = tuple(jnp.full((1, BLOCK_B), 0.0, jnp.float32) + h0(i) for i in range(p))
            scale0 = jnp.zeros((1, BLOCK_B), jnp.float32)
            acc0 = jnp.zeros((1, BLOCK_B), jnp.float32)
        carry0 = h_init + (log_post(list(h_init)), acc0, scale0)
        lax.fori_loop(0, n_burn + n_keep * n_thin, iteration, carry0)

        for last in range(max(0, n_keep - 2), n_keep):
            slot = last % 2
            pltpu.make_async_copy(
                stage_ref.at[slot], out_ref.at[last, :, pl.ds(pid * BLOCK_B, BLOCK_B)], sems.at[slot]
            ).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_burn", "n_iter", "n_chains", "n_thin", "adapt_step", "target_accept", "adapt_rate"),
)
def run_fused_rw(
    seed: int,
    y: jnp.ndarray,
    n_burn: int,
    n_iter: int,
    n_chains: int,
    mu=0.0,
    tau=1.0,
    lam=1.0,
    step: float = 0.2,
    h0=0.0,
    adapt_step: bool = False,
    target_accept: float = 0.234,
    adapt_rate: float = 0.05,
    domain=None,
    n_thin: int = 1,
    init=None,
):
    """Run the full random-walk MH chain for h | y in one fused kernel.

    y: (N,) observations for a scalar h, or (p, N) for a p-dimensional h (p <= 32,
    independent dimensions, joint accept). mu/tau/lam/h0/step broadcast to (p,)
    (per-dimension proposal scales, the generic driver's (p, 1) step broadcast).
    ``adapt_step``: Robbins-Monro adaptation of log(step) toward ``target_accept``
    during burn-in, per chain, frozen once sampling starts (the generic driver's
    semantics); the final per-chain log-step is returned as ``log_step``.
    ``domain``: optional (lower, upper) proposal truncation bounds (each broadcast
    to (p,)); proposals are inverse-CDF truncated normals with the asymmetric
    density correction (reference metropolis_hastings.py:249-257).
    ``init``: optional warm start (resume) -- a dict with per-chain arrays
    "h" (n_chains, p), and optionally "log_step" (n_chains,) and "acc"
    (n_chains,) to continue the adapted scale and the running accept count;
    pass n_burn=0 to continue without re-burning (the generic resume contract).
    The PRNG stream is freshly seeded (a valid Markov continuation, not a
    bit-identical extension of a longer run).
    Returns dict with h: (n_chains, n_iter) [scalar] or (n_chains, n_iter, p),
    log_post/accept: (n_chains, n_iter), and accept_total: (n_chains,) accept
    counts accumulated over burn-in AND sampling (the generic driver's counting
    window; divide by n_burn + n_iter for the acceptance rate)."""
    y = jnp.asarray(y, jnp.float32)
    scalar_out = y.ndim == 1
    if scalar_out:
        y = y[None, :]
    p, n_obs = y.shape
    if p > MAX_P:
        raise ValueError(f"fused random walk supports p <= {MAX_P}, got {p}")

    def vec(v):
        return jnp.broadcast_to(jnp.asarray(v, jnp.float32).reshape(-1), (p,))

    s1 = jnp.sum(y, axis=1)
    s2 = jnp.sum(y * y, axis=1)
    pieces = [s1, s2, vec(mu), vec(tau), vec(lam), vec(h0), vec(step)]
    if domain is not None:
        pieces += [vec(domain[0]), vec(domain[1])]
    scal = jnp.concatenate(pieces).astype(jnp.float32)

    out_rows = p + 4 + ((-(p + 4)) % 8)
    b_total = n_chains + ((-n_chains) % BLOCK_B)
    kernel = _make_kernel(
        p, float(n_obs), n_burn, n_iter, out_rows,
        bool(adapt_step), float(target_accept), float(adapt_rate), domain is not None,
        init is not None, n_thin=n_thin,
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
    args = [jnp.asarray([seed], jnp.int32), scal]
    if init is not None:
        h_in = jnp.asarray(init["h"], jnp.float32).reshape(n_chains, p)
        ls_in = jnp.asarray(init.get("log_step", jnp.log(vec(step)[0])), jnp.float32).reshape(-1)
        ls_in = jnp.broadcast_to(ls_in, (n_chains,))
        # kernel carry holds the log step-SCALE (multiplier on the base step)
        scale_in = ls_in - jnp.log(vec(step)[0])
        acc_in = jnp.broadcast_to(
            jnp.asarray(init.get("acc", 0.0), jnp.float32).reshape(-1), (n_chains,)
        )
        rows_in = jnp.concatenate([h_in.T, scale_in[None, :], acc_in[None, :]], axis=0)
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
    h = draws[:, :, 0] if scalar_out else draws[:, :, :p]
    return {
        "h": h,
        "log_post": draws[:, :, p],
        "accept": draws[:, :, p + 1],
        "accept_total": draws[:, -1, p + 2],
        "log_step": draws[:, -1, p + 3],
    }
