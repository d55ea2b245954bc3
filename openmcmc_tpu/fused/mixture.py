"""Fully-fused Gaussian-mixture engine: the whole allocation Gibbs run in one launch.

Sixth fused family. Covers the reference's mixture machinery end-to-end
(reference sampler.py:291-355 MixtureAllocation + sampler.py:210-288 NormalGamma +
metropolis_hastings.py:272-289 RandomWalkLoop over the component means, driven by
mcmc.py:87):

    y_i ~ N(mu_{Z_i}, 1 / lam_{Z_i})      i = 1..n
    Z_i ~ Categorical(w_i.)               K components, constant (n, K) weights
    mu  ~ N(mu0, diag(p0)^-1)             joint truncated-RW MH update, or the
                                          conjugate NormalNormal draw
                                          (``conjugate_means=True``)
    lam_k ~ Gamma(a0_k, b0_k)             conjugate update

The key structural observation making one launch cheap: given the allocation
indicators, EVERYTHING downstream is a function of the per-component sufficient
statistics S0_k = #{Z_i = k}, S1_k = sum y_i, S2_k = sum y_i^2 (and
S3_k = sum log w_ik for the stored log-posterior). Each iteration therefore does
one O(n K) pass over the data block to redraw Z (Gumbel argmax, the same
categorical jax.random.categorical draws) and accumulate S, after which the
means MH step and both conjugate Gamma draws are O(K) row arithmetic. The
allocation Z itself never crosses an iteration: the sweep order
[allocation, means, precisions] redraws it from (mu, lam) before any use, so the
loop carry is just the 2K+1 parameter rows and Z is a transient register value.

Chains ride the lane axis; draws stream to HBM via double-buffered DMA; all
randomness from the on-chip PRNG (fused/prng.py). Parity with the generic driver
is tested in tests/test_fused_mixture.py.
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
    seed_bits as _seed_bits,
    gamma_mt_elem,
    normal_icdf,
    truncnorm_draw,
    truncnorm_logpdf,
    uniform,
)
from openmcmc_tpu.fused.layout import chain_slice

MAX_K = 8
MAX_N = 2048
PAD = 8


def _block_b(n_pad: int) -> int:
    # bound n_pad * BLOCK_B so the ~K+4 live (n_pad, B) f32 temporaries fit VMEM
    if n_pad <= 256:
        return 2048
    if n_pad <= 512:
        return 1024
    if n_pad <= 1024:
        return 512
    return 256


def _make_kernel(n_pad, k_comp, step, has_domain, n_burn, n_keep, out_rows, block_b, warm=False,
                 conjugate=False):
    def kernel(seed_ref, scal_ref, y_ref, lp_ref, mask_ref, *refs):
        if warm:
            init_ref, out_ref, stage_ref, sems = refs
        else:
            out_ref, stage_ref, sems = refs
        # scal_ref (SMEM): [mu0 K | p0 K | a0 K | b0 K | mu_init K | lam_init K |
        #                   lb K | ub K | lgam K]   (lgam = a0 log b0 - gammaln(a0))
        pid = pl.program_id(0)
        _seed_bits(seed_ref[0] + pid)

        def mu0(k):
            return scal_ref[k]

        def p0(k):
            return scal_ref[k_comp + k]

        def a0(k):
            return scal_ref[2 * k_comp + k]

        def b0(k):
            return scal_ref[3 * k_comp + k]

        def lb(k):
            return scal_ref[6 * k_comp + k]

        def ub(k):
            return scal_ref[7 * k_comp + k]

        def lgam(k):
            return scal_ref[8 * k_comp + k]

        y = y_ref[:, :]  # (n_pad, 1)
        mask = mask_ref[:, :]  # (n_pad, 1): 1 on real data rows

        def iteration(it, carry):

            _begin_iteration(it)
            mu = list(carry[:k_comp])  # K rows (1, B)
            lam = list(carry[k_comp : 2 * k_comp])
            acc = carry[2 * k_comp]

            # ---- MixtureAllocation: Z ~ Categorical(log w + loglike); Z is only
            # ever needed through the per-component sufficient statistics
            ll = [
                lp_ref[:, k : k + 1] + 0.5 * (
                    jnp.log(lam[k]) - LOG_2PI - lam[k] * (y - mu[k]) ** 2
                )  # (n_pad, B)
                for k in range(k_comp)
            ]
            if k_comp == 2:
                # exact 2-component form: the difference of two Gumbels is
                # logistic, so ONE uniform + logit replaces two Gumbel channels
                # (halves the allocation pass's bits and transcendentals)
                u = uniform((n_pad, block_b))
                zidx = (ll[1] - ll[0] > jnp.log(u) - jnp.log1p(-u)).astype(jnp.float32)
            else:
                # Gumbel argmax over components (== jax.random.categorical)
                g = [ll[k] - jnp.log(-jnp.log(uniform((n_pad, block_b)))) for k in range(k_comp)]
                best = g[0]
                zidx = jnp.zeros((n_pad, block_b), jnp.float32)
                for k in range(1, k_comp):
                    upd = g[k] > best
                    best = jnp.where(upd, g[k], best)
                    zidx = jnp.where(upd, float(k), zidx)

            s0, s1, s2, s3 = [], [], [], []
            for k in range(k_comp):
                ind = jnp.where(zidx == float(k), mask, 0.0)  # (n_pad, B)
                s0.append(jnp.sum(ind, axis=0, keepdims=True))
                s1.append(jnp.sum(ind * y, axis=0, keepdims=True))
                s2.append(jnp.sum(ind * (y * y), axis=0, keepdims=True))
                s3.append(jnp.sum(ind * lp_ref[:, k : k + 1], axis=0, keepdims=True))

            if conjugate:
                # ---- conjugate NormalNormal over the component means (the
                # generic driver's mixture-means path in samplers/conjugate.py):
                # q_k = p0_k + lam_k S0_k, mean_k = (p0_k mu0_k + lam_k S1_k)/q_k
                mu_new = []
                for k in range(k_comp):
                    q = p0(k) + lam[k] * s0[k]
                    post_mean = (p0(k) * mu0(k) + lam[k] * s1[k]) / q
                    mu_new.append(post_mean + normal_icdf((1, block_b)) * lax.rsqrt(q))
                acc_new = acc  # no MH step: accept counters stay zero
            else:
                # ---- RandomWalkLoop over the single replicate column of mu: one
                # joint (truncated) proposal, one accept decision; the conditional
                # model is exactly {likelihood, mu prior} and the likelihood enters
                # through the sufficient statistics
                delta = jnp.zeros((1, block_b), jnp.float32)
                prop = []
                for k in range(k_comp):
                    if has_domain:
                        z = truncnorm_draw(mu[k], step, lb(k), ub(k), (1, block_b))
                        delta = delta + truncnorm_logpdf(mu[k], z, step, lb(k), ub(k))
                        delta = delta - truncnorm_logpdf(z, mu[k], step, lb(k), ub(k))
                    else:
                        z = mu[k] + step * normal_icdf((1, block_b))
                    prop.append(z)
                    quad_cur = s2[k] - 2.0 * mu[k] * s1[k] + s0[k] * mu[k] * mu[k]
                    quad_prop = s2[k] - 2.0 * z * s1[k] + s0[k] * z * z
                    delta = delta + 0.5 * lam[k] * (quad_cur - quad_prop)
                    delta = delta + 0.5 * p0(k) * ((mu[k] - mu0(k)) ** 2 - (z - mu0(k)) ** 2)
                accept = jnp.log(uniform((1, block_b))) < delta
                mu_new = [jnp.where(accept, prop[k], mu[k]) for k in range(k_comp)]
                # accept counted over burn + sampling (the generic driver's window)
                acc_new = acc + accept.astype(jnp.float32)

            # ---- NormalGamma per component: a* = a0 + S0/2, b* = b0 + quad/2
            # (quad at the post-accept means; S stats are mean-independent).
            # All K draws STACKED into one (K, B) gamma call: K separate (1, B)
            # calls would each burn a full 8-sublane register tile per squeeze
            # round (see fused/prng.py gamma_mt2).
            quad_new = [
                s2[k] - 2.0 * mu_new[k] * s1[k] + s0[k] * mu_new[k] * mu_new[k]
                for k in range(k_comp)
            ]
            a_stack = jnp.concatenate(
                [a0(k) + 0.5 * s0[k] for k in range(k_comp)], axis=0
            )
            rate_stack = jnp.concatenate(
                [b0(k) + 0.5 * quad_new[k] for k in range(k_comp)], axis=0
            )
            lam_stack = gamma_mt_elem(a_stack, rate_stack)  # (K, B)
            lam_new = [lam_stack[k : k + 1, :] for k in range(k_comp)]

            # ---- full-model log posterior at the end-of-sweep state (the value
            # the generic driver stores, Model.log_p convention)
            lp_total = jnp.zeros((1, block_b), jnp.float32)
            for k in range(k_comp):
                log_lam = jnp.log(lam_new[k])
                lp_total = lp_total + 0.5 * s0[k] * (log_lam - LOG_2PI) - 0.5 * lam_new[k] * quad_new[k]
                lp_total = lp_total + s3[k]  # categorical: sum_i log w[i, Z_i]
                lp_total = lp_total + 0.5 * (jnp.log(p0(k)) - LOG_2PI) - 0.5 * p0(k) * (mu_new[k] - mu0(k)) ** 2
                lp_total = lp_total + lgam(k) + (a0(k) - 1.0) * log_lam - b0(k) * lam_new[k]

            @pl.when(it >= n_burn)
            def _():
                idx = it - n_burn
                slot = lax.rem(idx, 2)

                @pl.when(idx >= 2)
                def _():
                    pltpu.make_async_copy(
                        stage_ref.at[slot], out_ref.at[idx - 2, :, pl.ds(pid * block_b, block_b)], sems.at[slot]
                    ).wait()

                rows = mu_new + lam_new + [lp_total, acc_new]
                rows += [jnp.zeros((1, block_b), jnp.float32)] * (out_rows - len(rows))
                stage_ref[pl.ds(slot, 1)] = jnp.concatenate(rows, axis=0)[None, :, :]
                pltpu.make_async_copy(
                    stage_ref.at[slot], out_ref.at[idx, :, pl.ds(pid * block_b, block_b)], sems.at[slot]
                ).start()

            return tuple(mu_new) + tuple(lam_new) + (acc_new,)

        if warm:
            # per-chain warm start (resume): rows [mu (K) | lam (K) | acc]
            mu_init = tuple(init_ref[k : k + 1, :] for k in range(k_comp))
            lam_init = tuple(init_ref[k_comp + k : k_comp + k + 1, :] for k in range(k_comp))
            acc0 = init_ref[2 * k_comp : 2 * k_comp + 1, :]
        else:
            mu_init = tuple(jnp.full((1, block_b), 0.0, jnp.float32) + scal_ref[4 * k_comp + k] for k in range(k_comp))
            lam_init = tuple(jnp.full((1, block_b), 0.0, jnp.float32) + scal_ref[5 * k_comp + k] for k in range(k_comp))
            acc0 = jnp.zeros((1, block_b), jnp.float32)
        carry0 = mu_init + lam_init + (acc0,)
        lax.fori_loop(0, n_burn + n_keep, iteration, carry0)

        for last in range(max(0, n_keep - 2), n_keep):
            slot = last % 2
            pltpu.make_async_copy(
                stage_ref.at[slot], out_ref.at[last, :, pl.ds(pid * block_b, block_b)], sems.at[slot]
            ).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_burn", "n_iter", "n_chains", "step", "has_domain", "conjugate"),
)
def _run_fused_mixture_jit(seed, scal, y_col, lp, mask, n_burn, n_iter, n_chains, step, has_domain,
                           init=None, conjugate=False):
    n_pad, k_comp = lp.shape
    block_b = _block_b(n_pad)
    b_total = n_chains + ((-n_chains) % block_b)
    out_rows = 2 * k_comp + 2 + ((-(2 * k_comp + 2)) % PAD)
    kernel = _make_kernel(n_pad, k_comp, float(step), has_domain, n_burn, n_iter, out_rows, block_b,
                          warm=init is not None, conjugate=conjugate)
    shared = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + [shared] * 3
    args = [jnp.asarray([seed], jnp.int32), scal, y_col, lp, mask]
    if init is not None:
        rows_in = jnp.concatenate([
            jnp.asarray(init["mu"], jnp.float32).reshape(n_chains, k_comp).T,
            jnp.asarray(init["lam"], jnp.float32).reshape(n_chains, k_comp).T,
            jnp.asarray(init.get("acc", jnp.zeros(n_chains)), jnp.float32).reshape(1, n_chains),
        ], axis=0)
        rows_in = jnp.pad(rows_in, ((0, 0), (0, b_total - n_chains)))
        in_specs.append(pl.BlockSpec((2 * k_comp + 1, block_b), lambda i: (0, i)))
        args.append(rows_in)
    (out,) = pl.pallas_call(
        kernel,
        grid=(b_total // block_b,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),),
        out_shape=(jax.ShapeDtypeStruct((n_iter, out_rows, b_total), jnp.float32),),
        scratch_shapes=[
            pltpu.VMEM((2, out_rows, block_b), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*args)
    draws = jnp.transpose(chain_slice(out, n_chains), (2, 0, 1))
    return {
        "means": draws[:, :, :k_comp],
        "lams": draws[:, :, k_comp : 2 * k_comp],
        "log_post": draws[:, :, 2 * k_comp],
        "accept_total": draws[:, -1, 2 * k_comp + 1],
    }


def run_fused_mixture(
    seed,
    y,
    prior,
    n_burn,
    n_iter,
    n_chains,
    mu0,
    p0,
    a0,
    b0,
    mu_init,
    lam_init,
    step=0.2,
    domain=None,
    init=None,
    conjugate_means=False,
):
    """Run the full K-component Gaussian-mixture Gibbs chain in one fused kernel.

    y: (n,) observations; prior: (n, K) constant allocation weights (rows need not
    be normalized -- the categorical normalizes, and the stored log-posterior uses
    the raw log-weights exactly like Categorical.log_p). mu0/p0: the means' Normal
    prior (diagonal precision p0); a0/b0: per-component Gamma hyperparameters
    (every a0_k must be >= 1: the in-kernel elementwise Marsaglia-Tsang draw has
    no shape<1 boost); mu_init/lam_init: per-chain-identical initial values;
    domain: optional (lb, ub) arrays truncating the means' RW proposals.

    ``conjugate_means=True`` replaces the means' MH step with the closed-form
    conjugate NormalNormal draw (the generic driver's mixture-means path in
    samplers/conjugate.py); step/domain are then ignored and accept_total stays 0.

    Returns dict with means/lams: (n_chains, n_iter, K), log_post: (n_chains,
    n_iter), accept_total: (n_chains,) means-update accept counts over burn +
    sampling."""
    y = np.asarray(y, np.float64).reshape(-1)
    prior = np.asarray(prior, np.float64)
    n, k_comp = prior.shape
    if y.shape[0] != n:
        raise ValueError(f"y has {y.shape[0]} rows but prior has {n}")
    if k_comp > MAX_K:
        raise ValueError(f"fused mixture supports K <= {MAX_K}, got {k_comp}")
    if n > MAX_N:
        raise ValueError(f"fused mixture supports n <= {MAX_N}, got {n}")
    if np.min(np.asarray(a0)) < 1.0:
        raise ValueError("fused mixture requires every a0 >= 1 (elementwise gamma draw)")

    n_pad = n + ((-n) % PAD)
    pad = n_pad - n
    y_col = jnp.asarray(np.concatenate([y, np.zeros(pad)]), jnp.float32).reshape(n_pad, 1)
    lp = jnp.asarray(
        np.concatenate([np.log(prior), np.zeros((pad, k_comp))], axis=0), jnp.float32
    )
    mask = jnp.asarray(np.concatenate([np.ones(n), np.zeros(pad)]), jnp.float32).reshape(n_pad, 1)

    def vec(v):
        return np.broadcast_to(np.asarray(v, np.float64).reshape(-1), (k_comp,))

    from scipy.special import gammaln

    a0v, b0v = vec(a0), vec(b0)
    lgam = a0v * np.log(b0v) - gammaln(a0v)
    if domain is None:
        lbv, ubv = np.zeros(k_comp), np.zeros(k_comp)
    else:
        lbv, ubv = vec(domain[0]), vec(domain[1])
    scal = jnp.asarray(
        np.concatenate([vec(mu0), vec(p0), a0v, b0v, vec(mu_init), vec(lam_init), lbv, ubv, lgam]),
        jnp.float32,
    )
    return _run_fused_mixture_jit(
        seed, scal, y_col, lp, mask,
        n_burn=n_burn, n_iter=n_iter, n_chains=n_chains,
        step=float(step), has_domain=domain is not None and not conjugate_means,
        init=init, conjugate=bool(conjugate_means),
    )
