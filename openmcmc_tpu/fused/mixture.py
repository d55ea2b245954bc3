"""Fully-fused Gaussian-mixture engine: the whole allocation Gibbs run in one launch.

Sixth fused family. Covers the reference's mixture machinery end-to-end
(reference sampler.py:291-355 MixtureAllocation + sampler.py:210-288 NormalGamma +
metropolis_hastings.py:272-289 RandomWalkLoop over the component means, driven by
mcmc.py:87):

    y_ij ~ N(mu_{Z_i}, 1 / lam_{Z_i})     i = 1..n, j = 1..r (replicates share Z_i)
    Z_i ~ Categorical(w_i.)               K components, constant (n, K) weights
    mu  ~ N(mu0, diag(p0)^-1)             joint truncated-RW MH update, or the
                                          conjugate NormalNormal draw
                                          (``conjugate_means=True``)
    lam_k ~ Gamma(a0_k, b0_k)             conjugate update

Two structural observations make one launch cheap at any scale:

1. Given the allocations, EVERYTHING downstream is a function of the
   per-component sufficient statistics S0_k = #obs, S1_k = sum y, S2_k = sum y^2
   (and S3_k = sum log w for the stored log-posterior) -- and those only need the
   PER-POINT replicate summaries (count, sum, sum of squares), which collapse on
   the host at pack time. The kernel therefore never sees individual replicates:
   its data block is (n, 3 + K) columns [cnt | sum | sumsq | log w_1..K], and the
   per-point allocation log-likelihood is
   lp_k + cnt/2 (log lam_k - log 2pi) - lam_k/2 (sumsq - 2 mu_k sum + cnt mu_k^2).

2. The allocation draw is an INVERSE-CDF categorical: ONE uniform per point
   (softmax cumulative over components), versus K Gumbel channels. The PRNG is
   ~95% of fused-kernel cost (CLAUDE.md round-3 measurements), so this is ~K x
   cheaper on the dominant O(n K) pass than Gumbel argmax.

n <= 2048 points keep the data block resident in VMEM; beyond that it streams
from HBM in TILE_N-row blocks (double-buffered DMA overlapping the allocation
pass), scaling n to ~10^6. The allocation Z itself never crosses an iteration:
the sweep order [allocation, means, precisions] redraws it from (mu, lam) before
any use, so the loop carry is just the 2K+1 parameter rows and Z stays a
transient register value. Users who STORE Z (the driver's default store set
includes every sampled parameter) get it streamed out per stored iteration
(``store_z=True``): the same tile pass that folds zidx into the sufficient
statistics also DMAs it to an (iter, point, chain) HBM buffer, double-buffered
like the parameter draws; the dispatcher caps that buffer's size and falls back
to the generic driver past it.

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
    begin_inner as _begin_inner,
    end_inner as _end_inner,
    seed_bits as _seed_bits,
    gamma_mt_elem,
    normal_icdf,
    truncnorm_draw,
    truncnorm_logpdf,
    uniform,
)
from openmcmc_tpu.fused.layout import chain_slice, store_index as _store_index

MAX_K = 32
MAX_N = 1 << 20  # streamed data blocks: the cap is HBM for the (n, 128) pack
RESIDENT_N = 2048  # data block stays VMEM-resident up to here
TILE_N = 1024  # streamed tile rows (multiple of 8; one DMA per tile per iteration)
DATA_LANES = 128  # data block lane width: one full lane tile, so every DMA slice
#                   is tile-aligned on both axes (cols beyond 3 + K are zero)
PAD = 8


# Streamed tiles statically unrolled per fori_loop step. Measured at
# n = 10^5, K = 16 (conjugate engine): full unroll ~17 min compile / 0.48 s
# wall; UNROLL=8 308 s / 1.52 s; UNROLL=2 34 s / 1.58 s; a 1-tile fori body
# with a traced-slot buffer read 18 s / 1.70 s. The runtime is tile-math bound
# (not unroll-bound), so the small static-slot body wins the trade.
UNROLL = 2


def pad_unit(n: int) -> int:
    """Row-padding unit for the packed data block: streamed data pads to a
    multiple of UNROLL tiles (the stream loop is a fori over UNROLL-tile groups
    with static DMA slots); resident data pads to the sublane tile."""
    return UNROLL * TILE_N if n > RESIDENT_N else PAD


def _block_b(tile_n: int, k_comp: int, store_z: bool = False) -> int:
    # bound the ~(K+5) live (tile_n, B) f32 allocation-pass temporaries to ~24 MB
    # (+2 tiles for the double-buffered Z-draw stage when allocations stream out)
    live = (k_comp + 5 + (2 if store_z else 0)) * tile_n * 4
    for b in (2048, 1024, 512, 256):
        if live * b <= (24 << 20):
            return b
    return 128


def _make_kernel(n_pad, k_comp, step, has_domain, n_burn, n_keep, out_rows, block_b,
                 warm=False, conjugate=False, stream=False, store_z=False, n_thin=1):
    n_tiles = n_pad // (TILE_N if stream else n_pad)
    tile_n = TILE_N if stream else n_pad

    def kernel(seed_ref, scal_ref, data_ref, *refs):
        refs = list(refs)
        init_ref = refs.pop(0) if warm else None
        out_ref = refs.pop(0)
        out_z_ref = refs.pop(0) if store_z else None
        stage_ref, sems = refs.pop(0), refs.pop(0)
        if stream:
            dbuf_ref, dsem = refs.pop(0), refs.pop(0)
        if store_z:
            z_stage, z_sems = refs.pop(0), refs.pop(0)
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

        def d_dma(dslot, t):
            return pltpu.make_async_copy(
                data_ref.at[pl.ds(t * tile_n, tile_n), :], dbuf_ref.at[dslot], dsem.at[dslot]
            )

        def iteration(it, carry):

            _begin_iteration(it)
            mu = list(carry[:k_comp])  # K rows (1, B)
            lam = list(carry[k_comp : 2 * k_comp])
            acc = carry[2 * k_comp]
            log_lam_cur = [jnp.log(lam[k]) for k in range(k_comp)]

            # ---- MixtureAllocation: Z ~ Categorical(log w + loglike), drawn by
            # inverse CDF (one uniform per point); Z is only ever needed through
            # the per-component sufficient statistics, accumulated tile by tile
            zr = jnp.zeros((1, block_b), jnp.float32)

            def tile_stats(blk, t, s0, s1, s2, s3):
                """One data tile's allocation draw + sufficient-stat fold.

                ``t`` may be a TRACED tile index: the streamed path runs this
                body under lax.fori_loop (a 98-tile Python unroll at n = 10^5
                compiled for ~17 minutes, measured round 5; the fori body
                compiles once)."""
                s0, s1, s2, s3 = list(s0), list(s1), list(s2), list(s3)
                cnt = blk[:, 0:1]  # per-point replicate count (0 on padding rows)
                sm = blk[:, 1:2]  # per-point replicate sum
                sq = blk[:, 2:3]  # per-point replicate sum of squares
                ll = [
                    blk[:, 3 + k : 4 + k]
                    + 0.5 * cnt * (log_lam_cur[k] - LOG_2PI)
                    - 0.5 * lam[k] * (sq - 2.0 * mu[k] * sm + cnt * mu[k] * mu[k])
                    for k in range(k_comp)
                ]  # (tile_n, B) each
                m = ll[0]
                for k in range(1, k_comp):
                    m = jnp.maximum(m, ll[k])
                w = [jnp.exp(ll[k] - m) for k in range(k_comp)]
                tot = w[0]
                for k in range(1, k_comp):
                    tot = tot + w[k]
                u = uniform((tile_n, block_b)) * tot
                # zidx = #{k < K-1 : u >= cum_k}: the inverse-CDF component index
                cum = w[0]
                zidx = (u >= cum).astype(jnp.float32)
                for k in range(1, k_comp - 1):
                    cum = cum + w[k]
                    zidx = zidx + (u >= cum).astype(jnp.float32)
                if store_z:
                    # stream the allocation draw itself: stage this tile's zidx
                    # and DMA it to the (iter, point, chain) Z out buffer,
                    # double-buffered over the global stored-tile counter (every
                    # stored iteration issues exactly n_tiles copies, so the
                    # copy issued at counter c is waited at c + 2). Thinned runs
                    # store the Z drawn at the start of each stored iteration's
                    # LAST sweep (the end-of-sweep state the driver records).
                    idx = _store_index(it, n_burn, n_thin)

                    @pl.when(idx >= 0)
                    def _(zidx=zidx, t=t, idx=idx):
                        zc = idx * n_tiles + t
                        zslot = lax.rem(zc, 2)

                        @pl.when(zc >= 2)
                        def _():
                            prev = zc - 2
                            pi = lax.div(prev, n_tiles)
                            pt = lax.rem(prev, n_tiles)
                            pltpu.make_async_copy(
                                z_stage.at[zslot],
                                out_z_ref.at[pi, pl.ds(pt * tile_n, tile_n), pl.ds(pid * block_b, block_b)],
                                z_sems.at[zslot],
                            ).wait()

                        z_stage[pl.ds(zslot, 1)] = zidx[None]
                        pltpu.make_async_copy(
                            z_stage.at[zslot],
                            out_z_ref.at[idx, pl.ds(t * tile_n, tile_n), pl.ds(pid * block_b, block_b)],
                            z_sems.at[zslot],
                        ).start()

                # padding rows (cnt = 0, lp = 0) draw too, but contribute zeros
                for k in range(k_comp):
                    ind = (zidx == float(k)).astype(jnp.float32)
                    s0[k] = s0[k] + jnp.sum(ind * cnt, axis=0, keepdims=True)
                    s1[k] = s1[k] + jnp.sum(ind * sm, axis=0, keepdims=True)
                    s2[k] = s2[k] + jnp.sum(ind * sq, axis=0, keepdims=True)
                    s3[k] = s3[k] + jnp.sum(ind * blk[:, 3 + k : 4 + k], axis=0, keepdims=True)
                return tuple(s0), tuple(s1), tuple(s2), tuple(s3)

            zeros_k = tuple(zr for _ in range(k_comp))
            if not stream:
                s0, s1, s2, s3 = tile_stats(data_ref[:, :], 0, zeros_k, zeros_k, zeros_k, zeros_k)
            else:
                # fori over UNROLL-tile groups with all DMA slots STATIC inside
                # the body: full unrolling costs ~17 min of compile at n = 10^5
                # while a 1-tile fori body with a traced-slot read costs ~3x
                # runtime; the group body keeps the unrolled kernel's static
                # addressing at 1/(n_tiles/UNROLL)th the program size. Pack
                # time guarantees n_tiles is a multiple of UNROLL.
                d_dma(0, 0).start()

                def group_body(i, carry):
                    t0 = UNROLL * i
                    for u in range(UNROLL):
                        nxt = u + 1
                        if nxt < UNROLL:
                            d_dma(nxt % 2, t0 + nxt).start()
                        else:

                            @pl.when(t0 + nxt < n_tiles)
                            def _(nxt=nxt):
                                d_dma(nxt % 2, t0 + nxt).start()

                        d_dma(u % 2, t0 + u).wait()
                        _begin_inner(t0 + u)
                        carry = tile_stats(dbuf_ref[u % 2], t0 + u, *carry)
                    return carry

                s0, s1, s2, s3 = lax.fori_loop(
                    0, n_tiles // UNROLL, group_body, (zeros_k, zeros_k, zeros_k, zeros_k)
                )
                _end_inner()
            s0, s1, s2, s3 = list(s0), list(s1), list(s2), list(s3)

            if conjugate:
                # ---- conjugate NormalNormal over the component means (the
                # generic driver's mixture-means path in samplers/conjugate.py):
                # q_k = p0_k + lam_k S0_k, mean_k = (p0_k mu0_k + lam_k S1_k)/q_k.
                # One STACKED (K, B) normal draw: K separate (1, B) calls each
                # burn a full 8-sublane register tile per op (see prng.gamma_mt2)
                zs = normal_icdf((k_comp, block_b))
                mu_new = []
                for k in range(k_comp):
                    q = p0(k) + lam[k] * s0[k]
                    post_mean = (p0(k) * mu0(k) + lam[k] * s1[k]) / q
                    mu_new.append(post_mean + zs[k : k + 1, :] * lax.rsqrt(q))
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
            # the generic driver stores, Model.log_p convention); S0 is the
            # OBSERVATION count (replicates included), exactly the likelihood's
            # normal-term count
            lp_total = jnp.zeros((1, block_b), jnp.float32)
            for k in range(k_comp):
                log_lam = jnp.log(lam_new[k])
                lp_total = lp_total + 0.5 * s0[k] * (log_lam - LOG_2PI) - 0.5 * lam_new[k] * quad_new[k]
                lp_total = lp_total + s3[k]  # categorical: sum_i log w[i, Z_i]
                lp_total = lp_total + 0.5 * (jnp.log(p0(k)) - LOG_2PI) - 0.5 * p0(k) * (mu_new[k] - mu0(k)) ** 2
                lp_total = lp_total + lgam(k) + (a0(k) - 1.0) * log_lam - b0(k) * lam_new[k]

            idx = _store_index(it, n_burn, n_thin)

            @pl.when(idx >= 0)
            def _():
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
        lax.fori_loop(0, n_burn + n_keep * n_thin, iteration, carry0)

        for last in range(max(0, n_keep - 2), n_keep):
            slot = last % 2
            pltpu.make_async_copy(
                stage_ref.at[slot], out_ref.at[last, :, pl.ds(pid * block_b, block_b)], sems.at[slot]
            ).wait()

        if store_z:
            totz = n_keep * n_tiles
            for c in range(max(0, totz - 2), totz):
                ci, ct = divmod(c, n_tiles)
                pltpu.make_async_copy(
                    z_stage.at[c % 2],
                    out_z_ref.at[ci, pl.ds(ct * tile_n, tile_n), pl.ds(pid * block_b, block_b)],
                    z_sems.at[c % 2],
                ).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_burn", "n_iter", "n_chains", "n_thin", "step", "has_domain", "conjugate", "k_comp",
                     "store_z"),
)
def _run_fused_mixture_jit(seed, scal, data, n_burn, n_iter, n_chains, step, has_domain,
                           k_comp, init=None, conjugate=False, store_z=False, n_thin=1):
    n_pad = data.shape[0]
    stream = n_pad > RESIDENT_N
    block_b = _block_b(TILE_N if stream else n_pad, k_comp, store_z)
    b_total = n_chains + ((-n_chains) % block_b)
    out_rows = 2 * k_comp + 2 + ((-(2 * k_comp + 2)) % PAD)
    kernel = _make_kernel(n_pad, k_comp, float(step), has_domain, n_burn, n_iter, out_rows, block_b,
                          warm=init is not None, conjugate=conjugate, stream=stream,
                          store_z=store_z, n_thin=n_thin)
    data_spec = pl.BlockSpec(memory_space=pl.ANY) if stream else pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + [data_spec]
    args = [jnp.asarray([seed], jnp.int32), scal, data]
    if init is not None:
        rows_in = jnp.concatenate([
            jnp.asarray(init["mu"], jnp.float32).reshape(n_chains, k_comp).T,
            jnp.asarray(init["lam"], jnp.float32).reshape(n_chains, k_comp).T,
            jnp.asarray(init.get("acc", jnp.zeros(n_chains)), jnp.float32).reshape(1, n_chains),
        ], axis=0)
        rows_in = jnp.pad(rows_in, ((0, 0), (0, b_total - n_chains)))
        in_specs.append(pl.BlockSpec((2 * k_comp + 1, block_b), lambda i: (0, i)))
        args.append(rows_in)
    scratch = [
        pltpu.VMEM((2, out_rows, block_b), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if stream:
        scratch += [
            pltpu.VMEM((2, TILE_N, DATA_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    out_shape = [jax.ShapeDtypeStruct((n_iter, out_rows, b_total), jnp.float32)]
    if store_z:
        scratch += [
            pltpu.VMEM((2, TILE_N if stream else n_pad, block_b), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        out_shape.append(jax.ShapeDtypeStruct((n_iter, n_pad, b_total), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(b_total // block_b,),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY) for _ in out_shape),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # _block_b bounds the (K+5) live (tile_n, B) allocation temporaries
            # to ~24 MB (+ stage/dbuf pairs), over the 16 MB default scoped
            # limit at large K; v5e has 128 MB of VMEM
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(*args)
    draws = jnp.transpose(chain_slice(outs[0], n_chains), (2, 0, 1))
    result = {
        "means": draws[:, :, :k_comp],
        "lams": draws[:, :, k_comp : 2 * k_comp],
        "log_post": draws[:, :, 2 * k_comp],
        "accept_total": draws[:, -1, 2 * k_comp + 1],
    }
    if store_z:
        # (n_iter, n_pad, chains) -> (chains, n_iter, n_pad); padding rows are
        # sliced off (and the component index cast to int32) by the caller
        result["z"] = jnp.transpose(chain_slice(outs[1], n_chains), (2, 0, 1))
    return result


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
    store_z=False,
    n_thin=1,
):
    """Run the full K-component Gaussian-mixture Gibbs chain in one fused kernel.

    y: (n,) observations or (n, r) replicate columns sharing each point's
    allocation (the replicates collapse to per-point count/sum/sumsq at pack
    time, so r never enters the kernel); prior: (n, K) constant allocation
    weights (rows need not be normalized -- the categorical normalizes, and the
    stored log-posterior uses the raw log-weights exactly like Categorical.log_p).
    mu0/p0: the means' Normal prior (diagonal precision p0); a0/b0: per-component
    Gamma hyperparameters (every a0_k must be >= 1: the in-kernel elementwise
    Marsaglia-Tsang draw has no shape<1 boost); mu_init/lam_init:
    per-chain-identical initial values; domain: optional (lb, ub) arrays
    truncating the means' RW proposals.

    n <= 2048 keeps the packed data block VMEM-resident; n up to ~10^6 streams
    it from HBM in TILE_N-row tiles, double-buffered against the allocation pass.

    ``conjugate_means=True`` replaces the means' MH step with the closed-form
    conjugate NormalNormal draw (the generic driver's mixture-means path in
    samplers/conjugate.py); step/domain are then ignored and accept_total stays 0.

    ``store_z=True`` additionally streams each stored iteration's allocation
    draw to HBM (double-buffered tile DMAs riding the same pass that
    accumulates the sufficient statistics). The stored Z at iteration t is the
    allocation drawn at the START of sweep t -- exactly the end-of-sweep state
    the generic driver records, since no later sampler in the sweep touches Z.
    The Z buffer is n_iter * n_pad * chains f32 in HBM; the dispatcher caps it
    (falling back to the generic driver) rather than risk an OOM.

    Returns dict with means/lams: (n_chains, n_iter, K), log_post: (n_chains,
    n_iter), accept_total: (n_chains,) means-update accept counts over burn +
    sampling; with store_z also z: (n_chains, n_iter, n) int32."""
    y = np.asarray(y, np.float64)
    if y.ndim == 1:
        y = y[:, None]
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

    r = y.shape[1]
    stream = n > RESIDENT_N
    unit = pad_unit(n)
    n_pad = n + ((-n) % unit)
    data = np.zeros((n_pad, DATA_LANES), np.float64)
    data[:n, 0] = float(r)
    data[:n, 1] = y.sum(axis=1)
    data[:n, 2] = (y * y).sum(axis=1)
    data[:n, 3 : 3 + k_comp] = np.log(prior)

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
    out = _run_fused_mixture_jit(
        seed, scal, jnp.asarray(data, jnp.float32),
        n_burn=n_burn, n_iter=n_iter, n_chains=n_chains,
        step=float(step), has_domain=domain is not None and not conjugate_means,
        k_comp=k_comp, init=init, conjugate=bool(conjugate_means),
        store_z=bool(store_z), n_thin=int(n_thin),
    )
    if store_z:
        z = out["z"]
        out["z"] = (z if z.shape[2] == n else z[:, :, :n]).astype(jnp.int32)
    return out
