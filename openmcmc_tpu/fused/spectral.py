"""Spectral fused engines: linear-Gaussian MCMC in eigencoordinates, p up to 256.

The unrolled scalar kernels (fused/linreg.py, fused/mmala.py) hold the p x p
Cholesky state in SMEM scalars -- unbeatable for p <= 16, but compile size grows
O(p^3). This module removes the dimension limit with a TPU-native change of basis:

    one host-side generalized eigendecomposition   G v = s * plam v
    (V' diag(plam) V = I,  V' G V = diag(s),  G = X' P X)

simultaneously diagonalizes BOTH matrices every iteration touches, because the
linreg conditional precision Q = lam * diag(plam) + tau * G and the mMALA Fisher
metric A = tau * G + lam * diag(plam) are pencils of the same two matrices:

    Q = V^{-T} (lam I + tau S) V^{-1}     =>   in w = V^{-1} beta coordinates the
    A = V^{-T} (tau S + lam I) V^{-1}          conditional/proposal is DIAGONAL.

Every per-iteration quantity is then elementwise over the p eigencoordinates
(draws, quadratic forms, proposal densities); the only matrix work left is
beta = V w for storage -- a (p, p) x (p, lanes) matmul that rides the MXU. The
quadratic-form identities:

    (beta - mu)' diag(plam) (beta - mu) = ||w - w_mu||^2,   w_mu = V' diag(plam) mu
    (y - X beta)' P (y - X beta)        = yPy - 2 (V'c)' w + w' S w,   c = X' P y

Hyperparameters (a/b Gamma constants, step) are static; V, S, w_mu, V'c are
constant VMEM inputs. Chains ride the lane axis exactly like the other engines.
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
    gamma_mt2,
    normal_icdf,
    seed_bits as _seed_bits,
    uniform,
)
from openmcmc_tpu.fused.layout import chain_slice, store_index as _store_index

MAX_P = 256
MAX_P_SMOOTHER = 1024  # V is (p, p) f32 in VMEM: 4 MB at the limit
# past the VMEM limit the smoother STREAMS the eigenbasis from HBM in lane
# blocks (double-buffered DMA overlapping the storage matmul); the cap is set
# by the one-time host-side f64 eigendecomposition (O(p^3), ~minutes at 8k)
# and the (p_pad, STREAM_RB) VMEM stage pair
MAX_P_SMOOTHER_STREAM = 8192
STREAM_RB = 256  # field-lane block per DMA: multiple of the 128-lane tiling
PAD = 8  # sublane granularity for the (p_pad, lanes) working arrays

_EIG_CACHE: dict = {}  # (P0 bytes, noise-diag bytes) -> (V, s); capacity 8


def _block_b(p_pad: int) -> int:
    """Lane-block size keeping the ~6 (p_pad, B) VMEM buffers under ~12 MB."""
    if p_pad <= 64:
        return 2048
    if p_pad <= 128:
        return 1024
    if p_pad <= 256:
        return 512
    if p_pad <= 512:
        return 256
    return 128


def _eigenbasis(G: np.ndarray, plam: np.ndarray):
    """Host-side f64 generalized eigendecomposition of the (G, diag(plam)) pencil.

    Returns V (plam-orthonormal eigenvectors) and s (eigenvalues >= 0) with
    V' diag(plam) V = I and V' G V = diag(s)."""
    rt = 1.0 / np.sqrt(plam.astype(np.float64))
    Gt = rt[:, None] * G.astype(np.float64) * rt[None, :]
    s, U = np.linalg.eigh((Gt + Gt.T) / 2.0)
    s = np.maximum(s, 0.0)  # G is PSD; clip eigen-noise
    V = rt[:, None] * U
    return V, s


# ---------------------------------------------------------------------------
# linreg: Gibbs sweep (beta | lam, tau conjugate draw; Gamma updates)
# ---------------------------------------------------------------------------


def _make_linreg_kernel(p_pad, p_real, n_obs, n_burn, n_keep, a_lam, b_lam, a_tau, b_tau,
                        lam0, tau0, block_b, warm=False, n_thin=1):
    a_tau_star = a_tau + 0.5 * n_obs
    a_lam_star = a_lam + 0.5 * p_real
    from scipy.special import gammaln

    lgam_lam = float(a_lam * np.log(b_lam) - gammaln(a_lam))
    lgam_tau = float(a_tau * np.log(b_tau) - gammaln(a_tau))

    def kernel(seed_ref, scal_ref, V_ref, svec_ref, wmu_ref, cv_ref, mask_ref,
               *refs):
        if warm:
            init_ref, outb_ref, outs_ref, stageb_ref, stages_ref, sems = refs
        else:
            outb_ref, outs_ref, stageb_ref, stages_ref, sems = refs
        p128 = V_ref.shape[0]  # field rows, padded to the 128-lane tiling
        pid = pl.program_id(0)
        _seed_bits(seed_ref[0] + pid)
        yPy = scal_ref[0]
        logdet_plam = scal_ref[1]
        logdet_ptau = scal_ref[2]
        svec = svec_ref[:, :]  # (p_pad, 1)
        wmu = wmu_ref[:, :]
        cv = cv_ref[:, :]
        mask = mask_ref[:, :]

        def wait_store(slot, idx):
            pltpu.make_async_copy(
                stageb_ref.at[slot], outb_ref.at[idx, pl.ds(pid * block_b, block_b), :],
                sems.at[slot, 0],
            ).wait()
            pltpu.make_async_copy(
                stages_ref.at[slot], outs_ref.at[idx, :, pl.ds(pid * block_b, block_b)],
                sems.at[slot, 1],
            ).wait()

        def iteration(it, carry):

            _begin_iteration(it)
            lam, tau = carry  # (1, block_b)

            # ---- beta | y, tau, lam: diagonal in eigencoordinates -----------
            z = normal_icdf((p_pad, block_b))
            d = lam * mask + tau * svec + (1.0 - mask)  # unit rows on the padding
            w = ((lam * wmu + tau * cv) / d + z * jax.lax.rsqrt(d)) * mask

            # ---- NormalGamma updates (elementwise quadratic forms) ----------
            r = w - wmu
            quad_lam = jnp.sum(r * r * mask, axis=0, keepdims=True)
            quad_tau = yPy - 2.0 * jnp.sum(cv * w, axis=0, keepdims=True) + jnp.sum(
                svec * w * w, axis=0, keepdims=True
            )
            quad_tau = jnp.maximum(quad_tau, 0.0)  # f32 cancellation guard
            tau_new, lam_new = gamma_mt2(
                a_tau_star, a_lam_star, b_tau + 0.5 * quad_tau, b_lam + 0.5 * quad_lam
            )

            # ---- analytic log posterior (matches Model.log_p) ---------------
            log_like = 0.5 * (n_obs * jnp.log(tau_new) + logdet_ptau - n_obs * LOG_2PI - tau_new * quad_tau)
            log_beta = 0.5 * (p_real * jnp.log(lam_new) + logdet_plam - p_real * LOG_2PI - lam_new * quad_lam)
            log_lam = lgam_lam + (a_lam - 1.0) * jnp.log(lam_new) - b_lam * lam_new
            log_tau = lgam_tau + (a_tau - 1.0) * jnp.log(tau_new) - b_tau * tau_new
            log_post = log_like + log_beta + log_lam + log_tau

            # ---- store: back to beta = V w (MXU) + double-buffered DMA.
            # The contraction is dot_general(w, V, ((0,), (1,))) -> (chains,
            # field): contract-sublane-with-lane is the one matmul orientation
            # Mosaic reliably lowers here (jnp.dot(V, w) hits "Not implemented:
            # Sublane broadcast" on real hardware), and it lands the draw in the
            # (chains, field) orientation the out buffer wants anyway.
            idx = _store_index(it, n_burn, n_thin)

            @pl.when(idx >= 0)
            def _():
                slot = lax.rem(idx, 2)

                @pl.when(idx >= 2)
                def _():
                    wait_store(slot, idx - 2)

                bt = lax.dot_general(
                    w, V_ref[:, :], (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
                )  # (block_b, p128)
                stageb_ref[pl.ds(slot, 1)] = bt[None, :, :]
                stages_ref[pl.ds(slot, 1)] = jnp.concatenate(
                    [lam_new, tau_new, log_post, jnp.zeros((5, block_b), jnp.float32)], axis=0
                )[None, :, :]
                pltpu.make_async_copy(
                    stageb_ref.at[slot], outb_ref.at[idx, pl.ds(pid * block_b, block_b), :],
                    sems.at[slot, 0],
                ).start()
                pltpu.make_async_copy(
                    stages_ref.at[slot], outs_ref.at[idx, :, pl.ds(pid * block_b, block_b)],
                    sems.at[slot, 1],
                ).start()

            return lam_new, tau_new

        if warm:
            # per-chain warm start (resume): rows [lam | tau] (index-mapped block)
            lam0_row = init_ref[0:1, :]
            tau0_row = init_ref[1:2, :]
        else:
            lam0_row = jnp.full((1, block_b), lam0, jnp.float32)
            tau0_row = jnp.full((1, block_b), tau0, jnp.float32)
        lax.fori_loop(0, n_burn + n_keep * n_thin, iteration, (lam0_row, tau0_row))

        for last in range(max(0, n_keep - 2), n_keep):
            wait_store(last % 2, last)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_burn", "n_iter", "n_chains", "n_thin", "a_lam", "b_lam", "a_tau", "b_tau", "lam0", "tau0", "n_obs", "p_real"),
)
def _run_spectral_linreg_jit(seed, V, svec, wmu, cv, yPy, logdet_plam, logdet_ptau,
                             n_burn, n_iter, n_chains, a_lam, b_lam, a_tau, b_tau, lam0, tau0,
                             n_obs, p_real, init=None, n_thin=1):
    p128, p_pad = V.shape
    block_b = _block_b(p_pad)
    b_total = n_chains + ((-n_chains) % block_b)
    mask = (jnp.arange(p_pad) < p_real).astype(jnp.float32).reshape(p_pad, 1)
    kernel = _make_linreg_kernel(
        p_pad, float(p_real), float(n_obs), n_burn, n_iter,
        float(a_lam), float(b_lam), float(a_tau), float(b_tau), float(lam0), float(tau0), block_b,
        warm=init is not None, n_thin=n_thin,
    )
    shared = pl.BlockSpec(memory_space=pltpu.VMEM)
    scal = jnp.stack([yPy, logdet_plam, logdet_ptau]).astype(jnp.float32)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + [shared] * 5
    args = [jnp.asarray([seed], jnp.int32), scal, V, svec, wmu, cv, mask]
    if init is not None:
        rows_in = jnp.stack([
            jnp.asarray(init["lam"], jnp.float32).reshape(-1),
            jnp.asarray(init["tau"], jnp.float32).reshape(-1),
        ])
        rows_in = jnp.pad(rows_in, ((0, 0), (0, b_total - n_chains)))
        in_specs.append(pl.BlockSpec((2, block_b), lambda i: (0, i)))
        args.append(rows_in)
    out_b, out_s = pl.pallas_call(
        kernel,
        grid=(b_total // block_b,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 2,
        out_shape=(
            jax.ShapeDtypeStruct((n_iter, b_total, p128), jnp.float32),
            jax.ShapeDtypeStruct((n_iter, 8, b_total), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_b, p128), jnp.float32),
            pltpu.VMEM((2, 8, block_b), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*args)
    out_b = out_b if b_total == n_chains else out_b[:, :n_chains, :]
    if p128 != p_real:
        out_b = out_b[:, :, :p_real]
    beta = jnp.transpose(out_b, (1, 0, 2))  # (chains, iters, p)
    small = jnp.transpose(chain_slice(out_s, n_chains), (2, 0, 1))
    return {
        "beta": beta,
        "lam": small[:, :, 0],
        "tau": small[:, :, 1],
        "log_post": small[:, :, 2],
    }


def run_spectral_linreg(
    seed, X, y, n_burn, n_iter, n_chains,
    a_tau=1e-3, b_tau=1e-3, a_lam=1e-3, b_lam=1e-3, lam0=0.01, tau0=1.0,
    mu=None, plam_diag=None, ptau_diag=None, init=None, n_thin=1,
):
    """Bayesian linear regression, whole run in one launch, p <= 256.

    Same model/returns as fused.linreg.run_fused_linreg (y ~ N(X beta,
    (tau diag(ptau))^{-1}), beta ~ N(mu, (lam diag(plam))^{-1}), Gamma scales);
    the host does one generalized eigendecomposition instead of the kernel doing
    an unrolled Cholesky per iteration."""
    X = np.asarray(X, np.float64)
    y = np.asarray(y, np.float64).reshape(-1)
    n_obs, p = X.shape
    if p > MAX_P:
        raise ValueError(f"spectral linreg supports p <= {MAX_P}, got {p}")
    mu = np.zeros(p) if mu is None else np.asarray(mu, np.float64).reshape(-1)
    plam = np.ones(p) if plam_diag is None else np.asarray(plam_diag, np.float64).reshape(-1)
    ptau = np.ones(n_obs) if ptau_diag is None else np.asarray(ptau_diag, np.float64).reshape(-1)

    XtP = X.T * ptau[None, :]
    G = XtP @ X
    c = (XtP @ y).reshape(-1)
    V, s = _eigenbasis(G, plam)
    wmu = V.T @ (plam * mu)
    cv = V.T @ c

    p_pad = p + ((-p) % PAD)
    pad = p_pad - p

    def col(v):
        return jnp.asarray(np.concatenate([v, np.zeros(pad)]), jnp.float32).reshape(p_pad, 1)

    # field rows padded to the 128-lane tiling of the (iter, chains, field) out
    p128 = p + ((-p) % 128)
    Vp = np.zeros((p128, p_pad))
    Vp[:p, :p] = V
    return _run_spectral_linreg_jit(
        seed, jnp.asarray(Vp, jnp.float32), col(s), col(wmu), col(cv),
        jnp.asarray(np.sum(y * ptau * y), jnp.float32),
        jnp.asarray(np.sum(np.log(plam)), jnp.float32),
        jnp.asarray(np.sum(np.log(ptau)), jnp.float32),
        n_burn=n_burn, n_iter=n_iter, n_chains=n_chains,
        a_lam=float(a_lam), b_lam=float(b_lam), a_tau=float(a_tau), b_tau=float(b_tau),
        lam0=float(lam0), tau0=float(tau0), n_obs=n_obs, p_real=p, init=init,
        n_thin=int(n_thin),
    )


# ---------------------------------------------------------------------------
# smoother: Gibbs sweep for ANY symmetric prior precision (lattice/CAR/dense)
# ---------------------------------------------------------------------------


def _make_smoother_kernel(p_pad, p_real, n_burn, n_keep, a_lam, b_lam, a_tau, b_tau,
                          lam0, tau0, block_b, warm=False, stream=False, n_thin=1):
    a_lam_star = a_lam + 0.5 * p_real
    a_tau_star = a_tau + 0.5 * p_real
    from scipy.special import gammaln

    lgam_lam = float(a_lam * np.log(b_lam) - gammaln(a_lam))
    lgam_tau = float(a_tau * np.log(b_tau) - gammaln(a_tau))

    def kernel(seed_ref, scal_ref, M_ref, svec_ref, wy_ref, wmu_ref, mask_ref,
               *refs):
        if warm and stream:
            init_ref, outb_ref, outs_ref, stageb_ref, stages_ref, sems, mbuf_ref, msem = refs
        elif warm:
            init_ref, outb_ref, outs_ref, stageb_ref, stages_ref, sems = refs
        elif stream:
            outb_ref, outs_ref, stageb_ref, stages_ref, sems, mbuf_ref, msem = refs
        else:
            outb_ref, outs_ref, stageb_ref, stages_ref, sems = refs
        # M is always (p128/p_out, p_pad): field rows on sublanes, eigen axis on
        # lanes. VMEM tier: resident, one dot_general per store. Streaming tier
        # (stream=True): M lives in HBM; STREAM_RB-row field blocks are DMAd into
        # a double-buffered VMEM stage and the store matmul runs block by block,
        # DMA overlapping the MXU.
        #
        # Draw-store layout: the DIRECT (chains, iter, field) layout DMAs an
        # extent-1 slice of the 8-tiled iteration axis, which Mosaic only
        # accepts when the field spans exactly ONE 128-lane tile (the slice is
        # then contiguous). p128 == 128 keeps it (the benchmark fast path: no
        # post-kernel transpose of the multi-GB store); any wider field stores
        # as (iter, chains, field) -- a scalar index on the untiled leading
        # axis, block-aligned slices of the tile-8 chain axis, full lane
        # extent -- and the driver transposes (1, 0, 2) after the kernel
        # (chains are bounded at these p anyway). The store matmul keeps the
        # SAME (w, M) contraction in every tier.
        p128 = M_ref.shape[0]
        direct = p128 == 128
        pid = pl.program_id(0)
        _seed_bits(seed_ref[0] + pid)
        logdet_p0 = scal_ref[0]
        logdet_d = scal_ref[1]
        svec = svec_ref[:, :]  # (p_pad, 1) pencil eigenvalues, 0 on padding
        wy = wy_ref[:, :]  # w-coordinates of the data, V^{-1} y = V' D y
        wmu = wmu_ref[:, :]  # w-coordinates of the prior mean
        mask = mask_ref[:, :]

        def outb_at(idx):
            if direct:
                return outb_ref.at[pl.ds(pid * block_b, block_b), idx]
            return outb_ref.at[idx, pl.ds(pid * block_b, block_b), :]

        def wait_store(slot, idx):
            pltpu.make_async_copy(
                stageb_ref.at[slot], outb_at(idx), sems.at[slot, 0],
            ).wait()
            pltpu.make_async_copy(
                stages_ref.at[slot], outs_ref.at[idx, :, pl.ds(pid * block_b, block_b)],
                sems.at[slot, 1],
            ).wait()

        def iteration(it, carry):

            _begin_iteration(it)
            lam, tau = carry  # (1, block_b)

            # ---- NormalNormal: b | y, lam, tau is DIAGONAL in w = V^{-1} b --
            # Q = lam P0 + tau D = V^{-T} (lam S + tau I) V^{-1}; canonical mean
            # rhs = tau D y + lam P0 mu0 => V' rhs = tau wy + lam S wmu
            z = normal_icdf((p_pad, block_b))
            d = (lam * svec + tau) * mask + (1.0 - mask)
            w = ((tau * wy + lam * svec * wmu) / d + z * jax.lax.rsqrt(d)) * mask

            # ---- NormalGamma updates: both quadratic forms are elementwise --
            # (b-mu0)' P0 (b-mu0) = (w-wmu)' S (w-wmu); (y-b)' D (y-b) = ||wy-w||^2
            r = w - wmu
            quad_lam = jnp.sum(svec * r * r, axis=0, keepdims=True)
            t = (wy - w) * mask
            quad_tau = jnp.sum(t * t, axis=0, keepdims=True)
            lam_new, tau_new = gamma_mt2(
                a_lam_star, a_tau_star, b_lam + 0.5 * quad_lam, b_tau + 0.5 * quad_tau
            )

            # ---- analytic log posterior (gmrf_smoother kernel's convention) -
            log_like = 0.5 * (p_real * jnp.log(tau_new) + logdet_d - p_real * LOG_2PI - tau_new * quad_tau)
            log_prior_b = 0.5 * (p_real * jnp.log(lam_new) + logdet_p0 - p_real * LOG_2PI - lam_new * quad_lam)
            log_lam = lgam_lam + (a_lam - 1.0) * jnp.log(lam_new) - b_lam * lam_new
            log_tau = lgam_tau + (a_tau - 1.0) * jnp.log(tau_new) - b_tau * tau_new
            log_post = log_like + log_prior_b + log_lam + log_tau

            # ---- store DIRECTLY in the driver's (chains, iter, field) layout:
            # dot_general contracts w's eigen axis against V' so the draw lands
            # TRANSPOSED (lanes = chains first); lam/tau/log_post go through a
            # trivial 8x8 identity contraction into their own stage. No
            # post-kernel transpose or row-slice of the ~GB store is ever
            # materialized (they cost ~10 ms at benchmark sizes).
            idx = _store_index(it, n_burn, n_thin)

            @pl.when(idx >= 0)
            def _():
                slot = lax.rem(idx, 2)

                @pl.when(idx >= 2)
                def _():
                    wait_store(slot, idx - 2)

                if stream:
                    n_rb = p128 // STREAM_RB

                    def m_dma(mslot, rb):
                        return pltpu.make_async_copy(
                            M_ref.at[pl.ds(rb * STREAM_RB, STREAM_RB), :],
                            mbuf_ref.at[mslot], msem.at[mslot],
                        )

                    m_dma(0, 0).start()
                    for rb in range(n_rb):
                        if rb + 1 < n_rb:
                            m_dma((rb + 1) % 2, rb + 1).start()
                        m_dma(rb % 2, rb).wait()
                        bt_rb = lax.dot_general(
                            w, mbuf_ref[rb % 2], (((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST,
                        )  # (block_b, STREAM_RB)
                        stageb_ref[pl.ds(slot, 1), :, pl.ds(rb * STREAM_RB, STREAM_RB)] = bt_rb[None, :, :]
                else:
                    bt = lax.dot_general(
                        w, M_ref[:, :], (((0,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
                    )  # (block_b, p128): M rows are the field rows of V, lane-padded
                    stageb_ref[pl.ds(slot, 1)] = bt[None, :, :]
                stages_ref[pl.ds(slot, 1)] = jnp.concatenate(
                    [lam_new, tau_new, log_post, jnp.zeros((5, block_b), jnp.float32)], axis=0
                )[None, :, :]
                pltpu.make_async_copy(
                    stageb_ref.at[slot], outb_at(idx), sems.at[slot, 0],
                ).start()
                pltpu.make_async_copy(
                    stages_ref.at[slot], outs_ref.at[idx, :, pl.ds(pid * block_b, block_b)],
                    sems.at[slot, 1],
                ).start()

            return lam_new, tau_new

        if warm:
            # per-chain warm start (resume): rows [lam | tau] (index-mapped block)
            lam0_row = init_ref[0:1, :]
            tau0_row = init_ref[1:2, :]
        else:
            lam0_row = jnp.full((1, block_b), lam0, jnp.float32)
            tau0_row = jnp.full((1, block_b), tau0, jnp.float32)
        lax.fori_loop(0, n_burn + n_keep * n_thin, iteration, (lam0_row, tau0_row))

        for last in range(max(0, n_keep - 2), n_keep):
            wait_store(last % 2, last)

    return kernel


# NOTE: the smoother kernel stores via dot_general directly in the driver's
# (chains, iter, field) layout when the field spans one 128-lane tile (the
# benchmark fast path); wider fields use the (iter, field, chains) layout +
# post-kernel transpose, like the linreg/mmala kernels.


@functools.partial(
    jax.jit,
    static_argnames=("n_burn", "n_iter", "n_chains", "n_thin", "a_lam", "b_lam", "a_tau", "b_tau", "lam0", "tau0", "p_real", "stream"),
)
def _run_spectral_smoother_jit(seed, M, svec, wy, wmu, logdet_p0, logdet_d,
                               n_burn, n_iter, n_chains, a_lam, b_lam, a_tau, b_tau,
                               lam0, tau0, p_real, init=None, stream=False, n_thin=1):
    # M is (p128, p_pad) in every tier: field rows on sublanes (so the streaming
    # DMA slices the tile-8 sublane axis), eigen axis on lanes
    p128, p_pad = M.shape
    direct = p128 == 128  # single-lane-tile field: direct (chains, iter, field) store
    block_b = _block_b(p_pad)
    b_total = n_chains + ((-n_chains) % block_b)
    mask = (jnp.arange(p_pad) < p_real).astype(jnp.float32).reshape(p_pad, 1)
    kernel = _make_smoother_kernel(
        p_pad, float(p_real), n_burn, n_iter,
        float(a_lam), float(b_lam), float(a_tau), float(b_tau), float(lam0), float(tau0), block_b,
        warm=init is not None, stream=stream, n_thin=n_thin,
    )
    shared = pl.BlockSpec(memory_space=pltpu.VMEM)
    scal = jnp.stack([logdet_p0, logdet_d]).astype(jnp.float32)
    m_spec = pl.BlockSpec(memory_space=pl.ANY) if stream else shared
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + [m_spec] + [shared] * 4
    args = [jnp.asarray([seed], jnp.int32), scal, M, svec, wy, wmu, mask]
    if init is not None:
        rows_in = jnp.stack([
            jnp.asarray(init["lam"], jnp.float32).reshape(-1),
            jnp.asarray(init["tau"], jnp.float32).reshape(-1),
        ])
        rows_in = jnp.pad(rows_in, ((0, 0), (0, b_total - n_chains)))
        in_specs.append(pl.BlockSpec((2, block_b), lambda i: (0, i)))
        args.append(rows_in)
    outb_shape = (b_total, n_iter, p128) if direct else (n_iter, b_total, p128)
    scratch = [
        pltpu.VMEM((2, block_b, p128), jnp.float32),
        pltpu.VMEM((2, 8, block_b), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    if stream:
        scratch += [
            pltpu.VMEM((2, STREAM_RB, p_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    out_b, out_s = pl.pallas_call(
        kernel,
        grid=(b_total // block_b,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 2,
        out_shape=(
            jax.ShapeDtypeStruct(outb_shape, jnp.float32),
            jax.ShapeDtypeStruct((n_iter, 8, b_total), jnp.float32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # streaming working set: mbuf pair + stage pair + ~6 live
            # (p_pad, block_b) elementwise arrays (~50 MB at p = 8192)
            vmem_limit_bytes=(100 * 1024 * 1024) if stream else None,
        ),
    )(*args)
    if direct:
        # chain padding (none at benchmark sizes) and field lane-padding slices;
        # the multi-GB field buffer is written by the kernel directly in the
        # driver's (chains, iter, field) layout -- no post-kernel transpose
        out_b = out_b if b_total == n_chains else out_b[:n_chains]
        if p128 != p_real:
            out_b = out_b[:, :, :p_real]
    else:
        # transposed layout (field wider than one lane tile): slice, then one
        # (iter, chains, field) -> (chains, iter, field) transpose; chains are
        # bounded at these p (the draw store alone is n_chains x iters x p f32)
        out_b = out_b if b_total == n_chains else out_b[:, :n_chains, :]
        if p128 != p_real:
            out_b = out_b[:, :, :p_real]
        out_b = jnp.transpose(out_b, (1, 0, 2))
    small = jnp.transpose(chain_slice(out_s, n_chains), (2, 0, 1))  # (chains, iters, 8)
    return {
        "b": out_b,
        "lam": small[:, :, 0],
        "tau": small[:, :, 1],
        "log_post": small[:, :, 2],
    }


def run_spectral_smoother(
    seed, y, P0, n_burn, n_iter, n_chains,
    a_lam=10.0, b_lam=1.0, a_tau=1.0, b_tau=1.0, lam0=100.0, tau0=1.0,
    noise_diag=None, mu0=None, logdet_p0=None, init=None, n_thin=1,
):
    """GMRF smoother with ARBITRARY symmetric prior precision, one launch, p <= 8192.

    p <= 1024 holds the eigenbasis resident in VMEM; beyond that the store
    matrix streams from HBM in STREAM_RB-wide lane blocks (double-buffered DMA
    overlapping the MXU store matmul), so a 64 x 64 lattice (p = 4096) still
    runs the whole chain in ONE kernel launch.

    Same model/returns as fused.gmrf_smoother.run_fused_smoother --
    y ~ N(b, (tau D)^{-1}), b ~ N(mu0, (lam P0)^{-1}), Gamma scales -- but where
    the Thomas kernel needs tridiagonal P0, here ``P0`` is any symmetric PSD
    (p, p) dense array: 2-D lattice stencils, CAR graphs, RCM-permuted sparse
    patterns (reference gmrf.py:489-520 factors these through SuperLU; the
    TPU-native route is one host-side f64 generalized eigendecomposition of the
    (P0, D) pencil, after which every iteration is elementwise in
    eigencoordinates with one MXU matmul per stored draw)."""
    y = np.asarray(y, np.float64).reshape(-1)
    p = y.shape[0]
    if p > MAX_P_SMOOTHER_STREAM:
        raise ValueError(f"spectral smoother supports p <= {MAX_P_SMOOTHER_STREAM}, got {p}")
    stream = p > MAX_P_SMOOTHER
    P0 = np.asarray(P0, np.float64)
    d_vec = np.ones(p) if noise_diag is None else np.asarray(noise_diag, np.float64).reshape(-1)
    mu0 = np.zeros(p) if mu0 is None else np.asarray(mu0, np.float64).reshape(-1)

    # memoize the host-side eigendecomposition: repeated runs of the same model
    # (chunked runs, resume, benchmarking) should not re-pay the f64 eigh
    # (~3.5 ms at p = 100, O(p^3) beyond)
    cache_key = (P0.tobytes(), d_vec.tobytes())
    hit = _EIG_CACHE.get(cache_key)
    if hit is None:
        hit = _eigenbasis(P0, d_vec)  # V' D V = I, V' P0 V = diag(s)
        if len(_EIG_CACHE) >= 8:
            _EIG_CACHE.pop(next(iter(_EIG_CACHE)))
        _EIG_CACHE[cache_key] = hit
    V, s = hit
    # an INTRINSIC (singular) prior -- e.g. the RW1 precision -- has near-zero
    # pencil eigenvalues that can come out of the f64 eigensolver slightly
    # negative; clamp so the conditional stays PD and the null directions carry
    # zero prior quadratic, exactly like (b-mu)' P0 (b-mu)
    s = np.maximum(s, 0.0)
    wy = V.T @ (d_vec * y)
    wmu = V.T @ (d_vec * mu0)
    logdet_d = float(np.sum(np.log(d_vec)))
    if logdet_p0 is None:
        # |P0| = |D| * prod(s): P0 = D^{1/2} (D^{-1/2} P0 D^{-1/2}) D^{1/2}.
        # For a singular P0 this is an arbitrary large-negative finite constant;
        # dispatch passes the generic driver's clamped structured-Cholesky value
        # instead so the stored log_post matches Model.log_p bit-for-bit in
        # convention (both are improper-prior normalizing pseudo-constants).
        logdet_p0 = logdet_d + float(np.sum(np.log(np.maximum(s, 1e-300))))

    # streaming DMAs M row blocks whose LANE extent is p_pad: Mosaic memref
    # slices must be 128-tile-aligned on the lane dim, so the eigen axis rounds
    # to 128 in the streaming tier (sublane-8 suffices when M sits in VMEM)
    p_pad = p + ((-p) % (128 if stream else PAD))
    pad = p_pad - p

    def col(v):
        return jnp.asarray(np.concatenate([v, np.zeros(pad)]), jnp.float32).reshape(p_pad, 1)

    # store matrix: the field rows of V (field on sublanes, eigen axis on
    # lanes); the kernel contracts w's eigen axis against it per stored draw.
    # Streaming (p > MAX_P_SMOOTHER): the field axis rounds to STREAM_RB so the
    # per-block HBM DMA slices whole row blocks
    p128 = p + ((-p) % (STREAM_RB if stream else 128))
    M = np.zeros((p128, p_pad))
    M[:p, :p] = V
    return _run_spectral_smoother_jit(
        seed, jnp.asarray(M, jnp.float32), col(s), col(wy), col(wmu),
        jnp.asarray(logdet_p0, jnp.float32), jnp.asarray(logdet_d, jnp.float32),
        n_burn=n_burn, n_iter=n_iter, n_chains=n_chains,
        a_lam=float(a_lam), b_lam=float(b_lam), a_tau=float(a_tau), b_tau=float(b_tau),
        lam0=float(lam0), tau0=float(tau0), p_real=p, init=init, stream=stream,
        n_thin=int(n_thin),
    )


# ---------------------------------------------------------------------------
# mMALA: constant-metric manifold Langevin in eigencoordinates
# ---------------------------------------------------------------------------


def _make_mmala_kernel(p_pad, p_real, n_obs, step, n_burn, n_keep, block_b,
                       adapt=False, target=0.574, rate=0.05, warm=False, n_thin=1):
    s2_const = step * step

    def kernel(seed_ref, scal_ref, V_ref, dvec_ref, vw_ref, w0_ref, mask_ref,
               *refs):
        if warm:
            init_ref, outb_ref, outs_ref, stageb_ref, stages_ref, sems = refs
        else:
            outb_ref, outs_ref, stageb_ref, stages_ref, sems = refs
        p128 = V_ref.shape[0]  # field rows, padded to the 128-lane tiling
        pid = pl.program_id(0)
        _seed_bits(seed_ref[0] + pid)
        yPy = scal_ref[0]  # b-independent quadratic (tau y'Py + lam mu0'Plam mu0)
        logdet_tauP = scal_ref[1]
        logdet_lamPlam = scal_ref[2]
        half_logdetA = scal_ref[3]  # 1/2 sum log d_i
        dvec = dvec_ref[:, :]  # (p_pad, 1) metric eigenvalues, 1 on padding
        vw = vw_ref[:, :]  # V' v (canonical mean vector in w-coords)
        mask = mask_ref[:, :]

        lik_const = 0.5 * (logdet_tauP - n_obs * LOG_2PI)
        pri_const = 0.5 * (logdet_lamPlam - p_real * LOG_2PI)

        def log_target(w):
            quad = jnp.sum(dvec * w * w * mask, axis=0, keepdims=True)
            lin = jnp.sum(vw * w, axis=0, keepdims=True)
            return lik_const + pri_const - 0.5 * (quad + yPy) + lin

        def prop_logq(w_to, w_mu, s2v, log_s2v):
            # N(w_to; w_mu, s^2 D^{-1}): elementwise in eigencoordinates;
            # s2v/log_s2v are (1, block_b) rows when adapting, scalars otherwise
            r = w_to - w_mu
            ssq = jnp.sum(dvec * r * r * mask, axis=0, keepdims=True)
            return half_logdetA - 0.5 * p_real * (LOG_2PI + log_s2v) - 0.5 * ssq / s2v

        def drift(w, s2v):
            # mu(w) = w + (s^2/2) D^{-1} (vw - D w)
            return w + 0.5 * s2v * (vw / dvec - w)

        def iteration(it, carry):

            _begin_iteration(it)
            w, lp, acc, log_step = carry
            if adapt:
                # log_step is carried at FULL (p_pad, block_b) shape (identical
                # rows): Mosaic cannot sublane-broadcast a loop-carried (1, B)
                # row against the (p, B) proposal math (Not implemented), while
                # full-shape elementwise ops and sublane row slices both lower
                # cleanly. The (1, B) row views feed the logq scalar terms.
                step_b = jnp.exp(log_step)  # (p_pad, block_b)
                s2_b = step_b * step_b
                s2v = s2_b[0:1, :]
                log_s2v = 2.0 * log_step[0:1, :]
            else:
                s2v, log_s2v = s2_const, np.log(s2_const)
                step_b, s2_b = step, s2_const
            z = normal_icdf((p_pad, block_b))
            mu_cur = drift(w, s2_b)
            w_prop = (mu_cur + step_b * z * jax.lax.rsqrt(dvec)) * mask
            lp_prop = log_target(w_prop)
            log_accept = (lp_prop - lp + prop_logq(w, drift(w_prop, s2_b), s2v, log_s2v)
                          - prop_logq(w_prop, mu_cur, s2v, log_s2v))
            accept = jnp.log(uniform((1, block_b))) < log_accept
            w_new = jnp.where(accept, w_prop, w)
            lp_new = jnp.where(accept, lp_prop, lp)
            acc_new = acc + accept.astype(jnp.float32)
            if adapt:
                # Robbins-Monro toward the target acceptance, burn-in only
                # (generic semantics: samplers/metropolis.py _adapt). alpha is
                # lifted to (p_pad, B) via the two-sided (1, B) x (p, 1)
                # broadcast (the smoother kernel's proven pattern)
                alpha = jnp.exp(jnp.minimum(log_accept, 0.0))
                alpha_b = alpha * jnp.ones((p_pad, 1), jnp.float32)
                nudged = log_step + rate * (alpha_b - target)
                log_step = jnp.where(it < n_burn, nudged, log_step)

            idx = _store_index(it, n_burn, n_thin)

            @pl.when(idx >= 0)
            def _():
                slot = lax.rem(idx, 2)

                def wait_store(wslot, widx):
                    pltpu.make_async_copy(
                        stageb_ref.at[wslot], outb_ref.at[widx, pl.ds(pid * block_b, block_b), :],
                        sems.at[wslot, 0],
                    ).wait()
                    pltpu.make_async_copy(
                        stages_ref.at[wslot], outs_ref.at[widx, :, pl.ds(pid * block_b, block_b)],
                        sems.at[wslot, 1],
                    ).wait()

                @pl.when(idx >= 2)
                def _():
                    wait_store(slot, idx - 2)

                # (chains, field) via contract-sublane-with-lane -- the one
                # matmul orientation Mosaic reliably lowers here (see the
                # linreg kernel note: jnp.dot(V, w) fails on hardware)
                bt = lax.dot_general(
                    w_new, V_ref[:, :], (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
                )  # (block_b, p128)
                stageb_ref[pl.ds(slot, 1)] = bt[None, :, :]
                stages_ref[pl.ds(slot, 1)] = jnp.concatenate(
                    [lp_new, accept.astype(jnp.float32), acc_new, log_step[0:1, :],
                     jnp.zeros((4, block_b), jnp.float32)], axis=0
                )[None, :, :]
                pltpu.make_async_copy(
                    stageb_ref.at[slot], outb_ref.at[idx, pl.ds(pid * block_b, block_b), :],
                    sems.at[slot, 0],
                ).start()
                pltpu.make_async_copy(
                    stages_ref.at[slot], outs_ref.at[idx, :, pl.ds(pid * block_b, block_b)],
                    sems.at[slot, 1],
                ).start()

            return w_new, lp_new, acc_new, log_step

        # the adapting kernel carries log_step at full (p_pad, block_b) shape
        # (see iteration); non-adapt carries a single dead row for the store
        ls_rows = p_pad if adapt else 1
        if warm:
            # per-chain warm start (resume): rows [w (p_pad) | log_step | acc]
            w0 = init_ref[0:p_pad, :] * mask
            ls0 = init_ref[p_pad : p_pad + 1, :] * jnp.ones((ls_rows, 1), jnp.float32)
            acc0 = init_ref[p_pad + 1 : p_pad + 2, :]
        else:
            w0 = jnp.broadcast_to(w0_ref[:, :], (p_pad, block_b)) * mask
            ls0 = jnp.full((ls_rows, block_b), np.log(step), jnp.float32)
            acc0 = jnp.zeros((1, block_b), jnp.float32)
        carry0 = (w0, log_target(w0), acc0, ls0)
        lax.fori_loop(0, n_burn + n_keep * n_thin, iteration, carry0)

        for last in range(max(0, n_keep - 2), n_keep):
            slot = last % 2
            pltpu.make_async_copy(
                stageb_ref.at[slot], outb_ref.at[last, pl.ds(pid * block_b, block_b), :],
                sems.at[slot, 0],
            ).wait()
            pltpu.make_async_copy(
                stages_ref.at[slot], outs_ref.at[last, :, pl.ds(pid * block_b, block_b)],
                sems.at[slot, 1],
            ).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "n_burn", "n_iter", "n_chains", "n_thin", "step", "n_obs", "p_real",
    "adapt_step", "target_accept", "adapt_rate",
))
def _run_spectral_mmala_jit(seed, V, dvec, vw, w0, yPy, logdet_tauP, logdet_lamPlam,
                            half_logdetA, n_burn, n_iter, n_chains, step, n_obs, p_real,
                            adapt_step=False, target_accept=0.574, adapt_rate=0.05,
                            init=None, n_thin=1):
    p128, p_pad = V.shape
    block_b = _block_b(p_pad)
    b_total = n_chains + ((-n_chains) % block_b)
    mask = (jnp.arange(p_pad) < p_real).astype(jnp.float32).reshape(p_pad, 1)
    kernel = _make_mmala_kernel(
        p_pad, float(p_real), float(n_obs), float(step), n_burn, n_iter, block_b,
        adapt=bool(adapt_step), target=float(target_accept), rate=float(adapt_rate),
        warm=init is not None, n_thin=n_thin,
    )
    shared = pl.BlockSpec(memory_space=pltpu.VMEM)
    scal = jnp.stack([yPy, logdet_tauP, logdet_lamPlam, half_logdetA]).astype(jnp.float32)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + [shared] * 5
    args = [jnp.asarray([seed], jnp.int32), scal, V, dvec, vw, w0, mask]
    if init is not None:
        # rows [w (p_pad) | log_step | acc]; w is precomputed by the caller
        # (w = V' diag(plam) beta happens host-side in run_spectral_mmala)
        rows_in = jnp.concatenate([
            jnp.asarray(init["w"], jnp.float32).reshape(n_chains, p_pad).T,
            jnp.asarray(init.get("log_step", jnp.full((n_chains,), np.log(step))),
                        jnp.float32).reshape(1, n_chains),
            jnp.asarray(init.get("acc", jnp.zeros((n_chains,))), jnp.float32).reshape(1, n_chains),
        ], axis=0)
        rows_in = jnp.pad(rows_in, ((0, 0), (0, b_total - n_chains)))
        in_specs.append(pl.BlockSpec((p_pad + 2, block_b), lambda i: (0, i)))
        args.append(rows_in)
    out_b, out_s = pl.pallas_call(
        kernel,
        grid=(b_total // block_b,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),) * 2,
        out_shape=(
            jax.ShapeDtypeStruct((n_iter, b_total, p128), jnp.float32),
            jax.ShapeDtypeStruct((n_iter, 8, b_total), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_b, p128), jnp.float32),
            pltpu.VMEM((2, 8, block_b), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*args)
    out_b = out_b if b_total == n_chains else out_b[:, :n_chains, :]
    if p128 != p_real:
        out_b = out_b[:, :, :p_real]
    beta = jnp.transpose(out_b, (1, 0, 2))  # (chains, iters, p)
    small = jnp.transpose(chain_slice(out_s, n_chains), (2, 0, 1))
    return {
        "beta": beta,
        "log_post": small[:, :, 0],
        "accept": small[:, :, 1],
        "accept_total": small[:, -1, 2],
        "log_step": small[:, -1, 3],
    }


def run_spectral_mmala(
    seed, X, y, n_burn, n_iter, n_chains,
    tau=1.0, lam=1.0, step=1.0, ptau_diag=None, plam_diag=None, mu0=None, beta0=None,
    adapt_step=False, target_accept=0.574, adapt_rate=0.05, init=None, n_thin=1,
):
    """Constant-metric manifold MALA, whole run in one launch, p <= 256.

    Same model/returns as fused.mmala.run_fused_mmala; the Fisher metric
    A = tau G + lam diag(plam) is diagonalized once on the host, making every
    proposal/accept elementwise in eigencoordinates. ``adapt_step`` runs the
    generic driver's burn-in Robbins-Monro on a per-chain log-step (the final
    value is returned as ``log_step``); ``init`` warm-starts per chain from
    {"beta" (nc, p), "log_step" (nc,), "acc" (nc,)} -- beta is rotated to
    eigencoordinates host-side (w = V' diag(plam) beta)."""
    X = np.asarray(X, np.float64)
    y = np.asarray(y, np.float64).reshape(-1)
    n_obs, p = X.shape
    if p > MAX_P:
        raise ValueError(f"spectral mMALA supports p <= {MAX_P}, got {p}")
    ptau = np.ones(n_obs) if ptau_diag is None else np.asarray(ptau_diag, np.float64).reshape(-1)
    plam = np.ones(p) if plam_diag is None else np.asarray(plam_diag, np.float64).reshape(-1)
    mu0 = np.zeros(p) if mu0 is None else np.asarray(mu0, np.float64).reshape(-1)
    beta0 = np.zeros(p) if beta0 is None else np.asarray(beta0, np.float64).reshape(-1)

    XtP = X.T * ptau[None, :]
    G = XtP @ X
    V, s = _eigenbasis(G, plam)
    d = tau * s + lam  # metric eigenvalues (A = V^{-T} diag(d) V^{-1})
    v = tau * (XtP @ y) + lam * plam * mu0
    vw = V.T @ v
    w0 = V.T @ (plam * beta0)  # V^{-1} beta0
    yPy = tau * np.sum(y * ptau * y) + lam * np.sum(mu0 * plam * mu0)
    logdet_tauP = n_obs * np.log(tau) + np.sum(np.log(ptau))
    logdet_lamPlam = p * np.log(lam) + np.sum(np.log(plam))
    half_logdetA = 0.5 * np.sum(np.log(d))

    p_pad = p + ((-p) % PAD)
    pad = p_pad - p

    def col(vv, fill=0.0):
        return jnp.asarray(np.concatenate([vv, np.full(pad, fill)]), jnp.float32).reshape(p_pad, 1)

    # field rows padded to the 128-lane tiling of the (iter, chains, field) out
    p128 = p + ((-p) % 128)
    Vp = np.zeros((p128, p_pad))
    Vp[:p, :p] = V
    if init is not None:
        # rotate the per-chain warm state to padded eigencoordinates host-side
        beta_in = np.asarray(init["beta"], np.float64).reshape(n_chains, p)
        w_in = beta_in @ (plam[:, None] * V)  # (nc, p): V' diag(plam) beta per chain
        init = {k: init[k] for k in ("log_step", "acc") if k in init}
        init["w"] = np.pad(w_in, ((0, 0), (0, pad))).astype(np.float32)
    return _run_spectral_mmala_jit(
        seed, jnp.asarray(Vp, jnp.float32), col(d, fill=1.0), col(vw), col(w0),
        jnp.asarray(yPy, jnp.float32), jnp.asarray(logdet_tauP, jnp.float32),
        jnp.asarray(logdet_lamPlam, jnp.float32), jnp.asarray(half_logdetA, jnp.float32),
        n_burn=n_burn, n_iter=n_iter, n_chains=n_chains, step=float(step),
        n_obs=n_obs, p_real=p, adapt_step=bool(adapt_step),
        target_accept=float(target_accept), adapt_rate=float(adapt_rate), init=init,
        n_thin=int(n_thin),
    )
