"""Fully-fused GMRF smoother engine: the whole MCMC run in one Pallas launch.

The flagship workload (reference examples/4_GMRF_smoother.ipynb) is a three-sampler
Gibbs sweep:

    b   | y, lam, tau  ~  N(Q^{-1} tau y, Q^{-1}),  Q = lam P0 + tau I   (NormalNormal)
    lam | b            ~  Gamma(a_lam + p/2, b_lam + b' P0 b / 2)        (NormalGamma)
    tau | b, y         ~  Gamma(a_tau + p/2, b_tau + ||y - b||^2 / 2)    (NormalGamma)

Run through the generic driver, every iteration pays XLA op scheduling plus one Pallas
launch (~200 us fixed). This engine fuses ALL burn+sample iterations of the whole
sweep into a single kernel: Thomas factorization + solves, Box-Muller noise and
Marsaglia-Tsang Gamma draws from the on-chip PRNG, the analytic log-posterior
(log|P0| precomputed, the scale enters as p log lam), and double-buffered async DMA of
each stored iteration to HBM.

This is the "fused attention" pattern applied to a sampler: a model-family-specific
engine behind the same result interface, validated against the generic driver.
Chains ride the lane axis (BLOCK_B per grid program); hyperparameters are static.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmcmc_tpu.fused.prng import LOG_2PI as _LOG_2PI
from openmcmc_tpu.fused.layout import chain_slice, store_index as _store_index
from openmcmc_tpu.fused.prng import gamma_mt as _gamma_mt
from openmcmc_tpu.fused.prng import normal_icdf as _normal
from openmcmc_tpu.fused.prng import truncnorm_draw as _truncnorm_draw
from openmcmc_tpu.fused.prng import begin_iteration as _begin_iteration, seed_bits as _seed_bits
from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st

BLOCK_B = 2048  # lane-block at the benchmark p; halved as p grows so the
# O(p * block) scratch + double-buffered stage stay inside scoped VMEM


def _block_b(p_pad: int) -> int:
    if p_pad <= 256:
        return 2048
    if p_pad <= 512:
        return 1024
    if p_pad <= 1024:
        return 512
    return 256
CHUNK = 8


def _make_kernel(p_pad, p_real, n_burn, n_keep, a_lam, b_lam, a_tau, b_tau, lam0, tau0, block_b,
                 warm=False, truncated=False, n_thin=1):
    n_chunks = p_pad // CHUNK
    half_p = 0.5 * p_real
    a_lam_star = a_lam + half_p
    a_tau_star = a_tau + half_p
    # static log-Gamma normalizers for the log-posterior
    from scipy.special import gammaln

    lgam_lam = float(a_lam * np.log(b_lam) - gammaln(a_lam))
    lgam_tau = float(a_tau * np.log(b_tau) - gammaln(a_tau))

    def kernel(seed_ref, logdet_ref, p0d_ref, p0c_ref, p0cprev_ref, y_ref, mask_ref, d_ref, mu_ref,
               p0mu_ref, *refs):
        refs = list(refs)
        if truncated:
            lo_ref = refs.pop(0)
            hi_ref = refs.pop(0)
            bi_ref = refs.pop(0)
        if warm:
            (init_ref, out_b_ref, out_s_ref, ld_ref, u_ref, x_ref,
             stage_ref, small_ref, sems, small_sems) = refs
        else:
            (out_b_ref, out_s_ref, ld_ref, u_ref, x_ref,
             stage_ref, small_ref, sems, small_sems) = refs
        pid = pl.program_id(0)
        _seed_bits(seed_ref[0] + pid)
        ones_row = jnp.ones((1, block_b), jnp.float32)
        zeros_row = jnp.zeros((1, block_b), jnp.float32)

        p0d = p0d_ref[:, :]  # (p_pad, 1)
        p0c = p0c_ref[:, :]
        yv = y_ref[:, :]
        mask = mask_ref[:, :]
        dv = d_ref[:, :]  # noise penalty diagonal D (general, not just I)
        muv = mu_ref[:, :]  # prior mean mu0

        def p0_matvec(b):
            up = jnp.concatenate([b[1:, :], jnp.zeros((1, block_b), jnp.float32)], axis=0)
            down = jnp.concatenate([jnp.zeros((1, block_b), jnp.float32), (p0c * b)[:-1, :]], axis=0)
            return p0d * b + p0c * up + down

        if truncated:
            lov = lo_ref[:, :]
            hiv = hi_ref[:, :]
            # carried latent: the chromatic Gibbs sweep conditions on the
            # CURRENT b, unlike the untruncated exact redraw
            if warm:
                x_ref[:, :] = init_ref[2:, :]
            else:
                x_ref[:, :] = jnp.broadcast_to(bi_ref[:, :] * mask, (p_pad, block_b))
            row_idx = lax.broadcasted_iota(jnp.int32, (p_pad, 1), 0)
            even_rows = (lax.rem(row_idx, 2) == 0)
        else:
            x_ref[:, :] = jnp.broadcast_to(yv * mask, (p_pad, block_b))  # init latent field at the data

        def iteration(it, carry):

            _begin_iteration(it)
            lam, tau = carry  # (1, block_b) each

            if truncated:
                # ---- truncated NormalNormal: ONE chromatic (red-black) Gibbs
                # sweep of the box-truncated canonical Gaussian, exactly the
                # generic driver's banded schedule (linalg/gmrf.py
                # _gibbs_truncated_red_black; reference gmrf.py:201-266
                # semantics). Tridiagonal Q has 2 colors; each color class is
                # conditionally independent given the other, so a class updates
                # in one vectorized (p, B) truncated draw.
                qd = lam * p0d + tau * dv * mask + (1.0 - mask)
                rhs = (tau * (dv * yv) + lam * p0mu_ref[:, :]) * mask
                sd = lax.rsqrt(qd)
                x = x_ref[:, :]
                for want_even in (True, False):
                    up = jnp.concatenate([x[1:, :], jnp.zeros((1, block_b), jnp.float32)], axis=0)
                    down = jnp.concatenate(
                        [jnp.zeros((1, block_b), jnp.float32), (p0c * x)[:-1, :]], axis=0
                    )
                    cond = (rhs - lam * (p0c * up + down)) / qd
                    z = _truncnorm_draw(cond, sd, lov, hiv, (p_pad, block_b))
                    sel = jnp.logical_and(even_rows if want_even else jnp.logical_not(even_rows), mask > 0)
                    x = jnp.where(sel, z, x)
                x_ref[:, :] = x
                b_draw = x * mask
                return _finish_iteration(it, lam, tau, b_draw)

            # ---- NormalNormal: draw b | y, lam, tau -------------------------
            # Q = lam P0 + tau D (identity rows on the padding), canonical mean
            # rhs = tau D y + lam P0 mu0; chunk rows are assembled from the
            # constant input refs (Mosaic cannot dynamically slice computed
            # values, only refs)
            u_ref[:, :] = _normal((p_pad, block_b))

            def fwd(ci, carry_f):
                ld_prev, w_prev = carry_f
                base = ci * CHUNK
                p0d_ch = p0d_ref[pl.ds(base, CHUNK), :]
                p0cp_ch = p0cprev_ref[pl.ds(base, CHUNK), :]
                y_ch = y_ref[pl.ds(base, CHUNK), :]
                m_ch = mask_ref[pl.ds(base, CHUNK), :]
                d_ch = d_ref[pl.ds(base, CHUNK), :]
                p0mu_ch = p0mu_ref[pl.ds(base, CHUNK), :]
                a_ch = lam * p0d_ch + tau * d_ch * m_ch + (1.0 - m_ch)
                cp_ch = lam * p0cp_ch
                b_ch = (tau * (d_ch * y_ch) + lam * p0mu_ch) * m_ch
                z_ch = u_ref[pl.ds(base, CHUNK), :]
                ld_rows, u_rows = [], []
                for k in range(CHUNK):
                    l_prev = cp_ch[k : k + 1, :] / ld_prev
                    ld = jnp.sqrt(a_ch[k : k + 1, :] - l_prev * l_prev)
                    w = (b_ch[k : k + 1, :] - l_prev * w_prev) / ld
                    ld_rows.append(ld)
                    u_rows.append(w + z_ch[k : k + 1, :])
                    ld_prev, w_prev = ld, w
                ld_ref[pl.ds(base, CHUNK), :] = jnp.concatenate(ld_rows, axis=0)
                u_ref[pl.ds(base, CHUNK), :] = jnp.concatenate(u_rows, axis=0)
                return ld_prev, w_prev

            lax.fori_loop(0, n_chunks, fwd, (ones_row, zeros_row))

            def bwd(cj, x_next):
                base = (n_chunks - 1 - cj) * CHUNK
                ld_ch = ld_ref[pl.ds(base, CHUNK), :]
                c_ch = lam * p0c_ref[pl.ds(base, CHUNK), :]
                u_ch = u_ref[pl.ds(base, CHUNK), :]
                x_rows = [None] * CHUNK
                for k in reversed(range(CHUNK)):
                    ld = ld_ch[k : k + 1, :]
                    x_next = (u_ch[k : k + 1, :] - (c_ch[k : k + 1, :] / ld) * x_next) / ld
                    x_rows[k] = x_next
                x_ref[pl.ds(base, CHUNK), :] = jnp.concatenate(x_rows, axis=0)
                return x_next

            lax.fori_loop(0, n_chunks, bwd, zeros_row)
            b_draw = x_ref[:, :] * mask
            return _finish_iteration(it, lam, tau, b_draw)

        def _finish_iteration(it, lam, tau, b_draw):
            # ---- NormalGamma: lam | b --------------------------------------
            r_prior = (b_draw - muv) * mask
            quad_lam = jnp.sum(r_prior * p0_matvec(r_prior), axis=0, keepdims=True)
            lam_new = _gamma_mt(a_lam_star, b_lam + 0.5 * quad_lam)

            # ---- NormalGamma: tau | b, y -----------------------------------
            resid = (yv - b_draw) * mask
            quad_tau = jnp.sum(dv * resid * resid, axis=0, keepdims=True)
            tau_new = _gamma_mt(a_tau_star, b_tau + 0.5 * quad_tau)

            # ---- analytic log posterior ------------------------------------
            log_like = 0.5 * (
                p_real * jnp.log(tau_new) + logdet_ref[1] - p_real * _LOG_2PI - tau_new * quad_tau
            )
            log_prior_b = 0.5 * (p_real * jnp.log(lam_new) + logdet_ref[0] - p_real * _LOG_2PI - lam_new * quad_lam)
            log_lam = lgam_lam + (a_lam - 1.0) * jnp.log(lam_new) - b_lam * lam_new
            log_tau = lgam_tau + (a_tau - 1.0) * jnp.log(tau_new) - b_tau * tau_new
            log_post = log_like + log_prior_b + log_lam + log_tau

            # ---- store (double-buffered DMA to HBM) ------------------------
            idx = _store_index(it, n_burn, n_thin)

            @pl.when(idx >= 0)
            def _():
                slot = lax.rem(idx, 2)

                @pl.when(idx >= 2)
                def _():
                    pltpu.make_async_copy(
                        stage_ref.at[slot], out_b_ref.at[idx - 2, :, pl.ds(pid * block_b, block_b)], sems.at[slot]
                    ).wait()
                    pltpu.make_async_copy(
                        small_ref.at[slot], out_s_ref.at[idx - 2, :, pl.ds(pid * block_b, block_b)],
                        small_sems.at[slot],
                    ).wait()

                stage_ref[pl.ds(slot, 1)] = b_draw[None, :, :]
                small_ref[pl.ds(slot, 1)] = jnp.concatenate(
                    [lam_new, tau_new, log_post, jnp.zeros((5, block_b), jnp.float32)], axis=0
                )[None, :, :]
                pltpu.make_async_copy(
                    stage_ref.at[slot], out_b_ref.at[idx, :, pl.ds(pid * block_b, block_b)], sems.at[slot]
                ).start()
                pltpu.make_async_copy(
                    small_ref.at[slot], out_s_ref.at[idx, :, pl.ds(pid * block_b, block_b)], small_sems.at[slot]
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

        # drain the (up to two) in-flight copies; n_keep is static
        for last in range(max(0, n_keep - 2), n_keep):
            slot = last % 2
            pltpu.make_async_copy(
                stage_ref.at[slot], out_b_ref.at[last, :, pl.ds(pid * block_b, block_b)], sems.at[slot]
            ).wait()
            pltpu.make_async_copy(
                small_ref.at[slot], out_s_ref.at[last, :, pl.ds(pid * block_b, block_b)], small_sems.at[slot]
            ).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_burn", "n_iter", "n_chains", "n_thin", "a_lam", "b_lam", "a_tau", "b_tau", "lam0", "tau0"),
)
def run_fused_smoother(
    seed: int,
    y: jnp.ndarray,
    s: jnp.ndarray,
    n_burn: int,
    n_iter: int,
    n_chains: int,
    a_lam: float = 10.0,
    b_lam: float = 1.0,
    a_tau: float = 1.0,
    b_tau: float = 1.0,
    lam0: float = 100.0,
    tau0: float = 1.0,
    ridge: float = 0.001,
    P0_bands: Optional[jnp.ndarray] = None,
    noise_diag: Optional[jnp.ndarray] = None,
    mu0: Optional[jnp.ndarray] = None,
    n_thin: int = 1,
    lower: Optional[jnp.ndarray] = None,
    upper: Optional[jnp.ndarray] = None,
    b_init: Optional[jnp.ndarray] = None,
    init=None,
):
    """Run the full GMRF smoother MCMC in one fused kernel.

    y: (p,) observations at locations s: (p,). Returns dict with
    b: (n_chains, n_iter, p), lam/tau/log_post: (n_chains, n_iter).
    Matches the generic-driver model exactly: Q = lam * P0 + tau * D with
    P0 = P_rw1 + ridge e0 e0' (or ``P0_bands`` (2, p) supplied directly),
    D = diag(``noise_diag``) an arbitrary positive noise penalty (default I),
    and prior mean ``mu0`` (default 0) -- the general smoother family, not just
    the identity-penalty / zero-mean benchmark shape.

    ``lower``/``upper`` (scalars or (p,) vectors; +-1e30 for an open side) box-
    truncate the latent prior: the exact Thomas redraw is replaced by ONE
    chromatic red-black truncated Gibbs sweep per iteration over the carried b
    (the generic driver's banded schedule, linalg/gmrf.py
    _gibbs_truncated_red_black; reference gmrf.py:201-266), with the
    reference's UNrenormalized truncation semantics so the Gamma conditionals
    and the stored log-posterior keep their untruncated forms (reference
    location_scale.py:148-151). ``b_init`` warm-starts the carried latent
    (default: y clipped into the box).
    """
    y = jnp.asarray(y, jnp.float32).reshape(-1)
    p_real = y.shape[0]
    if P0_bands is not None:
        P0 = st.Banded(jnp.asarray(P0_bands, jnp.float32))
    else:
        P0 = gmrf.precision_irregular(jnp.asarray(s, jnp.float32))
        P0 = st.Banded(P0.bands.at[0, 0].add(ridge))
    d_vec = jnp.ones((p_real,), jnp.float32) if noise_diag is None else jnp.asarray(noise_diag, jnp.float32).reshape(-1)
    mu_vec = jnp.zeros((p_real,), jnp.float32) if mu0 is None else jnp.asarray(mu0, jnp.float32).reshape(-1)
    logdet_p0 = 2.0 * jnp.sum(jnp.log(st.diag(st.cholesky(P0))))
    logdet_d = jnp.sum(jnp.log(d_vec))
    logdets = jnp.stack([logdet_p0, logdet_d]).astype(jnp.float32)
    p0mu = st.matvec(P0, mu_vec.reshape(-1, 1)).reshape(-1)

    p_pad = p_real + ((-p_real) % CHUNK)
    pad = p_pad - p_real

    def _pad_col(v):
        return jnp.concatenate([v.astype(jnp.float32), jnp.zeros((pad,), jnp.float32)]).reshape(p_pad, 1)

    p0d = _pad_col(P0.bands[0])
    p0c = _pad_col(P0.bands[1])
    p0cprev = jnp.concatenate([jnp.zeros((1, 1), jnp.float32), p0c[:-1]], axis=0)
    yv = _pad_col(y)
    mask = _pad_col(jnp.ones((p_real,), jnp.float32))
    dv = _pad_col(d_vec)
    muv = _pad_col(mu_vec)
    p0muv = _pad_col(p0mu)

    truncated = lower is not None or upper is not None
    block_b = _block_b(p_pad)
    b_total = n_chains + ((-n_chains) % block_b)
    kernel = _make_kernel(
        p_pad, float(p_real), n_burn, n_iter, float(a_lam), float(b_lam), float(a_tau), float(b_tau),
        float(lam0), float(tau0), block_b, warm=init is not None, truncated=truncated,
        n_thin=n_thin,
    )
    shared = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + [shared] * 8
    args = [jnp.asarray([seed], jnp.int32), logdets, p0d, p0c, p0cprev, yv, mask, dv, muv, p0muv]
    if truncated:
        def _bound(v, default):
            if v is None:
                v = default
            return jnp.broadcast_to(jnp.asarray(v, jnp.float32).reshape(-1), (p_real,))

        lov = _bound(lower, -1e30)
        hiv = _bound(upper, 1e30)
        bi = jnp.clip(y, lov, hiv) if b_init is None else jnp.clip(
            jnp.asarray(b_init, jnp.float32).reshape(-1), lov, hiv
        )
        # padding rows keep an open box (they are never selected anyway)
        args += [
            jnp.concatenate([lov, jnp.full((pad,), -1e30, jnp.float32)]).reshape(p_pad, 1),
            jnp.concatenate([hiv, jnp.full((pad,), 1e30, jnp.float32)]).reshape(p_pad, 1),
            _pad_col(bi),
        ]
        in_specs += [shared] * 3
    if init is not None:
        rows = [
            jnp.asarray(init["lam"], jnp.float32).reshape(1, -1),
            jnp.asarray(init["tau"], jnp.float32).reshape(1, -1),
        ]
        if truncated:
            # carried latent: resume needs the final b draws (p_pad rows)
            b_rows = jnp.asarray(init["b"], jnp.float32).reshape(n_chains, p_real).T
            rows.append(jnp.pad(b_rows, ((0, p_pad - p_real), (0, 0))))
        rows_in = jnp.concatenate(rows, axis=0)
        rows_in = jnp.pad(rows_in, ((0, 0), (0, b_total - n_chains)))
        n_init_rows = rows_in.shape[0]
        in_specs.append(pl.BlockSpec((n_init_rows, block_b), lambda i: (0, i)))
        args.append(rows_in)
    out_b, out_s = pl.pallas_call(
        kernel,
        grid=(b_total // block_b,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_iter, p_pad, b_total), jnp.float32),
            jax.ShapeDtypeStruct((n_iter, 8, b_total), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((p_pad, block_b), jnp.float32),  # ld
            pltpu.VMEM((p_pad, block_b), jnp.float32),  # u / z
            pltpu.VMEM((p_pad, block_b), jnp.float32),  # x
            pltpu.VMEM((2, p_pad, block_b), jnp.float32),  # stage (double buffer)
            pltpu.VMEM((2, 8, block_b), jnp.float32),  # small stage
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # p >= 512 at block 1024 carries ~16 MB of live scan state +
            # double-buffered stage; the 16 MB default scoped-vmem limit is
            # conservative, v5e has 128 MB
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(*args)

    # elide the middle-axis slice when p is already a multiple of the chunk:
    # XLA materializes out[..., :n, :] as a full copy even when n == shape[1]
    out_b = out_b if p_real == out_b.shape[1] else out_b[:, :p_real, :]
    b_draws = jnp.transpose(chain_slice(out_b, n_chains), (2, 0, 1))  # (chains, iters, p)
    small = jnp.transpose(chain_slice(out_s, n_chains), (2, 0, 1))  # (chains, iters, 8)
    return {
        "b": b_draws,
        "lam": small[:, :, 0],
        "tau": small[:, :, 1],
        "log_post": small[:, :, 2],
    }
