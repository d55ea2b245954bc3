"""Fully-fused reversible-jump engine: the whole trans-dimensional run in one launch.

Fifth fused family, covering the reference's flagship RJ workload (the knot-basis
regression of tests/test_reversible_jump.py driven by reference mcmc.py:87, with a
Null likelihood -- the prior-recovery configuration that is also the benchmark):

    k        ~ Poisson(rho)            (number of active knots, 1..n_max)
    theta_j  ~ U(lo, hi)               (knot locations,  j < k)
    omega_j  ~ Gamma(a_om, b_om)       (kernel widths,   j < k)
    beta     ~ N(mu_b, tau_b^{-1} I_k) (coefficients)
    y        ~ Null                    (basis B[:, j] = normpdf(X; theta_j, omega_j))

per-sweep samplers (matching bench_all.reversible_jump / the generic driver):
    1. manifold MALA on beta   (constant diagonal metric tau_b/step^2, masked)
    2. vectorized per-column truncated RW on theta (uniform target)
    3. vectorized per-column truncated RW on omega (Gamma target)
    4. birth/death RJ with prediction-matched coefficient transitions

Why one kernel wins: profiled on TPU, the generic RJ sweep is dominated (87%) by
the matched-transition linear algebra on padded (chains, 20, 20) temporaries --
every factorization step round-trips multi-MB arrays through HBM. Here the
ENTIRE run executes in VMEM with chains on lanes and n_max-sized matrices held
as lists of (n_max, lanes) columns.

Key algebraic identity (derived for this kernel; also simplifies the generic
sampler): because the padded bases before/after a move share all columns except
the born/deleted one, the matched-transition matrices are RANK-ONE diagonal
modifications of the Gram matrices,

    C_birth = S_birth - eps P_k         (P_k = diag over the first k entries)
            = B*'B* + eps e_k e_k' + I_inactive        (symmetric PSD!)
    C_death = S_death + eps (e_j e_j' - P_k)
            = B'B + eps e_j e_j' + I_inactive          (symmetric PSD!)

so log|det F| = log det C - log det S and the death solve mu_aug = C^{-1} S beta
need only CHOLESKY factorizations -- no pivoted LU anywhere -- and each C is a
2-op modification of the Gram already in registers. One basis Gram (210 pair
dots) per sweep is reused for S_birth (plus one new-column row), S_death, and
both C matrices. PRNG is the on-chip generator (fused/prng.py).

Numerical notes: the C matrices are exactly singular in degenerate
duplicate-knot configurations; the Cholesky clamps pivots at 1e-30, giving the
same strongly-negative log|det F| behavior as the generic pivoted LU up to f32
conditioning. Truncated-normal log-masses use the erf difference (clamped at
1e-30) instead of log_ndtr tail expansions; at this family's proposal scales the
bounds are O(10-100) sigma so the difference is below f32 resolution.

Cited reference behavior: reversible_jump.py:24-373 (moves, matched transitions,
edge-case move probabilities), metropolis_hastings.py:176-289.
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
    gamma_mt,
    normal_icdf,
    uniform,
    erf_poly as _erf,
    truncnorm_draw as _truncnorm_draw,
    truncnorm_logpdf as _truncnorm_logpdf,
)
from openmcmc_tpu.fused.layout import chain_slice, store_index as _store_index

BLOCK_B = 1024
OUT_ROWS = 8  # [k, log_post, acc_mmala, acc_theta, acc_omega, acc_rj, prop_cols_theta, prop_cols_omega]
# streaming mode appends rows(beta) + rows(theta) + rows(omega): OUT_ROWS + 3p total

_SQRT2 = 1.4142135623730951
_INV_SQRT2 = 0.7071067811865476
_SQRT_2PI = 2.5066282746310002
_RIDGE = 1e-6


def _make_kernel(p, n_data, n_burn, n_keep, cfg, n_rows, stream, warm=False, n_thin=1):
    # n_rows is the PADDED output-row count (multiple of 8: DMA slices of the
    # stage/out memrefs must be tile-aligned on the sublane dim); rows beyond
    # the logical set are zero filler
    rho = cfg["rho"]
    mu_b = cfg["mu_beta"]
    tau_b = cfg["tau_beta"]
    a_om = cfg["a_omega"]
    b_om = cfg["b_omega"]
    th_lo, th_hi = cfg["theta_limits"]
    om_lo, om_hi = cfg["omega_rw_limits"]
    m_lo, m_hi = cfg["match_limits"]
    m_scale = cfg["match_scale"]
    s_mmala = cfg["step_mmala"]
    s_theta = cfg["step_theta"]
    s_omega = cfg["step_omega"]
    # likelihood mode (the reference's matched-transition REGRESSION use case,
    # reference tests/test_reversible_jump.py model): y ~ N(B beta, (tau I)^-1)
    # with a conjugate Gamma(tau) update appended to the sweep. Null mode keeps
    # every original code path bit-identical.
    lik = bool(cfg.get("likelihood", False))
    a_tau = cfg.get("a_tau", 1.0)
    b_tau = cfg.get("b_tau", 1.0)
    tau0 = cfg.get("tau0", 1.0)
    from scipy.special import gammaln

    lgam_om = float(a_om * np.log(b_om) - gammaln(a_om))
    log_rho = float(np.log(rho))
    log_range_th = float(np.log(th_hi - th_lo))
    log_tau_term = float(0.5 * (np.log(tau_b) - LOG_2PI))
    log_ints = [float(np.log(i)) for i in range(1, p + 1)]
    half_n = 0.5 * float(n_data)
    a_tau_star = a_tau + half_n
    lgam_tau = float(a_tau * np.log(b_tau) - gammaln(a_tau)) if lik else 0.0
    s2_mmala = s_mmala * s_mmala

    def kernel(seed_ref, x_ref, *refs):
        if warm:
            init_ref, out_ref, stage_ref, sems = refs
        else:
            out_ref, stage_ref, sems = refs
        pid = pl.program_id(0)
        _seed_bits(seed_ref[0] + pid)
        B = BLOCK_B
        # (p, 1) index constants built in-kernel (Pallas forbids captured arrays;
        # tpu.iota is integer-only, so cast after)
        iota_c = lax.broadcasted_iota(jnp.int32, (p, 1), 0).astype(jnp.float32)
        units = [(iota_c == float(j)).astype(jnp.float32) for j in range(p)]
        zeros = jnp.zeros((1, B), jnp.float32)
        ones = jnp.ones((1, B), jnp.float32)
        Xc = x_ref[0:n_data, :]  # (n_data, 1)
        Yc = x_ref[n_data : 2 * n_data, :] if lik else None  # (n_data, 1) data column
        off = 2 * n_data if lik else n_data  # packed offset of the initial values

        def rows(arr):
            return [arr[i : i + 1, :] for i in range(p)]

        def sel_lt(i, kv):
            return (jnp.full((1, B), float(i)) < kv).astype(jnp.float32)

        def sel_eq(i, kv):
            return (jnp.full((1, B), float(i)) == kv).astype(jnp.float32)

        def basis_col(th, om, active):
            om_safe = jnp.where(om > 0.0, om, 1.0)
            z = (Xc - th) / om_safe  # (n_data, B)
            return jnp.exp(-0.5 * z * z) / (om_safe * _SQRT_2PI) * active

        def log_fact(kf):
            total = zeros
            for i in range(2, p + 1):
                total = total + log_ints[i - 1] * (jnp.full((1, B), float(i)) <= kf).astype(jnp.float32)
            return total

        def model_log_p(kf, beta, theta, omega, m_arr):
            """Full joint log density (Null likelihood contributes zero);
            beta/theta/omega are (p, B) arrays, m_arr the (p, B) active mask."""
            lp = kf * log_rho - rho - log_fact(kf) - kf * log_range_th
            r = beta - mu_b
            om_safe = jnp.where(m_arr > 0.0, omega, 1.0)
            terms = (
                log_tau_term
                - 0.5 * tau_b * r * r
                + (a_om - 1.0) * jnp.log(om_safe)
                - b_om * om_safe
                + lgam_om
            )
            return lp + jnp.sum(m_arr * terms, axis=0, keepdims=True)

        def chol_cols(S_cols):
            """Left-looking Cholesky on column lists; returns (L_cols, logdet)."""
            L = []
            logdet = zeros
            masks_ge = [(iota_c >= float(j)).astype(jnp.float32) for j in range(p)]
            for j in range(p):
                col = S_cols[j]
                for m_i in range(j):
                    col = col - L[m_i] * L[m_i][j : j + 1, :]
                d = jnp.sqrt(jnp.maximum(col[j : j + 1, :], 1e-30))
                logdet = logdet + 2.0 * jnp.log(d)
                L.append(col / d * masks_ge[j])
            return L, logdet

        def chol_solve_1rhs(L, r):
            """A x = r given the column Cholesky of A; r is (p, B)."""
            w_rows = []
            res = r
            for i in range(p):
                wi = res[i : i + 1, :] / L[i][i : i + 1, :]
                w_rows.append(wi)
                res = res - L[i] * wi
            x_rows = [None] * p
            for i in range(p - 1, -1, -1):
                acc = w_rows[i]
                for m_i in range(i + 1, p):
                    acc = acc - L[i][m_i : m_i + 1, :] * x_rows[m_i]
                x_rows[i] = acc / L[i][i : i + 1, :]
            return jnp.concatenate(x_rows, axis=0)

        def row_at(vec, kf):
            return jnp.sum((iota_c == kf).astype(jnp.float32) * vec, axis=0, keepdims=True)

        def gram_cols(bas):
            """Gram columns of the masked basis: G0cols[j] (p, B), symmetric."""
            G0 = [[None] * p for _ in range(p)]
            for i in range(p):
                for j in range(i, p):
                    dot = jnp.sum(bas[i] * bas[j], axis=0, keepdims=True)
                    G0[i][j] = dot
                    G0[j][i] = dot
            return [jnp.concatenate([G0[i][j] for i in range(p)], axis=0) for j in range(p)]

        def chol_backsolve(L, z):
            """L^T x = z given the column Cholesky; z is (p, B)."""
            x_rows = [None] * p
            for i in range(p - 1, -1, -1):
                acc = z[i : i + 1, :]
                for m_i in range(i + 1, p):
                    acc = acc - L[i][m_i : m_i + 1, :] * x_rows[m_i]
                x_rows[i] = acc / L[i][i : i + 1, :]
            return jnp.concatenate(x_rows, axis=0)

        def iteration(it, carry):
            _begin_iteration(it)
            if lik:
                beta, theta, omega, kf, tau, acc_m, acc_t, acc_o, acc_r, prop_t, prop_o = carry
            else:
                beta, theta, omega, kf, acc_m, acc_t, acc_o, acc_r, prop_t, prop_o = carry
                tau = None
            m_arr = (iota_c < kf).astype(jnp.float32)  # (p, B)
            m_rows = rows(m_arr)
            th_rows = rows(theta)
            om_rows = rows(omega)

            if lik:
                # basis + residual maintained through sections 1-3, rebuilt rows
                # reflect every accepted move (Yc is the (n_data, 1) data column)
                bas = [basis_col(th_rows[i], om_rows[i], m_rows[i]) for i in range(p)]
                beta_rows = rows(beta)
                r = Yc - sum(bas[j] * beta_rows[j] for j in range(p))  # (n_data, B)

            # ==== 1. manifold MALA on beta ====================================
            if lik:
                # full Fisher metric H = tau B'B + tau_b I on the active block
                # (identity on padding), constant in beta -- the generic
                # ManifoldMALA's metric for this model (samplers/metropolis.py)
                Gc = gram_cols(bas)
                g_rows = [
                    (tau * jnp.sum(bas[i] * r, axis=0, keepdims=True) - tau_b * (beta_rows[i] - mu_b))
                    * m_rows[i]
                    for i in range(p)
                ]
                g = jnp.concatenate(g_rows, axis=0)
                H_cols = [
                    tau * Gc[j] * m_arr * m_rows[j]
                    + units[j] * (tau_b * m_rows[j] + (1.0 - m_rows[j]))
                    for j in range(p)
                ]
                L_h, _ = chol_cols(H_cols)
                hg = chol_solve_1rhs(L_h, g)  # H^-1 g
                z = normal_icdf((p, B)) * m_arr
                ltz = chol_backsolve(L_h, z)  # L^-T z ~ N(0, H^-1)
                mu_f = beta + 0.5 * s2_mmala * hg
                beta_prop = jnp.where(m_arr > 0.0, mu_f + s_mmala * ltz, beta)
                delta = beta_prop - beta
                # reverse drift: H^-1 g(beta') = H^-1 (g - H delta) = hg - delta
                d_r = beta - (beta_prop + 0.5 * s2_mmala * (hg - delta))
                d_r_rows = rows(d_r)
                Hdr = sum(H_cols[j] * d_r_rows[j] for j in range(p))
                q_r = jnp.sum(d_r * Hdr, axis=0, keepdims=True)
                # (beta'-mu_f)' H (beta'-mu_f) = s^2 z'z exactly (beta'-mu_f = s L^-T z)
                zz = jnp.sum(z * z, axis=0, keepdims=True)
                logq_diff = (-0.5 / s2_mmala) * q_r + 0.5 * zz
                delta_rows = rows(delta)
                dB = sum(bas[j] * delta_rows[j] for j in range(p))
                d_ll = tau * jnp.sum(r * dB, axis=0, keepdims=True) - 0.5 * tau * jnp.sum(
                    dB * dB, axis=0, keepdims=True
                )
                d_prior = jnp.sum(
                    m_arr * (-0.5 * tau_b * ((beta_prop - mu_b) ** 2 - (beta - mu_b) ** 2)),
                    axis=0,
                    keepdims=True,
                )
                acc = jnp.log(uniform((1, B))) < (d_prior + d_ll + logq_diff)
                beta = jnp.where(acc, beta_prop, beta)
                r = jnp.where(acc, r - dB, r)
                beta_rows = rows(beta)
            else:
                # Null likelihood: the metric is the constant diagonal tau_b/s^2
                z = normal_icdf((p, B))
                drift = 1.0 - 0.5 * s_mmala * s_mmala
                mu_f = drift * beta + (1.0 - drift) * mu_b
                sigma = s_mmala / float(np.sqrt(tau_b))
                beta_prop = jnp.where(m_arr > 0.0, mu_f + sigma * z, beta)
                mu_r = drift * beta_prop + (1.0 - drift) * mu_b
                dlp = jnp.sum(
                    m_arr
                    * (
                        -0.5 * tau_b * ((beta_prop - mu_b) ** 2 - (beta - mu_b) ** 2)
                        - (0.5 * tau_b / (s_mmala * s_mmala))
                        * ((beta - mu_r) ** 2 - (beta_prop - mu_f) ** 2)
                    ),
                    axis=0,
                    keepdims=True,
                )
                acc = jnp.log(uniform((1, B))) < dlp
                beta = jnp.where(acc, beta_prop, beta)
            acc_m = acc_m + acc.astype(jnp.float32)

            if lik:
                # ==== 2/3. SEQUENTIAL truncated RW over columns ===============
                # with a data likelihood the columns interact through the
                # residual, so the one-at-a-time scan of the generic
                # RandomWalkLoop is reproduced exactly (reference
                # metropolis_hastings.py:272-289); each accepted move updates
                # its basis column and the running residual
                for j in range(p):
                    aj = m_rows[j]
                    th_new = _truncnorm_draw(th_rows[j], s_theta, th_lo, th_hi, (1, B))
                    c_new = basis_col(th_new, om_rows[j], aj)
                    dc = (c_new - bas[j]) * beta_rows[j]
                    d_ll = tau * jnp.sum(r * dc, axis=0, keepdims=True) - 0.5 * tau * jnp.sum(
                        dc * dc, axis=0, keepdims=True
                    )
                    corr = _truncnorm_logpdf(th_rows[j], th_new, s_theta, th_lo, th_hi) - _truncnorm_logpdf(
                        th_new, th_rows[j], s_theta, th_lo, th_hi
                    )
                    acc_j = jnp.logical_and(jnp.log(uniform((1, B))) < (d_ll + corr), aj > 0.0)
                    th_rows[j] = jnp.where(acc_j, th_new, th_rows[j])
                    bas[j] = jnp.where(acc_j, c_new, bas[j])
                    r = jnp.where(acc_j, r - dc, r)
                    acc_t = acc_t + acc_j.astype(jnp.float32)
                prop_t = prop_t + kf
                for j in range(p):
                    aj = m_rows[j]
                    om_new = _truncnorm_draw(om_rows[j], s_omega, om_lo, om_hi, (1, B))
                    c_new = basis_col(th_rows[j], om_new, aj)
                    dc = (c_new - bas[j]) * beta_rows[j]
                    om_safe_c = jnp.where(om_rows[j] > 0.0, om_rows[j], 1.0)
                    om_safe_p = jnp.where(om_new > 0.0, om_new, 1.0)
                    dtarget = (a_om - 1.0) * (jnp.log(om_safe_p) - jnp.log(om_safe_c)) - b_om * (
                        om_new - om_rows[j]
                    )
                    d_ll = tau * jnp.sum(r * dc, axis=0, keepdims=True) - 0.5 * tau * jnp.sum(
                        dc * dc, axis=0, keepdims=True
                    )
                    corr = _truncnorm_logpdf(om_rows[j], om_new, s_omega, om_lo, om_hi) - _truncnorm_logpdf(
                        om_new, om_rows[j], s_omega, om_lo, om_hi
                    )
                    acc_j = jnp.logical_and(
                        jnp.log(uniform((1, B))) < (dtarget + d_ll + corr), aj > 0.0
                    )
                    # an exact-0 f32 proposal (om_lo == 0 boxes) would zero the
                    # basis width and NaN the Gram; rejecting the measure-zero
                    # float is statistically free and keeps the lane finite
                    acc_j = jnp.logical_and(acc_j, om_new > 0.0)
                    om_rows[j] = jnp.where(acc_j, om_new, om_rows[j])
                    bas[j] = jnp.where(acc_j, c_new, bas[j])
                    r = jnp.where(acc_j, r - dc, r)
                    acc_o = acc_o + acc_j.astype(jnp.float32)
                prop_o = prop_o + kf
                theta = jnp.concatenate(th_rows, axis=0)
                omega = jnp.concatenate(om_rows, axis=0)
            else:
                # ==== 2. vectorized truncated RW on theta (uniform target) ====
                th_prop = _truncnorm_draw(theta, s_theta, th_lo, th_hi, (p, B))
                lf = _truncnorm_logpdf(th_prop, theta, s_theta, th_lo, th_hi)
                lr = _truncnorm_logpdf(theta, th_prop, s_theta, th_lo, th_hi)
                acc_cols = jnp.logical_and(jnp.log(uniform((p, B))) < (lr - lf), m_arr > 0.0)
                theta = jnp.where(acc_cols, th_prop, theta)
                acc_t = acc_t + jnp.sum(acc_cols.astype(jnp.float32), axis=0, keepdims=True)
                prop_t = prop_t + kf

                # ==== 3. vectorized truncated RW on omega (Gamma target) ======
                om_prop = _truncnorm_draw(omega, s_omega, om_lo, om_hi, (p, B))
                lf = _truncnorm_logpdf(om_prop, omega, s_omega, om_lo, om_hi)
                lr = _truncnorm_logpdf(omega, om_prop, s_omega, om_lo, om_hi)
                om_safe_c = jnp.where(omega > 0.0, omega, 1.0)
                om_safe_p = jnp.where(om_prop > 0.0, om_prop, 1.0)
                dtarget = (a_om - 1.0) * (jnp.log(om_safe_p) - jnp.log(om_safe_c)) - b_om * (om_prop - omega)
                acc_cols = jnp.logical_and(jnp.log(uniform((p, B))) < (dtarget + lr - lf), m_arr > 0.0)
                # mirror the per-row guard: an exact-0 f32 proposal (om_lo == 0
                # boxes) is finite under om_safe_p but would zero a live basis
                # width and feed log(0) into later RJ ratios; reject it
                acc_cols = jnp.logical_and(acc_cols, om_prop > 0.0)
                omega = jnp.where(acc_cols, om_prop, omega)
                acc_o = acc_o + jnp.sum(acc_cols.astype(jnp.float32), axis=0, keepdims=True)
                prop_o = prop_o + kf

            # ==== 4. reversible jump =========================================
            if not lik:
                th_rows = rows(theta)
                om_rows = rows(omega)
                bas = [basis_col(th_rows[i], om_rows[i], m_rows[i]) for i in range(p)]
            # Gram columns: G0cols[j] (p, B), computed once and reused everywhere
            # (likelihood mode: the SECOND Gram of the sweep -- the moves mutated
            # the basis columns after the mMALA metric's Gram)
            G0cols = gram_cols(bas)

            u_move = uniform((1, B))
            birth = jnp.where(kf >= float(p), zeros, jnp.where(kf <= 1.0, ones, (u_move <= 0.5).astype(jnp.float32)))

            # ---- birth branch --------------------------------------------
            th_new = th_lo + (th_hi - th_lo) * uniform((1, B))
            om_new = gamma_mt(a_om, jnp.full((1, B), b_om, jnp.float32))
            new_col = basis_col(th_new, om_new, ones)
            log_new = (
                -log_range_th + (a_om - 1.0) * jnp.log(om_new) - b_om * om_new + lgam_om
            )
            nd_rows = [jnp.sum(new_col * bas[i], axis=0, keepdims=True) for i in range(p)]
            nd_vec = jnp.concatenate(nd_rows, axis=0)  # (p, B)
            nn_dot = jnp.sum(new_col * new_col, axis=0, keepdims=True)

            is_k_row = (iota_c == kf).astype(jnp.float32)  # (p, B)
            m1_arr = (iota_c < (kf + 1.0)).astype(jnp.float32)
            # S_birth columns (k+1 active): Gram of [basis with col k = new_col]
            nd_with_kk = nd_vec * (1.0 - is_k_row) + is_k_row * nn_dot
            S_b = []
            for j in range(p):
                colj = G0cols[j] * (1.0 - is_k_row) + is_k_row * nd_rows[j]  # row k -> new.bas[j]
                is_col_k = sel_eq(j, kf)
                colj = colj * (1.0 - is_col_k) + is_col_k * nd_with_kk  # col k -> new dots
                active_j = sel_lt(j, kf + 1.0)
                colj = colj * m1_arr * active_j
                colj = colj + units[j] * (_RIDGE * active_j + (1.0 - active_j))
                S_b.append(colj)
            L_b, logdet_Sb = chol_cols(S_b)
            # rhs = B*' (B beta); B* row k uses new_col, B col k is zero
            r_data = jnp.zeros((n_data, B), jnp.float32)
            beta_rows = rows(beta)
            for j in range(p):
                r_data = r_data + bas[j] * beta_rows[j]
            rhs_rows = []
            new_dot_r = jnp.sum(new_col * r_data, axis=0, keepdims=True)
            for i in range(p):
                base_dot = jnp.sum(bas[i] * r_data, axis=0, keepdims=True)
                rhs_rows.append(
                    (base_dot * (1.0 - sel_eq(i, kf)) + sel_eq(i, kf) * new_dot_r) * sel_lt(i, kf + 1.0)
                )
            mu_star = chol_solve_1rhs(L_b, jnp.concatenate(rhs_rows, axis=0))
            mu_new = row_at(mu_star, kf)
            draw = _truncnorm_draw(mu_new, m_scale, m_lo, m_hi, (1, B))
            log_draw = _truncnorm_logpdf(draw, mu_new, m_scale, m_lo, m_hi)
            beta_birth = mu_star * m_arr + is_k_row * draw
            # C_birth = S_birth - ridge * P_k  (see module docstring): SPD
            C_b = [S_b[j] - units[j] * (_RIDGE * sel_lt(j, kf)) for j in range(p)]
            _, logdet_Cb = chol_cols(C_b)
            ld_F_birth = logdet_Cb - logdet_Sb

            pb_fwd = jnp.where(kf <= 1.0, ones, 0.5 * ones)
            pd_rev = jnp.where(kf >= float(p - 1), ones, 0.5 * ones)
            birth_fwd = jnp.log(pb_fwd) + log_new + log_draw
            birth_rev = jnp.log(pd_rev) + ld_F_birth

            kf_birth = kf + 1.0
            th_birth = theta * (1.0 - is_k_row) + is_k_row * th_new
            om_birth = omega * (1.0 - is_k_row) + is_k_row * om_new

            # ---- death branch --------------------------------------------
            u_del = uniform((1, B))
            jf = jnp.clip(jnp.floor(u_del * kf), 0.0, jnp.maximum(kf - 1.0, 0.0))
            is_j_row = (iota_c == jf).astype(jnp.float32)
            th_del = jnp.sum(is_j_row * theta, axis=0, keepdims=True)
            om_del = jnp.sum(is_j_row * omega, axis=0, keepdims=True)
            om_del_safe = jnp.where(om_del > 0.0, om_del, 1.0)
            log_del = -log_range_th + (a_om - 1.0) * jnp.log(om_del_safe) - b_om * om_del_safe + lgam_om

            # S_death (k active) and C_death = S_death + ridge (e_j e_j' - P_k): SPD
            S_d = []
            for j in range(p):
                active_j = sel_lt(j, kf)
                colj = G0cols[j] * m_arr * active_j
                colj = colj + units[j] * (_RIDGE * active_j + (1.0 - active_j))
                S_d.append(colj)
            _, logdet_Sd = chol_cols(S_d)
            C_d = [
                S_d[j] + units[j] * (_RIDGE * (sel_eq(j, jf) - sel_lt(j, kf))) for j in range(p)
            ]
            L_cd, logdet_Cd = chol_cols(C_d)
            S_beta = jnp.zeros((p, B), jnp.float32)
            for j in range(p):
                S_beta = S_beta + S_d[j] * beta_rows[j]
            mu_aug = chol_solve_1rhs(L_cd, S_beta)
            ld_F_death = logdet_Cd - logdet_Sd
            param_del = jnp.sum(is_j_row * mu_aug, axis=0, keepdims=True)
            log_rev_draw = _truncnorm_logpdf(param_del, zeros, m_scale, m_lo, m_hi)

            def shift_delete(vec):
                vrows = rows(vec)
                out_rows_l = []
                for i in range(p):
                    nxt = vrows[i + 1] if i + 1 < p else zeros
                    keep = sel_lt(i, jf)
                    out_rows_l.append(keep * vrows[i] + (1.0 - keep) * nxt)
                out = jnp.concatenate(out_rows_l, axis=0)
                return out * (iota_c < (kf - 1.0)).astype(jnp.float32)

            beta_death = shift_delete(mu_aug)
            th_death = shift_delete(theta)
            om_death = shift_delete(omega)
            kf_death = kf - 1.0

            pd_fwd = jnp.where(kf >= float(p), ones, 0.5 * ones)
            pb_rev = jnp.where(kf <= 2.0, ones, 0.5 * ones)
            death_fwd = jnp.log(pd_fwd) + ld_F_death
            death_rev = jnp.log(pb_rev) + log_del + log_rev_draw

            # ---- branch select + accept ----------------------------------
            kf_prop = jnp.where(birth > 0.0, kf_birth, kf_death)
            beta_p = jnp.where(birth > 0.0, beta_birth, beta_death)
            th_p = jnp.where(birth > 0.0, th_birth, th_death)
            om_p = jnp.where(birth > 0.0, om_birth, om_death)
            logp_fwd = jnp.where(birth > 0.0, birth_fwd, death_fwd)
            logp_rev = jnp.where(birth > 0.0, birth_rev, death_rev)

            m_prop = (iota_c < kf_prop).astype(jnp.float32)
            lp_cur = model_log_p(kf, beta, theta, omega, m_arr)
            lp_prop = model_log_p(kf_prop, beta_p, th_p, om_p, m_prop)
            if lik:
                # data likelihood at the CURRENT tau for both states; the birth
                # residual swaps in the matched coefficients + the new column,
                # the death residual zeroes the deleted column (the shift only
                # relabels columns, it cannot change B beta)
                quad_cur = jnp.sum(r * r, axis=0, keepdims=True)
                mu_star_rows = rows(mu_star * m_arr)
                r_birth = Yc - sum(bas[i] * mu_star_rows[i] for i in range(p)) - new_col * draw
                quad_birth = jnp.sum(r_birth * r_birth, axis=0, keepdims=True)
                mu_aug_rows = rows(mu_aug * m_arr * (1.0 - is_j_row))
                r_death = Yc - sum(bas[i] * mu_aug_rows[i] for i in range(p))
                quad_death = jnp.sum(r_death * r_death, axis=0, keepdims=True)
                quad_prop = jnp.where(birth > 0.0, quad_birth, quad_death)

                def loglik(quad, tauv):
                    return half_n * (jnp.log(tauv) - LOG_2PI) - 0.5 * tauv * quad

                log_accept = (
                    lp_prop + loglik(quad_prop, tau) + logp_rev
                    - lp_cur - loglik(quad_cur, tau) - logp_fwd
                )
            else:
                log_accept = lp_prop + logp_rev - lp_cur - logp_fwd
            acc = jnp.log(uniform((1, B))) < log_accept
            kf = jnp.where(acc, kf_prop, kf)
            beta = jnp.where(acc, beta_p, beta)
            theta = jnp.where(acc, th_p, theta)
            omega = jnp.where(acc, om_p, omega)
            acc_r = acc_r + acc.astype(jnp.float32)
            if lik:
                # ==== 5. conjugate NormalGamma on tau =========================
                # tau | rest ~ Gamma(a_tau + n/2, b_tau + ||y - B beta||^2 / 2)
                # (reference sampler/sampler.py:210-288 machinery for this model);
                # the stored log_post is the generic driver's end-of-sweep value:
                # every term evaluated at the post-RJ state and the NEW tau
                quad_sel = jnp.where(acc, quad_prop, quad_cur)
                lp_sel = jnp.where(acc, lp_prop, lp_cur)
                tau = gamma_mt(a_tau_star, b_tau + 0.5 * quad_sel)
                log_post = (
                    lp_sel
                    + half_n * (jnp.log(tau) - LOG_2PI)
                    - 0.5 * tau * quad_sel
                    + lgam_tau
                    + (a_tau - 1.0) * jnp.log(tau)
                    - b_tau * tau
                )
            else:
                log_post = jnp.where(acc, lp_prop, lp_cur)

            # ---- store ---------------------------------------------------
            idx = _store_index(it, n_burn, n_thin)

            @pl.when(idx >= 0)
            def _():
                slot = lax.rem(idx, 2)

                @pl.when(idx >= 2)
                def _():
                    pltpu.make_async_copy(
                        stage_ref.at[slot], out_ref.at[idx - 2, :, pl.ds(pid * B, B)], sems.at[slot]
                    ).wait()

                rows_out = [kf, log_post, acc_m, acc_t, acc_o, acc_r, prop_t, prop_o]
                if lik:
                    rows_out.append(tau)
                if stream:
                    # stream the padded parameter draws (store_names request);
                    # padding columns are exact zeros, like the generic state
                    rows_out = rows_out + rows(beta) + rows(theta) + rows(omega)
                if len(rows_out) < n_rows:
                    rows_out.append(jnp.zeros((n_rows - len(rows_out), B), jnp.float32))
                stage_ref[pl.ds(slot, 1)] = jnp.concatenate(rows_out, axis=0)[None, :, :]
                pltpu.make_async_copy(
                    stage_ref.at[slot], out_ref.at[idx, :, pl.ds(pid * B, B)], sems.at[slot]
                ).start()

            if lik:
                return beta, theta, omega, kf, tau, acc_m, acc_t, acc_o, acc_r, prop_t, prop_o
            return beta, theta, omega, kf, acc_m, acc_t, acc_o, acc_r, prop_t, prop_o

        # the (1, B) loop-carry rows must start with a CONCRETE lane layout, or
        # Mosaic's layout inference fails reconciling the backedge ("Invalid
        # relayout: non-singleton dimension replicated in destination but not
        # source"): splat/broadcast inits are lane-replicated, and an arithmetic
        # zero (iota * 0) constant-folds back to a splat. A store/load round-trip
        # through VMEM scratch is opaque to folding and loads always carry
        # materialized layouts. stage_ref is free this early (no DMA in flight).
        stage_ref[pl.ds(0, 1)] = jnp.zeros((1, n_rows, BLOCK_B), jnp.float32)
        zr = stage_ref[0]  # (n_rows, B) concrete zeros
        nz = zr[0:1, :]
        if warm:
            # per-chain warm start (resume): rows [beta (p) | theta (p) |
            # omega (p) | k | (tau if lik) | acc_m | acc_t | acc_o | acc_r |
            # prop_t | prop_o]; VMEM loads carry materialized lane layouts, so
            # no zr trick needed
            beta0 = init_ref[0:p, :]
            theta0 = init_ref[p : 2 * p, :]
            omega0 = init_ref[2 * p : 3 * p, :]
            k0 = init_ref[3 * p : 3 * p + 1, :]
            base = 3 * p + 1
            head = (beta0, theta0, omega0, k0)
            if lik:
                head = head + (init_ref[base : base + 1, :],)
                base += 1
            carry0 = head + tuple(init_ref[base + i : base + 1 + i, :] for i in range(6))
        else:
            beta0 = jnp.broadcast_to(x_ref[off : off + p, :], (p, BLOCK_B)) + nz
            theta0 = jnp.broadcast_to(x_ref[off + p : off + 2 * p, :], (p, BLOCK_B)) + nz
            omega0 = jnp.broadcast_to(x_ref[off + 2 * p : off + 3 * p, :], (p, BLOCK_B)) + nz
            k0 = jnp.broadcast_to(x_ref[off + 3 * p : off + 3 * p + 1, :], (1, BLOCK_B)) + nz
            head = (beta0, theta0, omega0, k0)
            if lik:
                head = head + (jnp.full((1, BLOCK_B), tau0, jnp.float32) + nz,)
            carry0 = head + tuple(zr[i : i + 1, :] for i in range(1, 7))
        lax.fori_loop(0, n_burn + n_keep * n_thin, iteration, carry0)

        for last in range(max(0, n_keep - 2), n_keep):
            slot = last % 2
            pltpu.make_async_copy(
                stage_ref.at[slot], out_ref.at[last, :, pl.ds(pid * BLOCK_B, BLOCK_B)], sems.at[slot]
            ).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("n_burn", "n_iter", "n_chains", "n_thin", "cfg_static"))
def _run_fused_rj_jit(seed, packed, n_burn, n_iter, n_chains, cfg_static, init=None, n_thin=1):
    cfg = dict(cfg_static)
    p = cfg.pop("n_max")
    n_data = cfg.pop("n_data")
    b_total = n_chains + ((-n_chains) % BLOCK_B)
    stream = cfg.pop("stream_params")
    lik = bool(cfg.get("likelihood", False))
    n_rows = OUT_ROWS + (1 if lik else 0) + (3 * p if stream else 0)
    n_rows = n_rows + ((-n_rows) % 8)  # sublane tile alignment for the DMA slices
    kernel = _make_kernel(p, n_data, n_burn, n_iter, cfg, n_rows, stream, warm=init is not None,
                          n_thin=n_thin)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray([seed], jnp.int32), packed]
    if init is not None:
        in_rows = [
            jnp.asarray(init["beta"], jnp.float32).reshape(n_chains, p).T,
            jnp.asarray(init["theta"], jnp.float32).reshape(n_chains, p).T,
            jnp.asarray(init["omega"], jnp.float32).reshape(n_chains, p).T,
            jnp.asarray(init["k"], jnp.float32).reshape(1, n_chains),
        ]
        if lik:
            in_rows.append(jnp.asarray(init["tau"], jnp.float32).reshape(1, n_chains))
        in_rows.append(
            jnp.asarray(init.get("counters", jnp.zeros((6, n_chains))), jnp.float32).reshape(6, n_chains)
        )
        rows_in = jnp.concatenate(in_rows, axis=0)
        rows_in = jnp.pad(rows_in, ((0, 0), (0, b_total - n_chains)))
        in_specs.append(pl.BlockSpec((3 * p + 7 + (1 if lik else 0), BLOCK_B), lambda i: (0, i)))
        args.append(rows_in)
    (out,) = pl.pallas_call(
        kernel,
        grid=(b_total // BLOCK_B,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),),
        out_shape=(jax.ShapeDtypeStruct((n_iter, n_rows, b_total), jnp.float32),),
        scratch_shapes=[
            pltpu.VMEM((2, n_rows, BLOCK_B), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # ~21 MB of live column-list temporaries at B=1024 (basis columns +
            # Gram + 4 factorizations); the 16 MB default scoped-vmem limit is
            # conservative, v5e has 128 MB
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(*args)
    return jnp.transpose(chain_slice(out, n_chains), (2, 0, 1))  # (chains, iters, rows)


def run_fused_rj(
    seed: int,
    X: jnp.ndarray,
    n_burn: int,
    n_iter: int,
    n_chains: int,
    n_max: int,
    beta0, theta0, omega0, k0,
    rho: float = 8.0,
    mu_beta: float = 0.0,
    tau_beta: float = 0.25,
    a_omega: float = 3.0,
    b_omega: float = 2.0,
    theta_limits=(-10.0, 10.0),
    omega_rw_limits=(0.5, 2.0),
    match_limits=(-10.0, 10.0),
    match_scale: float = 1.0,
    step_mmala: float = 0.5,
    step_theta: float = 0.1,
    step_omega: float = 0.1,
    stream_params: bool = False,
    n_thin: int = 1,
    init=None,
    y=None,
    a_tau: float = 2.0,
    b_tau: float = 1.0,
    tau0: float = 1.0,
):
    """Run the full RJ stack in one fused kernel.

    X: (n_data,) basis evaluation points. State is padded to ``n_max``; initial
    values broadcast to all chains. Returns dict with n_basis/log_post:
    (chains, iters) plus acceptance/proposal counters accumulated over
    burn + sampling (the generic driver's counting window). ``stream_params``
    additionally streams the padded beta/theta/omega draws, (chains, iters, n_max)
    each (3 * n_max extra output rows; padding entries are exact zeros).

    ``y`` switches on LIKELIHOOD mode -- the reference's matched-transition
    regression use case (reference tests/test_reversible_jump.py model built at
    :281-434): y ~ N(B(theta, omega) beta, (tau I)^-1) with a conjugate
    NormalGamma(tau) update appended to the sweep (a_tau/b_tau hyperparameters,
    tau0 initial value). The output then also streams per-iteration ``tau``
    draws. ``y=None`` keeps the Null-likelihood prior-recovery family."""
    X = np.asarray(X, np.float32).reshape(-1)
    n_data = X.shape[0]
    p = int(n_max)
    lik = y is not None
    parts = [X]
    if lik:
        yv = np.asarray(y, np.float32).reshape(-1)
        if yv.shape[0] != n_data:
            raise ValueError(f"y has {yv.shape[0]} entries but X has {n_data}")
        parts.append(yv)
    parts += [
        np.broadcast_to(np.asarray(beta0, np.float32).reshape(-1), (p,)).copy(),
        np.broadcast_to(np.asarray(theta0, np.float32).reshape(-1), (p,)).copy(),
        np.broadcast_to(np.asarray(omega0, np.float32).reshape(-1), (p,)).copy(),
        np.asarray([float(k0)], np.float32),
    ]
    packed = np.concatenate(parts).reshape(-1, 1)
    cfg_static = (
        ("n_max", p), ("n_data", n_data), ("rho", float(rho)),
        ("mu_beta", float(mu_beta)), ("tau_beta", float(tau_beta)),
        ("a_omega", float(a_omega)), ("b_omega", float(b_omega)),
        ("theta_limits", (float(theta_limits[0]), float(theta_limits[1]))),
        ("omega_rw_limits", (float(omega_rw_limits[0]), float(omega_rw_limits[1]))),
        ("match_limits", (float(match_limits[0]), float(match_limits[1]))),
        ("match_scale", float(match_scale)), ("step_mmala", float(step_mmala)),
        ("step_theta", float(step_theta)), ("step_omega", float(step_omega)),
        ("stream_params", bool(stream_params)),
        ("likelihood", lik),
        ("a_tau", float(a_tau)), ("b_tau", float(b_tau)), ("tau0", float(tau0)),
    )
    draws = _run_fused_rj_jit(
        seed, jnp.asarray(packed), n_burn=n_burn, n_iter=n_iter, n_chains=n_chains,
        cfg_static=cfg_static, init=init, n_thin=n_thin,
    )
    out = {
        "n_basis": draws[:, :, 0],
        "log_post": draws[:, :, 1],
        "accept_mmala": draws[:, -1, 2],
        "accept_theta": draws[:, -1, 3],
        "accept_omega": draws[:, -1, 4],
        "accept_rj": draws[:, -1, 5],
        "proposal_theta": draws[:, -1, 6],
        "proposal_omega": draws[:, -1, 7],
        "n_proposals": float(n_burn + n_iter * n_thin),
    }
    base = 8
    if lik:
        out["tau"] = draws[:, :, base]
        base += 1
    if stream_params:
        out["beta"] = draws[:, :, base : base + p]
        out["theta"] = draws[:, :, base + p : base + 2 * p]
        out["omega"] = draws[:, :, base + 2 * p : base + 3 * p]
    return out
