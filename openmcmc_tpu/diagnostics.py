"""Convergence diagnostics: effective sample size, split-R-hat, summaries.

The reference has no in-library diagnostics (SURVEY.md section 5: examples eyeball trace
plots); ESS/sec is nevertheless the benchmark metric (BASELINE.json), so diagnostics are
first-class here. All computations are jnp (FFT-based autocovariance), so they run on
device and can reduce across sharded chains.

Conventions follow Vehtari et al. 2021 / Stan reference (without rank-normalization):
- multi-chain ESS with Geyer's initial positive + monotone sequence truncation,
- split-R-hat on half chains.

Input convention: draws with shape (n_chains, n_iter) for a scalar quantity, or
(n_chains, n_iter, ...) handled by vmapping over trailing axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _autocovariance(x: jnp.ndarray) -> jnp.ndarray:
    """Biased autocovariance per chain via FFT. x: (n_chains, n_iter) -> (n_chains, n_iter)."""
    n = x.shape[1]
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    size = 2 * n  # zero-pad to avoid circular wrap
    f = jnp.fft.rfft(xc, n=size, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=size, axis=1)[:, :n]
    return acov / n


def effective_sample_size(draws: jnp.ndarray, allow_super_efficiency: bool = False) -> jnp.ndarray:
    """Multi-chain bulk ESS for a scalar quantity; draws: (n_chains, n_iter).

    ESS = m * n / tau_hat with tau from combined-chain autocorrelations, truncated by
    Geyer's initial positive sequence and enforced monotone decrease.

    The estimate is capped at the actual draw count m * n: antithetic chains can have
    genuine ESS above it, but an ESTIMATE exceeding the number of draws is far more
    often autocovariance noise, and benchmark metrics must not inflate. Pass
    ``allow_super_efficiency=True`` to raise the cap to the Stan-style
    m * n * log10(m * n) bound instead.
    """
    draws = jnp.asarray(draws, dtype=jnp.result_type(float))
    m, n = draws.shape
    acov = _autocovariance(draws)  # (m, n)
    chain_mean = jnp.mean(draws, axis=1)
    mean_var = jnp.mean(acov[:, 0]) * n / (n - 1.0)  # W with bias correction
    var_plus = mean_var * (n - 1.0) / n
    if m > 1:
        var_plus = var_plus + jnp.var(chain_mean, ddof=1)

    rho = 1.0 - (mean_var - jnp.mean(acov, axis=0)) / var_plus  # (n,)
    rho = rho.at[0].set(1.0)

    # Geyer pairs P_k = rho_{2k} + rho_{2k+1}, k = 0..n//2-1
    n_pairs = n // 2
    pairs = rho[0 : 2 * n_pairs : 2] + rho[1 : 2 * n_pairs : 2]
    # initial positive sequence: keep pairs while all previous pairs > 0
    positive = jnp.cumprod(pairs > 0.0).astype(rho.dtype)
    # monotone decreasing envelope
    monotone = jax.lax.associative_scan(jnp.minimum, jnp.where(positive > 0, pairs, 0.0))
    tau = -rho[0] + 2.0 * jnp.sum(monotone * positive)
    tau = jnp.maximum(tau, 1.0 / jnp.asarray(n, rho.dtype))  # guard
    ess = m * n / tau
    if allow_super_efficiency:
        return jnp.minimum(ess, m * n * jnp.log10(jnp.asarray(m * n, rho.dtype)))
    return jnp.minimum(ess, jnp.asarray(m * n, rho.dtype))


def ess_per_param(draws: jnp.ndarray, chunk_size: int = 0) -> jnp.ndarray:
    """ESS over trailing parameter axes; draws: (n_chains, n_iter, ...) -> (...).

    chunk_size > 0 bounds peak memory by processing that many scalar quantities per
    batched FFT (useful when n_chains * n_iter is large)."""
    m, n = draws.shape[0], draws.shape[1]
    flat = draws.reshape(m, n, -1)
    k = flat.shape[2]
    if chunk_size and chunk_size < k:
        fn = jax.jit(jax.vmap(effective_sample_size, in_axes=2))
        parts = [fn(flat[:, :, i : i + chunk_size]) for i in range(0, k - k % chunk_size, chunk_size)]
        if k % chunk_size:
            parts.append(jax.vmap(effective_sample_size, in_axes=2)(flat[:, :, k - k % chunk_size :]))
        out = jnp.concatenate(parts)
    else:
        out = jax.vmap(effective_sample_size, in_axes=2)(flat)
    return out.reshape(draws.shape[2:])


def split_rhat(draws: jnp.ndarray) -> jnp.ndarray:
    """Split-R-hat for a scalar quantity; draws: (n_chains, n_iter)."""
    draws = jnp.asarray(draws, dtype=jnp.result_type(float))
    m, n = draws.shape
    half = n // 2
    split = jnp.concatenate([draws[:, :half], draws[:, half : 2 * half]], axis=0)  # (2m, half)
    chain_mean = jnp.mean(split, axis=1)
    chain_var = jnp.var(split, axis=1, ddof=1)
    W = jnp.mean(chain_var)
    B = half * jnp.var(chain_mean, ddof=1)
    var_plus = (half - 1.0) / half * W + B / half
    return jnp.sqrt(var_plus / W)


def rhat_per_param(draws: jnp.ndarray) -> jnp.ndarray:
    """Split-R-hat over trailing axes; draws: (n_chains, n_iter, ...) -> (...)."""
    m, n = draws.shape[0], draws.shape[1]
    flat = draws.reshape(m, n, -1)
    out = jax.vmap(split_rhat, in_axes=2)(flat)
    return out.reshape(draws.shape[2:])


def summary(draws: jnp.ndarray) -> dict:
    """Posterior summary over (n_chains, n_iter, ...) draws."""
    axis = (0, 1)
    return {
        "mean": jnp.mean(draws, axis=axis),
        "sd": jnp.std(draws, axis=axis),
        "q05": jnp.quantile(draws, 0.05, axis=axis),
        "q50": jnp.quantile(draws, 0.50, axis=axis),
        "q95": jnp.quantile(draws, 0.95, axis=axis),
        "ess": ess_per_param(draws),
        "rhat": rhat_per_param(draws),
    }
