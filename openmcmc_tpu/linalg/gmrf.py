"""GMRF sampling kernels: TPU-native rebuild of the reference's gmrf module.

Reference: /root/reference/src/openmcmc/gmrf.py (Rue & Held 2005 algorithms).
Design changes for TPU:

- All randomness is stateless threefry (``jax.random``) instead of scipy's global RNG.
- Precision matrices are :mod:`openmcmc_tpu.linalg.structured` types (Dense / Diagonal /
  Banded) instead of np.ndarray / scipy.sparse; Cholesky and triangular solves map to
  batched MXU kernels (dense) or ``lax.scan`` band kernels (GMRF tridiagonals).
- The per-dimension truncated-normal Gibbs sweep (reference gmrf.py:201-266) is an
  irreducibly sequential loop over dimensions: implemented as ``lax.scan`` over
  coordinates, so it vectorizes across thousands of chains under ``vmap``.
- Rejection sampling (reference gmrf.py:113-164) uses a ``lax.while_loop`` with
  fixed-shape resampling and masked acceptance so shapes stay static.

Every function is pure: ``(key, ...) -> sample`` and safe under jit/vmap/scan.
"""

from __future__ import annotations

import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax import lax

from openmcmc_tpu.linalg import structured as st

Array = jnp.ndarray
StructuredOrArray = Union[st.Dense, st.Diagonal, st.Banded, st.Permuted, Array]

_LOG_2PI = math.log(2.0 * math.pi)  # host constant: importing the package must never initialize a backend


def _as_chol(Q: Optional[StructuredOrArray], L: Optional[st.Structured]) -> st.Structured:
    if L is not None:
        return L
    return st.cholesky(st.as_structured(Q))


def sample_normal(
    key: Array,
    mu: Array,
    Q: Optional[StructuredOrArray] = None,
    L: Optional[st.Structured] = None,
    n: int = 1,
) -> Array:
    """Sample x ~ N(mu, Q^{-1}) via Rue & Held Alg. 2.4 (reference gmrf.py:29-61).

    x = mu + L^{-T} z with L the lower Cholesky factor of the precision Q.

    Args:
        key: PRNG key.
        mu: mean, shape (p,), (p, 1) or (p, n).
        Q: precision matrix (structured or dense array). Ignored when L given.
        L: optional precomputed lower Cholesky factor of Q.
        n: number of replicate samples (static).

    Returns:
        (p, n) samples.
    """
    chol = _as_chol(Q, L)
    mu = jnp.asarray(mu)
    p = mu.shape[0] if mu.ndim > 0 else 1
    z = jax.random.normal(key, (p, n), dtype=mu.dtype if mu.dtype != jnp.int32 else jnp.float32)
    v = st.solve_upper_t(chol, z)
    return v + (mu.reshape(p, -1) if mu.ndim != 2 else mu)


def sample_normal_canonical(
    key: Array,
    b: Array,
    Q: Optional[StructuredOrArray] = None,
    L: Optional[st.Structured] = None,
    _allow_pallas: bool = True,
) -> Array:
    """Sample x ~ N(Q^{-1} b, Q^{-1}) via Rue & Held Alg. 2.5 (reference gmrf.py:167-198).

    The single hottest kernel: used by the NormalNormal conjugate sampler every sweep.
    mu = Q^{-1} b by two triangular solves against one Cholesky factorization, which is
    then reused for the noise solve. Tridiagonal precisions dispatch to the fused
    Pallas TPU kernel under chain batching (see linalg.pallas_tridiag); b must then be
    a single column.
    """
    b = jnp.asarray(b)
    if (
        _allow_pallas
        and L is None
        and isinstance(Q, st.Banded)
        and Q.bw == 1
        and b.reshape(-1).shape[0] == Q.bands.shape[-1]
    ):
        from openmcmc_tpu.linalg.pallas_tridiag import sample_canonical_tridiag

        return sample_canonical_tridiag(key, b, Q.bands)
    if (
        _allow_pallas
        and L is None
        and isinstance(Q, st.Permuted)
        and isinstance(Q.inner, st.Banded)
        and Q.inner.bw == 1
        and b.reshape(-1).shape[0] == st.dim(Q)
    ):
        # permuted tridiagonal (e.g. an RCM-ordered path graph): run the fused
        # Pallas kernel in permuted coordinates -- the draw transforms exactly
        from openmcmc_tpu.linalg.pallas_tridiag import sample_canonical_tridiag

        shape_in = b.shape
        x = sample_canonical_tridiag(key, Q.permute(b.reshape(-1)), Q.inner.bands)
        return Q.unpermute(x.reshape(-1)).reshape(shape_in)
    chol = _as_chol(Q, L)
    mu = st.cho_solve(chol, b).reshape(b.shape)
    return sample_normal(key, mu, L=chol)


def mvn_log_pdf(
    x: Array,
    mu: Array,
    Q: Optional[StructuredOrArray] = None,
    L: Optional[st.Structured] = None,
    by_observation: bool = False,
) -> Array:
    """Log N(x; mu, Q^{-1}) in precision form (reference gmrf.py:321-348).

    log p = 1/2 (log|Q| - d log 2 pi - || L^T (x - mu) ||^2) summed (or not) over the
    replicate axis.
    """
    chol = _as_chol(Q, L)
    x = jnp.asarray(x)
    d = x.shape[0]
    r = x - (mu if jnp.ndim(mu) == x.ndim else jnp.reshape(mu, (d, -1)))
    w = st.chol_matvec_t(chol, r)
    quad = jnp.sum(w * w, axis=0)
    log_p = 0.5 * (st.chol_log_det(chol) - d * _LOG_2PI - quad)
    if not by_observation:
        log_p = jnp.sum(log_p)
    return log_p


# Reference-API alias (reference gmrf.py:321 ``multivariate_normal_pdf``).
multivariate_normal_pdf = mvn_log_pdf


# ---------------------------------------------------------------------------
# Truncated normal helpers (1-D, vectorized)
# ---------------------------------------------------------------------------


def _standardize_bounds(mean, scale, lower, upper):
    lower = -jnp.inf if lower is None else lower
    upper = jnp.inf if upper is None else upper
    a = (lower - mean) / scale
    b = (upper - mean) / scale
    return a, b


def truncated_normal_rv(key: Array, mean, scale, lower=None, upper=None, shape=None) -> Array:
    """Truncated normal draws (reference gmrf.py:269-292), elementwise broadcast.

    Inverse-CDF sampling (the same algorithm as jax.random.truncated_normal) but with
    the Giles single-precision inverse erf: ``jax.lax.erf_inv`` lowers to a ~1.6 ms
    routine per (4096, 50) call on TPU and dominated every truncated sweep; the
    polynomial is ~400x faster at f32-equivalent accuracy (see linalg/random.py).
    """
    from openmcmc_tpu.linalg.random import fast_erfinv

    mean = jnp.asarray(mean, dtype=jnp.result_type(float))
    scale = jnp.asarray(scale, dtype=mean.dtype)
    a, b = _standardize_bounds(mean, scale, lower, upper)
    if shape is None:
        shape = jnp.broadcast_shapes(jnp.shape(mean), jnp.shape(scale), jnp.shape(a), jnp.shape(b))
    a = jnp.broadcast_to(jnp.asarray(a, mean.dtype), shape)
    b = jnp.broadcast_to(jnp.asarray(b, mean.dtype), shape)
    sqrt2 = jnp.asarray(1.4142135623730951, mean.dtype)
    ea = lax.erf(a / sqrt2)
    eb = lax.erf(b / sqrt2)
    u = jax.random.uniform(key, shape, mean.dtype)
    t = ea + u * (eb - ea)
    eps = jnp.asarray(1e-7, mean.dtype)
    z = sqrt2 * fast_erfinv(jnp.clip(t, -1.0 + eps, 1.0 - eps))
    z = jnp.clip(z, a, b)
    out = mean + scale * z
    # mean + scale * clip(z) can round 1 ulp outside the box in f32: clip in the
    # original coordinates too (reference semantics: draws lie inside the bounds)
    if lower is not None:
        out = jnp.maximum(out, jnp.asarray(lower, out.dtype))
    if upper is not None:
        out = jnp.minimum(out, jnp.asarray(upper, out.dtype))
    return out


def truncated_normal_log_pdf(x, mean, scale, lower=None, upper=None) -> Array:
    """Truncated normal log-density (reference gmrf.py:295-318), elementwise broadcast."""
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    mean = jnp.asarray(mean, dtype=x.dtype)
    scale = jnp.asarray(scale, dtype=x.dtype)
    a, b = _standardize_bounds(mean, scale, lower, upper)
    z = (x - mean) / scale
    log_phi = -0.5 * (z * z + _LOG_2PI) - jnp.log(scale)
    # log(Phi(b) - Phi(a)) computed stably via the complementary form on each side
    log_mass = _log_ndtr_diff(a, b)
    inside = jnp.logical_and(z >= a, z <= b)
    return jnp.where(inside, log_phi - log_mass, -jnp.inf)


def _log_ndtr_diff(a, b):
    """log(Phi(b) - Phi(a)) for a < b, numerically stable in both tails."""
    # When both bounds are in the upper tail, use survival functions: Phi(b)-Phi(a)
    # = Phi(-a) - Phi(-b). Pick the side with better conditioning.
    use_flip = (a + b) > 0
    lo = jnp.where(use_flip, -b, a)
    hi = jnp.where(use_flip, -a, b)
    log_hi = jax.scipy.special.log_ndtr(hi)
    log_lo = jax.scipy.special.log_ndtr(lo)
    # log(e^log_hi - e^log_lo)
    diff = log_lo - log_hi
    return log_hi + jnp.log1p(-jnp.exp(diff))


# ---------------------------------------------------------------------------
# Multivariate truncated normal samplers
# ---------------------------------------------------------------------------


def sample_truncated_normal_rejection(
    key: Array,
    mu: Array,
    Q: Optional[StructuredOrArray] = None,
    L: Optional[st.Structured] = None,
    lower=None,
    upper=None,
    n: int = 1,
    max_iter: int = 1000,
) -> Array:
    """Rejection sampling for a box-truncated MVN (reference gmrf.py:113-164).

    TPU adaptation: a ``lax.while_loop`` resamples *all* columns each round and keeps
    previously accepted columns via masking, so shapes stay static. ``max_iter`` bounds
    the loop for compile-safety.
    """
    chol = _as_chol(Q, L)
    mu = jnp.asarray(mu)
    p = mu.shape[0]
    lower = -jnp.inf if lower is None else jnp.asarray(lower)
    upper = jnp.inf if upper is None else jnp.asarray(upper)
    lo = jnp.broadcast_to(jnp.reshape(lower, (-1, 1)) if jnp.ndim(lower) else lower, (p, 1))
    hi = jnp.broadcast_to(jnp.reshape(upper, (-1, 1)) if jnp.ndim(upper) else upper, (p, 1))

    def ok_mask(samples):
        return jnp.all(jnp.logical_and(samples >= lo, samples <= hi), axis=0)

    def cond(carry):
        _, _, accepted, it = carry
        return jnp.logical_and(~jnp.all(accepted), it < max_iter)

    def body(carry):
        k, samples, accepted, it = carry
        k, sub = jax.random.split(k)
        fresh = sample_normal(sub, mu, L=chol, n=n)
        samples = jnp.where(accepted[None, :], samples, fresh)
        return k, samples, ok_mask(samples), it + 1

    key, sub = jax.random.split(key)
    init = sample_normal(sub, mu, L=chol, n=n)
    carry = (key, init, ok_mask(init), jnp.asarray(0))
    _, samples, _, _ = lax.while_loop(cond, body, carry)
    return samples


def gibbs_canonical_truncated_normal(
    key: Array,
    b: Array,
    Q: StructuredOrArray,
    x: Array,
    lower=None,
    upper=None,
    schedule: str = "lex",
) -> Array:
    """One coordinate-wise Gibbs sweep of a box-truncated canonical Gaussian.

    x ~ N_c(Q^{-1} b, Q^{-1}) s.t. lower < x < upper  (reference gmrf.py:201-266).
    The per-dimension conditional mean is v_i (b_i - Q_{i,:} x + Q_{ii} x_i).

    schedule="lex" (reference parity): sequential lexicographic sweep as a
    ``lax.scan`` over coordinates -- chain parallelism via ``vmap`` at the driver.
    schedule="red_black" (TPU-native, banded/diagonal Q only): chromatic Gibbs.
    Coordinates i, j with |i - j| > bw do not interact, so coloring by
    i mod (bw + 1) makes each color class conditionally independent -- the whole
    class updates in ONE vectorized truncated draw. A sweep is bw + 1 parallel
    steps instead of p sequential ones (p/(bw+1) times less sequential depth; the
    transcendental work vectorizes over coordinates x chains). Both schedules are
    valid Gibbs kernels with the same stationary distribution; one-sweep
    distributions differ (update order matters within a sweep).

    The chromatic sweep + the polynomial inverse-CDF draw made the round-1 Pallas
    lexicographic-sweep kernel obsolete (measured ~100x faster on-device than
    either sequential path); it has been removed.
    """
    Qs = st.as_structured(Q)
    if isinstance(Qs, st.Permuted):
        # run the sweep in permuted coordinates, where Q is banded and the
        # chromatic schedule applies; a Gibbs sweep in any fixed coordinate order
        # is a valid kernel, so permuting the sweep order preserves correctness
        x = jnp.asarray(x)
        shape_in = x.shape

        def permute_bound(bound):
            if bound is None or jnp.ndim(bound) == 0 or jnp.size(bound) == 1:
                return bound
            return Qs.permute(jnp.reshape(jnp.asarray(bound), (-1,)))

        out = gibbs_canonical_truncated_normal(
            key,
            Qs.permute(jnp.asarray(b).reshape(-1)),
            Qs.inner,
            Qs.permute(x.reshape(-1)),
            lower=permute_bound(lower),
            upper=permute_bound(upper),
            schedule=schedule,
        )
        return Qs.unpermute(out.reshape(-1)).reshape(shape_in)
    if schedule == "red_black" and isinstance(Qs, (st.Banded, st.Diagonal)):
        return _gibbs_truncated_red_black(key, b, Qs, x, lower, upper)
    b = jnp.asarray(b).reshape(-1)
    x = jnp.asarray(x)
    shape_in = x.shape
    xf = x.reshape(-1)
    p = xf.shape[0]
    lo = jnp.broadcast_to(-jnp.inf if lower is None else jnp.reshape(jnp.asarray(lower, xf.dtype), (-1,)), (p,))
    hi = jnp.broadcast_to(jnp.inf if upper is None else jnp.reshape(jnp.asarray(upper, xf.dtype), (-1,)), (p,))
    q_diag = st.diag(Qs)
    keys = jax.random.split(key, p)

    def step(xv, inp):
        i, k = inp
        q_ii = q_diag[i]
        v_i = 1.0 / q_ii
        cond_mean = v_i * (b[i] - st.row_dot(Qs, i, xv) + q_ii * xv[i])
        draw = truncated_normal_rv(k, cond_mean, jnp.sqrt(v_i), lo[i], hi[i], shape=())
        return xv.at[i].set(draw), None

    xf, _ = lax.scan(step, xf, (jnp.arange(p), keys))
    return xf.reshape(shape_in)


def _gibbs_truncated_red_black(key, b, Qs, x, lower, upper) -> Array:
    """Chromatic (red-black) truncated Gibbs sweep for banded/diagonal Q.

    Each of the bw + 1 color classes {i : i mod (bw+1) == c} is an independent set
    of the precision graph, so its conditionals given the rest factorize and the
    whole class is one vectorized truncated-normal draw (Q_ij = 0 for same-color
    i != j). Sequential depth bw + 1 instead of p."""
    b = jnp.asarray(b).reshape(-1)
    x = jnp.asarray(x)
    shape_in = x.shape
    xf = x.reshape(-1)
    p = xf.shape[0]
    lo = jnp.broadcast_to(-jnp.inf if lower is None else jnp.reshape(jnp.asarray(lower, xf.dtype), (-1,)), (p,))
    hi = jnp.broadcast_to(jnp.inf if upper is None else jnp.reshape(jnp.asarray(upper, xf.dtype), (-1,)), (p,))
    q_diag = st.diag(Qs)
    v = 1.0 / q_diag
    s = jnp.sqrt(v)
    n_colors = 1 if isinstance(Qs, st.Diagonal) else Qs.bw + 1
    colors = jnp.arange(p) % n_colors
    for c, k in enumerate(jax.random.split(key, n_colors)):
        cond_mean = v * (b - st.matvec(Qs, xf) + q_diag * xf)
        draw = truncated_normal_rv(k, cond_mean, s, lo, hi, shape=(p,))
        xf = jnp.where(colors == c, draw, xf)
    return xf.reshape(shape_in)


def sample_truncated_normal(
    key: Array,
    mu: Array,
    Q: Optional[StructuredOrArray] = None,
    L: Optional[st.Structured] = None,
    lower=None,
    upper=None,
    n: int = 1,
    method: str = "Gibbs",
    n_sweeps: int = 10,
    init_max_iter: int = 100,
    schedule: str = "auto",
) -> Array:
    """Sample from a box-truncated MVN (reference gmrf.py:64-110).

    method="Gibbs": REJECTION-INITIALIZE each sample column with an exact draw
    (matching the reference's warm-up, reference gmrf.py:95-100), then run
    ``n_sweeps`` coordinate Gibbs sweeps per column (the reference thins one Gibbs
    chain by 10; here each replicate column gets an independent thinned chain, which
    vectorizes and yields uncorrelated columns). Columns whose rejection phase does
    not accept within ``init_max_iter`` rounds (strong truncation -- exactly the
    regime Gibbs exists for) fall back to mu clipped into the box.
    method="Rejection": masked rejection sampling.

    schedule="auto" uses the chromatic red-black sweep for banded/diagonal Q
    (bw + 1 parallel steps per sweep instead of p sequential ones; same stationary
    distribution) and the lexicographic scan otherwise; "lex"/"red_black" force one.
    """
    if method == "Rejection":
        return sample_truncated_normal_rejection(key, mu, Q=Q, L=L, lower=lower, upper=upper, n=n)
    if method != "Gibbs":
        raise TypeError("method should be either Gibbs or Rejection")

    Qs = st.as_structured(Q) if Q is not None else None
    mu = jnp.asarray(mu)
    p = mu.shape[0]
    mu_col = mu.reshape(p, -1)[:, :1]
    if Qs is None:
        raise ValueError("Gibbs truncated sampling requires the precision Q")
    b = st.matvec(Qs, mu_col)
    lo = -jnp.inf if lower is None else lower
    hi = jnp.inf if upper is None else upper
    lo_col = jnp.broadcast_to(jnp.reshape(jnp.asarray(lo), (-1, 1)) if jnp.ndim(lo) else lo, (p, 1))
    hi_col = jnp.broadcast_to(jnp.reshape(jnp.asarray(hi), (-1, 1)) if jnp.ndim(hi) else hi, (p, 1))
    x0_clip = jnp.clip(mu_col, lo_col, hi_col)
    # Guard against infinite bounds producing NaN in clip of +-inf mu entries
    x0_clip = jnp.where(jnp.isfinite(x0_clip), x0_clip, 0.0)

    # exact rejection initialization (reference gmrf.py:95-100); bounded rounds, with
    # clip-init fallback for columns the rejection phase never accepted
    key, k_init = jax.random.split(key)
    init = sample_truncated_normal_rejection(
        k_init, mu_col, Q=Qs, L=L, lower=lower, upper=upper, n=n, max_iter=init_max_iter
    )
    in_box = jnp.all(jnp.logical_and(init >= lo_col, init <= hi_col), axis=0, keepdims=True)
    x0_cols = jnp.where(in_box, init, x0_clip)  # (p, n)

    if schedule == "auto":
        banded_like = isinstance(Qs, (st.Banded, st.Diagonal)) or (
            isinstance(Qs, st.Permuted) and isinstance(Qs.inner, (st.Banded, st.Diagonal))
        )
        schedule = "red_black" if banded_like else "lex"

    def one_column(k, x0):
        def sweep(x, kk):
            return gibbs_canonical_truncated_normal(
                kk, b, Qs, x, lower=lower, upper=upper, schedule=schedule
            ), None

        x_final, _ = lax.scan(sweep, x0[:, None], jax.random.split(k, n_sweeps))
        return x_final[:, 0]

    cols = jax.vmap(one_column)(jax.random.split(key, n), x0_cols.T)
    return cols.T


# ---------------------------------------------------------------------------
# RW1 precision builders
# ---------------------------------------------------------------------------


def precision_irregular(s: Array, banded: bool = True) -> StructuredOrArray:
    """First-order random-walk precision for irregular locations (reference gmrf.py:375-411).

    Q_ii = 1/del_{i-1} + 1/del_i (ends: one term); Q_{i,i+1} = -1/del_i.
    Returns a Banded (bw=1) matrix by default -- the TPU-native replacement for the
    reference's sparse.diags tridiagonal -- or a Dense matrix when banded=False.
    """
    s = jnp.asarray(s, dtype=jnp.result_type(float)).reshape(-1)
    if s.shape[0] <= 1:
        one = jnp.ones((1, 1), s.dtype)
        return st.Banded(one) if banded else one
    dr = 1.0 / jnp.diff(s)
    d0 = jnp.concatenate([dr[:1], dr[:-1] + dr[1:], dr[-1:]])
    if banded:
        off = jnp.concatenate([-dr, jnp.zeros((1,), s.dtype)])
        return st.Banded(jnp.stack([d0, off]))
    return jnp.diagflat(d0) - jnp.diagflat(dr, -1) - jnp.diagflat(dr, 1)


def precision_rw2(s: Array, banded: bool = True) -> StructuredOrArray:
    """Second-order random-walk (RW2) precision for irregular locations.

    Beyond the reference (which only builds RW1, gmrf.py:375-411): Q = D2' D2 with D2
    the second divided-difference operator, giving cubic-smoothing-spline-like priors.
    Pentadiagonal => Banded with bw=2, factored by the banded scan kernels.

    Row i of D2 (interior points): the classic three-point second-derivative stencil
        [2/(h0 (h0+h1)), -2/(h0 h1), 2/(h1 (h0+h1))]  with h0 = s_i - s_{i-1},
        h1 = s_{i+1} - s_i, scaled by sqrt of the local integration weight (h0+h1)/2.
    """
    s = jnp.asarray(s, dtype=jnp.result_type(float)).reshape(-1)
    n = s.shape[0]
    if n < 3:
        return precision_irregular(s, banded=banded)
    h0 = s[1:-1] - s[:-2]
    h1 = s[2:] - s[1:-1]
    w = jnp.sqrt((h0 + h1) / 2.0)
    r0 = w * 2.0 / (h0 * (h0 + h1))
    r1 = w * -2.0 / (h0 * h1)
    r2 = w * 2.0 / (h1 * (h0 + h1))
    # accumulate Q = sum_i r_i r_i' into pentadiagonal bands
    d0 = jnp.zeros(n).at[:-2].add(r0 * r0).at[1:-1].add(r1 * r1).at[2:].add(r2 * r2)
    d1 = jnp.zeros(n).at[:-2].add(r0 * r1).at[1:-1].add(r1 * r2)  # band[1, i] = Q[i+1, i]
    d2 = jnp.zeros(n).at[:-2].add(r0 * r2)  # band[2, i] = Q[i+2, i]
    if banded:
        return st.Banded(jnp.stack([d0, d1, d2]))
    out = jnp.diagflat(d0)
    out = out + jnp.diagflat(d1[: n - 1], -1) + jnp.diagflat(d1[: n - 1], 1)
    out = out + jnp.diagflat(d2[: n - 2], -2) + jnp.diagflat(d2[: n - 2], 2)
    return out


def precision_lattice(nx: int, ny: int, ridge: float = 1e-3) -> st.Permuted:
    """First-order intrinsic GMRF precision on an nx x ny lattice (5-point stencil).

    The canonical 2-D smoothing prior: Q = D'D over horizontal + vertical
    neighbor differences, plus ``ridge`` * I to make the intrinsic prior proper
    (the reference achieves the same via sparse.diags sums fed to SuperLU,
    reference gmrf.py:375-411 is the 1-D analog; 2-D has no reference builder but
    its sparse path accepts the pattern). Returns an RCM-permuted Banded matrix
    (bandwidth ~ min(nx, ny) after ordering) factored by the O(p * bw^2) band
    kernels.
    """
    import numpy as np  # host-side construction only
    import scipy.sparse as sp

    n = nx * ny
    idx = np.arange(n).reshape(nx, ny)
    rows = np.concatenate([idx[:-1, :].ravel(), idx[:, :-1].ravel()])
    cols = np.concatenate([idx[1:, :].ravel(), idx[:, 1:].ravel()])
    data = np.ones(rows.shape[0])
    W = sp.coo_matrix((data, (rows, cols)), shape=(n, n))
    W = W + W.T
    Q = sp.diags(np.asarray(W.sum(axis=1)).ravel() + ridge) - W
    out = st.from_sparse(Q.tocsr())
    if not isinstance(out, st.Permuted):  # degenerate sizes (1 x k lattices)
        out = st.permuted(out if isinstance(out, st.Banded) else st.Banded(jnp.atleast_2d(st.diag(out))), np.arange(n))
    return out


def precision_car(adjacency, rho: float = 0.95, ridge: float = 0.0) -> StructuredOrArray:
    """Conditional-autoregressive (CAR) precision Q = D - rho * W from an adjacency.

    ``adjacency``: scipy.sparse or dense 0/1 symmetric matrix W of an irregular
    spatial graph. Q = diag(degree) - rho * W (+ ridge * I), SPD for |rho| < 1.
    Returns the best structured representation via :func:`structured.from_sparse`
    (typically an RCM-permuted Banded matrix) -- the use case the reference serves
    with SuperLU on arbitrary sparsity (reference gmrf.py:489-520).
    """
    import numpy as np  # host-side construction only
    import scipy.sparse as sp

    W = sp.csr_matrix(adjacency).astype(np.float64)
    deg = np.asarray(W.sum(axis=1)).ravel()
    Q = sp.diags(deg + ridge) - rho * W
    return st.from_sparse(Q.tocsr())


def precision_temporal(time, unit_length: float = 1.0, banded: bool = True) -> StructuredOrArray:
    """Temporal RW1 precision from datetimes or seconds (reference gmrf.py:351-372).

    Accepts pandas DatetimeArray/DatetimeIndex, np.datetime64 arrays, or a plain array
    of seconds.
    """
    import numpy as np  # host-side preprocessing only

    t = np.asarray(time)
    if np.issubdtype(t.dtype, np.datetime64):
        secs = (t - t.min()) / np.timedelta64(1, "s")
    else:
        secs = t - t.min()
    return precision_irregular(jnp.asarray(secs, dtype=jnp.result_type(float)) / unit_length, banded=banded)
