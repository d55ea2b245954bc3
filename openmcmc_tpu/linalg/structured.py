"""Structured symmetric positive-definite matrices for TPU-native GMRF linear algebra.

This module is the TPU replacement for the reference's scipy.sparse + SuperLU layer
(reference: /root/reference/src/openmcmc/gmrf.py:414-520 ``solve``/``cho_solve``/
``cholesky``/``sparse_cholesky``).  Instead of generic sparse matrices factored on the
host by SuperLU, we represent precision matrices by *structure*:

- :class:`Dense`    -- a full (p, p) SPD matrix; Cholesky/solves run batched on the MXU.
- :class:`Diagonal` -- a diagonal matrix held as its (p,) diagonal; all ops elementwise
  on the VPU (replaces ``sparse.diags`` usage, reference parameter.py:491-501).
- :class:`Banded`   -- a symmetric banded matrix with lower bandwidth ``bw`` stored as
  (bw+1, p) lower bands; Cholesky and triangular solves are O(p * bw^2) ``lax.scan``
  kernels that vectorize across thousands of chains under ``vmap`` (replaces SuperLU
  ``splu`` on the RW1 tridiagonal precisions, reference gmrf.py:489-520).

All types are registered pytrees so they can live inside jitted/vmapped/scanned code
and inside the MCMC state.  Operations are written for canonical un-batched shapes;
chain batching is obtained by ``jax.vmap`` at the driver level.

Band storage convention (lower bands, column-major within a band):
    bands[j, i] = A[i + j, i]   for j = 0..bw, valid when i + j < p (zero-padded tail).
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# MCMC kernels are numerically sensitive: pin matmuls to full float32 precision on the
# MXU (default TPU matmul precision is bfloat16-ish and loses ~3 decimal digits).
_PREC = lax.Precision.HIGHEST

# Dense matrices at or below this size use the unrolled smallmat kernels instead of the
# XLA linalg custom-calls: profiled on TPU, the cholesky/triangular_solve custom-calls
# serialize over large vmapped chain batches (~4 ms per call for 2048 x 20 x 20, ~200x
# the cost of the equivalent unrolled VPU arithmetic). At p = 40 (mMALA on a latent
# Poisson-GMRF field, examples/11) the custom-call path also COMPILES pathologically:
# 446 s vs 35 s unrolled, and runs 3.6x slower -- hence the limit sits at 64, beyond
# which unrolled trace size (O(p^2) ops) starts to dominate compile time instead.
# See linalg/smallmat.py.
_SMALL_DENSE_MAX = 64

# NEGATIVE RESULT (round 5): a blocked mid-size DENSE factorization (p/64
# trace-time steps of unrolled 64-block Cholesky + batched MXU panel updates,
# meant to dodge the custom-call batch serialization) was built and MEASURED
# on the expander-CAR conditional (p = 1024, 128 chains): 21.7 min compile and
# 6.4 s per 20-sweep run vs 0.9 s through jnp.linalg.cholesky. The unrolled
# inner kernels' full-panel residual updates re-read O(s * panel) per step, so
# HBM traffic grows ~64x over the factorization's working set and swamps what
# the custom-call serialization costs. Dense p > 64 therefore stays on the
# XLA custom calls; incompressible patterns should ride the spectral engine
# (see ordering.BadBandwidthWarning).


def mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Precision-pinned matrix multiply (a @ b) for use across the framework."""
    return jnp.matmul(a, b, precision=_PREC)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Dense:
    """Dense SPD matrix, shape (p, p)."""

    mat: jnp.ndarray

    def tree_flatten(self):
        return (self.mat,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.mat.shape


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Diagonal:
    """Diagonal matrix held as its diagonal, shape (p,)."""

    diag_: jnp.ndarray

    def tree_flatten(self):
        return (self.diag_,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        p = self.diag_.shape[-1]
        return (p, p)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Banded:
    """Symmetric banded SPD matrix with lower bandwidth bw, stored as (bw + 1, p) lower bands."""

    bands: jnp.ndarray

    def tree_flatten(self):
        return (self.bands,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def bw(self) -> int:
        return self.bands.shape[-2] - 1

    @property
    def shape(self):
        p = self.bands.shape[-1]
        return (p, p)


class _StaticPerm:
    """Hashable permutation wrapper for pytree aux_data.

    Keeping the permutation STATIC (not a traced leaf) lets ``add`` check
    same-permutation structure at trace time and lets XLA constant-fold the
    gathers into cheap layout permutes."""

    __slots__ = ("array", "inverse", "_hash")

    def __init__(self, array):
        self.array = np.asarray(array, np.int32)
        self.inverse = np.argsort(self.array).astype(np.int32)
        self._hash = hash(self.array.tobytes())

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return isinstance(other, _StaticPerm) and np.array_equal(self.array, other.array)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Permuted:
    """An SPD matrix with arbitrary sparsity held as a symmetric permutation of a
    banded (or diagonal) matrix: ``inner[i, j] == A[perm[i], perm[j]]``.

    This is the TPU-native replacement for the reference's general sparse support
    (SuperLU ``splu`` on any scipy.sparse pattern, reference gmrf.py:489-520): a
    bandwidth-reducing ordering (reverse Cuthill-McKee, see
    :func:`openmcmc_tpu.linalg.ordering.rcm_permutation`) computed once on the host
    at model-construction time maps the pattern to a small-bandwidth ``Banded``
    matrix, and every operation runs the O(p * bw^2) band kernels in permuted
    coordinates with constant-index gathers on entry/exit. Covers the canonical
    non-tridiagonal GMRFs (2-D lattice smoothers => bw ~ grid width after RCM,
    CAR models on irregular spatial graphs).

    A ``Permuted`` whose ``inner`` is a lower Cholesky factor represents the
    square root ``M = P^T L`` with ``M M^T = A`` (not itself triangular, but all
    sampling/solve identities hold: see solve_lower/solve_upper_t below).
    """

    inner: Union[Diagonal, Banded]
    perm: _StaticPerm

    def tree_flatten(self):
        return (self.inner,), self.perm

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    @property
    def shape(self):
        return self.inner.shape

    def permute(self, x: jnp.ndarray) -> jnp.ndarray:
        """Rows of x reordered into permuted (inner) coordinates."""
        return x[self.perm.array]

    def unpermute(self, x: jnp.ndarray) -> jnp.ndarray:
        """Rows of x reordered back into original coordinates."""
        return x[self.perm.inverse]


def permuted(inner, perm) -> Permuted:
    """Build a Permuted matrix from inner (Banded/Diagonal) and a permutation array."""
    return Permuted(inner, perm if isinstance(perm, _StaticPerm) else _StaticPerm(perm))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BlockBand:
    """Lower Cholesky factor of a Banded matrix in MXU-blocked form.

    ``blocks`` has shape (k, q + 1, s, s): ``blocks[c, j]`` is the (s, s) block
    ``L[c + j, c]`` of the factor partitioned into k block-rows of size s
    (p padded up to k * s with identity rows); q is the block bandwidth
    (q * s >= bw). Produced by :func:`cholesky` for Banded matrices with
    bw >= ``_BLOCK_BW_MIN``: the scalar column recurrence is a p-step
    sequential scan with O(bw^2) row work that crawls at lattice bandwidths
    (measured 3.7 it/s on the 64 x 64 lattice smoother, VERDICT r4), while the
    blocked recurrence runs p/s steps of (s, s) matmuls on the MXU.

    This type only ever represents a FACTOR -- it flows through solve_lower /
    solve_upper_t / chol_matvec_t / diag / chol_log_det / to_dense_lower, never
    through add/scale/matvec, exactly like Banded Cholesky factors do.
    """

    blocks: jnp.ndarray
    p: int

    def tree_flatten(self):
        return (self.blocks,), self.p

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    @property
    def shape(self):
        return (self.p, self.p)


Structured = Union[Dense, Diagonal, Banded, Permuted]

#: every structured matrix type, for isinstance checks across the framework
STRUCTURED_TYPES = (Dense, Diagonal, Banded, Permuted)

# Cholesky factors carry the same structure as the matrix they factor:
#   Dense   -> Dense lower-triangular
#   Diagonal-> Diagonal of sqrt entries
#   Banded  -> Banded lower factor in the same band storage
#   Permuted-> Permuted of the inner factor (a P^T L square root, see Permuted)


def as_structured(value) -> Structured:
    """Coerce a raw array (or structured matrix) to a Structured type.

    A 2-D square array becomes Dense; a 1-D array becomes Diagonal; structured
    values pass through; scipy.sparse matrices go through :func:`from_sparse`
    (RCM-permuted banded representation). Mirrors the reference's duck-typing of
    np.ndarray vs scipy.sparse state entries (reference gmrf.py:431-434).
    """
    if isinstance(value, STRUCTURED_TYPES):
        return value
    if _is_scipy_sparse(value):
        return from_sparse(value)
    arr = jnp.asarray(value)
    if arr.ndim == 2 and arr.shape[0] == arr.shape[1]:
        return Dense(arr)
    if arr.ndim == 1:
        return Diagonal(arr)
    raise TypeError(f"Cannot interpret array of shape {arr.shape} as a structured matrix")


def _is_scipy_sparse(value) -> bool:
    import sys

    sparse_mod = sys.modules.get("scipy.sparse")
    if sparse_mod is None:
        return False
    return sparse_mod.issparse(value)


def from_sparse(A, bw_limit_fraction: float = 0.5) -> Structured:
    """Convert a scipy.sparse SPD matrix to the best structured representation.

    The TPU-native replacement for the reference's SuperLU sparse path (reference
    gmrf.py:489-520): instead of a general sparse factorization, a host-side
    reverse Cuthill-McKee ordering reduces the pattern to a banded matrix factored
    by the O(p * bw^2) band kernels.  Selection:

    - diagonal pattern                  -> Diagonal
    - banded as given (small bw)        -> Banded
    - RCM-permuted bandwidth smaller    -> Permuted(Banded, perm)
    - bandwidth > bw_limit_fraction * p -> Dense (band kernels would not win; above
      p/2 the O(p * bw^2) scan loses to the O(p^3) batched dense kernel)
    """
    from openmcmc_tpu.linalg import ordering

    return ordering.structured_from_sparse(A, bw_limit_fraction=bw_limit_fraction)


def dim(a: Structured) -> int:
    """Matrix dimension p."""
    if isinstance(a, Dense):
        return a.mat.shape[-1]
    if isinstance(a, Diagonal):
        return a.diag_.shape[-1]
    if isinstance(a, Permuted):
        return dim(a.inner)
    if isinstance(a, BlockBand):
        return a.p
    return a.bands.shape[-1]


def _diag_embed_offset(band: jnp.ndarray, p: int, k: int) -> jnp.ndarray:
    """Scatter-free diagflat(band, k): eye-mask times broadcast band.

    ``jnp.diagflat`` of a traced vector lowers to an XLA scatter, which under vmap
    becomes a serialized per-batch-element loop on TPU; the eye-mask product is one
    vectorized multiply. band is (p,) with the out-of-range tail ignored by the mask.
    """
    eye_k = jnp.eye(p, k=k, dtype=band.dtype)
    if k <= 0:
        return eye_k * band[None, :]  # M[b - k, b] = band[b]
    return eye_k * band[:, None]  # M[a, a + k] = band[a]


def to_dense(a: Structured) -> jnp.ndarray:
    """Materialize as a (p, p) dense array (scatter-free, vmap-safe)."""
    if isinstance(a, Dense):
        return a.mat
    if isinstance(a, Permuted):
        inv = a.perm.inverse
        return to_dense(a.inner)[inv][:, inv]
    if isinstance(a, Diagonal):
        p = a.diag_.shape[-1]
        return _diag_embed_offset(a.diag_, p, 0)
    p = dim(a)
    out = _diag_embed_offset(a.bands[0], p, 0)
    for j in range(1, a.bw + 1):
        out = out + _diag_embed_offset(a.bands[j], p, -j) + _diag_embed_offset(a.bands[j], p, j)
    return out


def to_dense_lower(chol: Structured) -> jnp.ndarray:
    """Materialize a (possibly permuted) structured Cholesky factor as a dense array.

    For ``Permuted`` the result is the square root M = P^T L (rows unpermuted),
    which is not triangular but satisfies M M^T = A."""
    if isinstance(chol, Dense):
        return chol.mat
    if isinstance(chol, Permuted):
        return to_dense_lower(chol.inner)[chol.perm.inverse]
    if isinstance(chol, Diagonal):
        return _diag_embed_offset(chol.diag_, chol.diag_.shape[-1], 0)
    if isinstance(chol, BlockBand):
        return _blockband_to_dense_lower(chol)
    p = dim(chol)
    out = _diag_embed_offset(chol.bands[0], p, 0)
    for j in range(1, chol.bw + 1):
        out = out + _diag_embed_offset(chol.bands[j], p, -j)
    return out


def diag(a: Structured) -> jnp.ndarray:
    """Main diagonal, shape (p,)."""
    if isinstance(a, Dense):
        return jnp.diagonal(a.mat, axis1=-2, axis2=-1)
    if isinstance(a, Diagonal):
        return a.diag_
    if isinstance(a, Permuted):
        return a.unpermute(diag(a.inner))
    if isinstance(a, BlockBand):
        return _blockband_diag(a)
    return a.bands[0]


def scale(c, a: Structured) -> Structured:
    """c * A for a (possibly traced) scalar c."""
    c = jnp.asarray(c).reshape(())
    if isinstance(a, Dense):
        return Dense(c * a.mat)
    if isinstance(a, Diagonal):
        return Diagonal(c * a.diag_)
    if isinstance(a, Permuted):
        return Permuted(scale(c, a.inner), a.perm)
    return Banded(c * a.bands)


def _banded_from_diagonal(d: Diagonal, bw: int) -> Banded:
    p = d.diag_.shape[-1]
    bands = jnp.zeros((bw + 1, p), d.diag_.dtype).at[0].set(d.diag_)
    return Banded(bands)


def add(a: Structured, b: Structured) -> Structured:
    """A + B, promoting to the least-dense structure able to represent the sum."""
    # Dense wins
    if isinstance(a, Dense) or isinstance(b, Dense):
        return Dense(to_dense(a) + to_dense(b))
    # Permuted stays permuted when the other operand is diagonal (permutation-
    # invariant up to reordering its entries) or shares the same permutation;
    # mixed permutations / plain banded operands densify.
    if isinstance(a, Permuted) or isinstance(b, Permuted):
        if isinstance(b, Permuted) and not isinstance(a, Permuted):
            a, b = b, a
        if isinstance(b, Diagonal):
            return Permuted(add(a.inner, Diagonal(a.permute(b.diag_))), a.perm)
        if isinstance(b, Permuted) and a.perm == b.perm:
            return Permuted(add(a.inner, b.inner), a.perm)
        return Dense(to_dense(a) + to_dense(b))
    if isinstance(a, Diagonal) and isinstance(b, Diagonal):
        return Diagonal(a.diag_ + b.diag_)
    # At least one Banded, none Dense
    if isinstance(a, Diagonal):
        a = _banded_from_diagonal(a, b.bw)
    if isinstance(b, Diagonal):
        b = _banded_from_diagonal(b, a.bw)
    bw = max(a.bw, b.bw)
    pa = jnp.pad(a.bands, ((0, bw - a.bw), (0, 0)))
    pb = jnp.pad(b.bands, ((0, bw - b.bw), (0, 0)))
    return Banded(pa + pb)


def matvec(a: Structured, x: jnp.ndarray) -> jnp.ndarray:
    """A @ x for x of shape (p,) or (p, n)."""
    if isinstance(a, Dense):
        return mm(a.mat, x)
    if isinstance(a, Permuted):
        return a.unpermute(matvec(a.inner, a.permute(x)))
    if isinstance(a, Diagonal):
        d = a.diag_ if x.ndim == 1 else a.diag_[:, None]
        return d * x
    # symmetric banded: y[i] = b0[i] x[i] + sum_j bands[j,i] x[i+j] + bands[j,i-j] x[i-j]
    bands = a.bands
    vec = x.ndim == 1
    if vec:
        x = x[:, None]
    y = bands[0][:, None] * x
    p = x.shape[0]
    for j in range(1, a.bw + 1):
        bj = bands[j][:, None]
        # upper part: y[i] += bands[j, i] * x[i + j]  (valid i < p - j)
        x_up = jnp.concatenate([x[j:], jnp.zeros((j, x.shape[1]), x.dtype)], axis=0)
        y = y + bj * x_up
        # lower part: y[i] += bands[j, i - j] * x[i - j] (valid i >= j)
        contrib = bj * x  # value that lands at row i + j
        y = y + jnp.concatenate([jnp.zeros((j, x.shape[1]), x.dtype), contrib[: p - j]], axis=0)
    return y[:, 0] if vec else y


def row_dot(a: Structured, i, x: jnp.ndarray) -> jnp.ndarray:
    """Dot product of row i of A with x (x shape (p,) or (p, 1)) -> scalar array.

    Used by the sequential truncated-normal Gibbs sweep (reference gmrf.py:254-266).
    """
    xf = x.reshape(-1)
    if isinstance(a, Dense):
        row = lax.dynamic_slice_in_dim(a.mat, i, 1, axis=0)[0]
        return jnp.dot(row, xf, precision=_PREC)
    if isinstance(a, Permuted):
        # row i of A is row invperm[i] of inner, against permuted x
        return row_dot(a.inner, jnp.asarray(a.perm.inverse)[i], a.permute(xf))
    if isinstance(a, Diagonal):
        return a.diag_[i] * xf[i]
    # banded: entries at columns i-j (bands[j, i-j]) and i+j (bands[j, i]), plus diag.
    p = xf.shape[0]
    total = a.bands[0, i] * xf[i]
    for j in range(1, a.bw + 1):
        up_ok = (i + j) < p
        lo_ok = (i - j) >= 0
        iu = jnp.minimum(i + j, p - 1)
        il = jnp.maximum(i - j, 0)
        total = total + jnp.where(up_ok, a.bands[j, i] * xf[iu], 0.0)
        total = total + jnp.where(lo_ok, a.bands[j, il] * xf[il], 0.0)
    return total


# ---------------------------------------------------------------------------
# Cholesky factorizations
# ---------------------------------------------------------------------------


def cholesky(a: Structured) -> Structured:
    """Lower Cholesky factor, in the same structure as the input.

    Dense uses the batched MXU kernel via jnp.linalg.cholesky; Diagonal is a sqrt;
    Banded runs an O(p * bw^2) lax.scan recurrence that vectorizes across chains --
    except tridiagonal (bw=1), which uses a log-depth associative scan (7 levels for
    p=100 instead of 100 sequential steps; the hot path of every GMRF sweep).
    (TPU-native replacement for reference gmrf.py:465-520.)
    """
    if isinstance(a, Dense):
        if a.mat.shape[-1] <= _SMALL_DENSE_MAX:
            from openmcmc_tpu.linalg import smallmat as _sm

            return Dense(_sm.cholesky_small(a.mat))
        return Dense(jnp.linalg.cholesky(a.mat))
    if isinstance(a, Diagonal):
        return Diagonal(jnp.sqrt(a.diag_))
    if isinstance(a, Permuted):
        # factor in permuted coordinates: A = P^T (L L^T) P, square root M = P^T L
        return Permuted(cholesky(a.inner), a.perm)
    if a.bw == 1:
        return Banded(_tridiag_cholesky(a.bands))
    if a.bw >= _BLOCK_BW_MIN:
        return _banded_cholesky_blocked(a.bands)
    return Banded(_banded_cholesky(a.bands))


def _tridiag_cholesky(bands: jnp.ndarray) -> jnp.ndarray:
    """Tridiagonal Cholesky via an associative scan over Moebius transforms.

    The diagonal recurrence d_i = a_i - c_{i-1}^2 / d_{i-1} is a composition of linear
    fractional transforms; representing each as the 2x2 matrix [[a_i, -c_{i-1}^2],
    [1, 0]] turns the prefix into an associative matrix product, evaluated in
    O(log p) parallel levels. Products are renormalized per combine (the ratio
    defining d_i is scale-invariant) so f32 never overflows.
    """
    a = bands[0]
    c = bands[1]
    p = a.shape[-1]
    csq_prev = jnp.concatenate([jnp.zeros_like(c[..., :1]), (c * c)[..., : p - 1]], axis=-1)
    # 2x2 Moebius matrices [[a, -csq_prev], [1, 0]] kept as four component arrays:
    # explicit elementwise products (VPU) -- a (..,2,2) matmul would pad onto full
    # MXU tiles and run ~100x slower.
    m00, m01 = a, -csq_prev
    m10, m11 = jnp.ones_like(a), jnp.zeros_like(a)

    def combine(x, y):
        x00, x01, x10, x11 = x
        y00, y01, y10, y11 = y
        z00 = y00 * x00 + y01 * x10
        z01 = y00 * x01 + y01 * x11
        z10 = y10 * x00 + y11 * x10
        z11 = y10 * x01 + y11 * x11
        norm = jnp.maximum(jnp.maximum(jnp.abs(z00), jnp.abs(z01)), jnp.maximum(jnp.abs(z10), jnp.abs(z11)))
        norm = jnp.maximum(norm, 1e-30)
        return z00 / norm, z01 / norm, z10 / norm, z11 / norm

    s00, _, s10, _ = lax.associative_scan(combine, (m00, m01, m10, m11), axis=m00.ndim - 1)
    d = s00 / s10
    # pivot clamp (same convention as the fused kernels): an INTRINSIC prior --
    # e.g. the unridged RW1 precision -- has one numerically-zero final pivot,
    # which f32 can round slightly negative; clamping keeps the factor (and the
    # logdet pseudo-constant feeding Model.log_p) finite instead of NaN. A truly
    # indefinite input shows up as a huge-negative logdet, not silent success.
    l_diag = jnp.sqrt(jnp.maximum(d, 1e-30))
    l_off = jnp.where(jnp.arange(p) < p - 1, c / l_diag, jnp.zeros_like(c))
    return jnp.stack([l_diag, l_off], axis=-2)


def _affine_scan(alpha: jnp.ndarray, beta: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """Solve x_i = alpha_i x_{i-1} + beta_i (x_{-1}=0) by associative prefix scan.

    alpha: (p,), beta: (p, n). The pair composition
    (a2, b2) o (a1, b1) = (a2*a1, a2*b1 + b2) is associative; log-depth evaluation
    replaces the O(p) sequential substitution."""

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a2 * a1, a2[..., None] * b1 + b2

    alphas, betas = lax.associative_scan(combine, (alpha, beta), axis=alpha.ndim - 1, reverse=reverse)
    return betas


def _banded_cholesky(bands: jnp.ndarray) -> jnp.ndarray:
    """Banded Cholesky: lower band storage in, lower band storage of L out.

    Column recurrence (scan over columns i):
        L[i, i]     = sqrt(A[i, i] - sum_m L[i, i-1-m]^2)
        L[i+j, i]   = (A[i+j, i] - sum_m L[i+j, i-1-m] * L[i, i-1-m]) / L[i, i]
    The carry holds the band-storage columns of the last bw columns of L.
    """
    bw = bands.shape[0] - 1
    p = bands.shape[-1]
    dtype = bands.dtype
    if bw == 0:
        return jnp.sqrt(bands)

    m_idx = jnp.arange(bw)
    j_idx = jnp.arange(1, bw + 1)

    def step(w, inp):
        # w: (bw, bw+1) band-columns of L for columns i-1, i-2, ..., i-bw
        i, a_col = inp
        wp = jnp.pad(w, ((0, 0), (0, bw)))  # room to index up to 2*bw
        lik = wp[m_idx, 1 + m_idx]  # L[i, i-1-m]
        s0 = jnp.sum(lik * lik)
        # pivot clamp: see _tridiag_cholesky (intrinsic priors stay finite)
        d = jnp.sqrt(jnp.maximum(a_col[0] - s0, 1e-30))
        # cross[j-1, m] = L[i+j, i-1-m]
        cross = wp[m_idx[None, :], j_idx[:, None] + 1 + m_idx[None, :]]
        sj = mm(cross, lik)
        off = (a_col[1:] - sj) / d
        # zero out entries that fall outside the matrix (i + j >= p)
        valid = (i + j_idx) < p
        off = jnp.where(valid, off, jnp.zeros_like(off))
        col = jnp.concatenate([d[None], off])
        w_new = jnp.concatenate([col[None, :], w[:-1]], axis=0) if bw > 1 else col[None, :]
        return w_new, col

    w0 = jnp.zeros((bw, bw + 1), dtype)
    _, cols = lax.scan(step, w0, (jnp.arange(p), bands.T))
    return cols.T


# ---------------------------------------------------------------------------
# MXU-blocked banded Cholesky (bw >= _BLOCK_BW_MIN)
# ---------------------------------------------------------------------------

# Above this bandwidth the scalar column scan (p steps, O(bw^2) VPU row work) is
# replaced by the block recurrence (p/s steps of (s, s) MXU matmuls). Below it
# the scalar scan's tiny steps beat block setup; tridiagonal keeps its log-depth
# associative scan.
_BLOCK_BW_MIN = 9


def _block_size(bw: int) -> int:
    """Block size s: the smallest multiple of 8 covering bw, capped at 32.

    s >= bw makes the matrix block-TRIdiagonal (q = 1); past the cap the block
    bandwidth q = ceil(bw / s) grows instead. The cap is measured, not
    aesthetic: the unrolled (s, s) smallmat kernels do full-matrix rank-1
    updates per column, so their memory traffic grows ~s^3 per block while the
    extra cross-block matmuls at higher q ride the MXU -- on the 64 x 64
    lattice conditional (bw = 64, 256 chains) cap 64 ran 141 ms per
    factor+solve, cap 32 ran 44 ms, cap 16 ran 46 ms."""
    return min(32, 8 * -(-bw // 8))


def _band_to_blocks(bands: jnp.ndarray, s: int):
    """Partition band storage (bw+1, p) into (k, q+1, s, s) lower block storage.

    out[c, m] = A[c + m, c] as s x s blocks, p padded to k * s with identity
    rows (the padding factors to identity and decouples from the real rows).
    Index arrays are static, so the gathers constant-fold at compile time.
    """
    bw = bands.shape[0] - 1
    p = bands.shape[-1]
    q = -(-bw // s)
    k = -(-p // s)
    p_pad = k * s
    bp = jnp.pad(bands, ((0, (q + 1) * s - bands.shape[0]), (0, p_pad - p)))
    if p_pad > p:
        bp = bp.at[0, p:].set(jnp.ones((p_pad - p,), bands.dtype))
    bpr = bp.reshape((q + 1) * s, k, s)
    a_i = np.arange(s)[:, None]
    b_i = np.arange(s)[None, :]
    bb = np.broadcast_to(b_i, (s, s))
    # A[c*s + a + m*s, c*s + b] = bands[m*s + a - b, c*s + b]
    out = []
    for m in range(q + 1):
        idx = m * s + a_i - b_i  # (s, s) static
        valid = (idx >= 0) & (idx <= bw)
        g = bpr[np.clip(idx, 0, (q + 1) * s - 1), :, bb]  # (s, s, k)
        g = jnp.where(jnp.asarray(valid)[..., None], g, 0.0)
        blk = jnp.moveaxis(g, -1, 0)  # (k, s, s)
        if m == 0:
            # stored lower triangle only; symmetrize the diagonal block
            diag_part = jnp.eye(s, dtype=bands.dtype) * jnp.diagonal(blk, axis1=-2, axis2=-1)[..., None, :]
            blk = blk + jnp.swapaxes(blk, -1, -2) - diag_part
        out.append(blk)
    return jnp.stack(out, axis=1), q, k  # (k, q+1, s, s)


def _banded_cholesky_blocked(bands: jnp.ndarray) -> "BlockBand":
    """Block-banded Cholesky: scan over block-columns, (s, s) MXU ops per step.

    Block recurrence (block-column c; L[c, c-m] lives in earlier columns):
        S        = A[c, c] - sum_{m=1..q} L[c, c-m] L[c, c-m]^T
        L[c, c]  = chol(S)
        L[c+j, c]= (A[c+j, c] - sum_{m=1..q-j} L[c+j, c-m] L[c, c-m]^T) L[c, c]^{-T}
    The carry holds the last q factor block-columns.
    """
    from openmcmc_tpu.linalg import smallmat as _sm

    bw = bands.shape[0] - 1
    p = bands.shape[-1]
    s = _block_size(bw)
    acols, q, k = _band_to_blocks(bands, s)

    def step(w, a_col):
        # w: (q, q+1, s, s) factor block-columns c-1 .. c-q
        S = a_col[0]
        for m in range(1, q + 1):
            lcm = w[m - 1, m]
            S = S - mm(lcm, jnp.swapaxes(lcm, -1, -2))
        l_c = _sm.cholesky_small(S, clamp=1e-30)
        cols = [l_c]
        for j in range(1, q + 1):
            r = a_col[j]
            for m in range(1, q - j + 1):
                r = r - mm(w[m - 1, m + j], jnp.swapaxes(w[m - 1, m], -1, -2))
            # C = R L^{-T}  <=>  L C^T = R^T (forward substitution)
            c_blk = jnp.swapaxes(_sm.solve_lower_small(l_c, jnp.swapaxes(r, -1, -2)), -1, -2)
            cols.append(c_blk)
        col = jnp.stack(cols)
        w_new = jnp.concatenate([col[None], w[:-1]], axis=0) if q > 1 else col[None]
        return w_new, col

    w0 = jnp.zeros((q, q + 1, s, s), bands.dtype)
    _, cols = lax.scan(step, w0, acols)
    return BlockBand(cols, p)


def _blockband_rhs(f: "BlockBand", b: jnp.ndarray):
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    k, _, s, _ = f.blocks.shape
    bp = jnp.pad(b, ((0, k * s - f.p), (0, 0))).reshape(k, s, b.shape[1])
    return bp, vec


def _blockband_out(f: "BlockBand", xs: jnp.ndarray, vec: bool):
    k, _, s, _ = f.blocks.shape
    out = xs.reshape(k * s, -1)[: f.p]
    return out[:, 0] if vec else out


def _blockband_solve_lower(f: "BlockBand", b: jnp.ndarray) -> jnp.ndarray:
    """Forward substitution by block rows: p/s scan steps of (s, s) matmuls."""
    from openmcmc_tpu.linalg import smallmat as _sm

    bp, vec = _blockband_rhs(f, b)
    k, q1, s, _ = f.blocks.shape
    q = q1 - 1
    n = bp.shape[-1]

    def step(carry, inp):
        xs, cols = carry  # xs[m-1] = x_{c-m}; cols[m-1] = factor column c-m
        col_c, b_c = inp
        acc = b_c
        for m in range(1, q + 1):
            acc = acc - mm(cols[m - 1, m], xs[m - 1])
        x_c = _sm.solve_lower_small(col_c[0], acc)
        xs_new = jnp.concatenate([x_c[None], xs[:-1]], axis=0) if q > 1 else x_c[None]
        cols_new = jnp.concatenate([col_c[None], cols[:-1]], axis=0) if q > 1 else col_c[None]
        return (xs_new, cols_new), x_c

    carry0 = (jnp.zeros((q, s, n), bp.dtype), jnp.zeros((q, q1, s, s), f.blocks.dtype))
    _, xs = lax.scan(step, carry0, (f.blocks, bp))
    return _blockband_out(f, xs, vec)


def _blockband_solve_upper_t(f: "BlockBand", b: jnp.ndarray) -> jnp.ndarray:
    """Back substitution on L^T by block rows (reverse scan); every needed block
    L[c+j, c] lives in block-column c itself, so only the x carry is needed."""
    from openmcmc_tpu.linalg import smallmat as _sm

    bp, vec = _blockband_rhs(f, b)
    k, q1, s, _ = f.blocks.shape
    q = q1 - 1
    n = bp.shape[-1]

    def step(xs, inp):
        # xs[j-1] = x_{c+j}
        col_c, b_c = inp
        acc = b_c
        for j in range(1, q + 1):
            acc = acc - mm(jnp.swapaxes(col_c[j], -1, -2), xs[j - 1])
        x_c = _sm.solve_upper_small(jnp.swapaxes(col_c[0], -1, -2), acc)
        xs_new = jnp.concatenate([x_c[None], xs[:-1]], axis=0) if q > 1 else x_c[None]
        return xs_new, x_c

    xs0 = jnp.zeros((q, s, n), bp.dtype)
    _, xs = lax.scan(step, xs0, (f.blocks, bp), reverse=True)
    return _blockband_out(f, xs, vec)


def _blockband_matvec_t(f: "BlockBand", x: jnp.ndarray) -> jnp.ndarray:
    """(L^T x)_c = L[c, c]^T x_c + sum_j L[c+j, c]^T x_{c+j} -- no scan, one
    batched (k, s, s) x (k, s, n) matmul per block diagonal."""
    xp, vec = _blockband_rhs(f, x)
    k, q1, s, _ = f.blocks.shape
    y = mm(jnp.swapaxes(f.blocks[:, 0], -1, -2), xp)
    for j in range(1, q1):
        x_shift = jnp.concatenate([xp[j:], jnp.zeros((j, s, xp.shape[-1]), xp.dtype)], axis=0)
        y = y + mm(jnp.swapaxes(f.blocks[:, j], -1, -2), x_shift)
    return _blockband_out(f, y, vec)


def _blockband_diag(f: "BlockBand") -> jnp.ndarray:
    return jnp.diagonal(f.blocks[:, 0], axis1=-2, axis2=-1).reshape(-1)[: f.p]


def _blockband_to_dense_lower(f: "BlockBand") -> jnp.ndarray:
    k, q1, s, _ = f.blocks.shape
    out = jnp.zeros((k * s, k * s), f.blocks.dtype)
    for c in range(k):
        for j in range(q1):
            if c + j < k:
                out = out.at[(c + j) * s : (c + j + 1) * s, c * s : (c + 1) * s].set(f.blocks[c, j])
    return out[: f.p, : f.p]


# ---------------------------------------------------------------------------
# Triangular solves against a lower Cholesky factor
# ---------------------------------------------------------------------------


def solve_lower(chol: Structured, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L w = b for lower-triangular structured L; b is (p,) or (p, n).

    For a ``Permuted`` factor M = P^T L this solves M w = b, i.e.
    w = L^{-1} (P b); the result lives in permuted coordinates, and only the
    rotation-invariant uses (quadratic forms ||w||^2, or a following
    ``solve_upper_t`` which un-permutes) are meaningful -- exactly how cho_solve
    and the density kernels consume it."""
    if isinstance(chol, Permuted):
        return solve_lower(chol.inner, chol.permute(b))
    if isinstance(chol, Dense):
        if chol.mat.shape[-1] <= _SMALL_DENSE_MAX:
            from openmcmc_tpu.linalg import smallmat as _sm

            vec = b.ndim == 1
            out = _sm.solve_lower_small(chol.mat, b[:, None] if vec else b)
            return out[:, 0] if vec else out
        return jax.scipy.linalg.solve_triangular(chol.mat, b, lower=True)
    if isinstance(chol, Diagonal):
        d = chol.diag_ if b.ndim == 1 else chol.diag_[:, None]
        return b / d
    if isinstance(chol, BlockBand):
        return _blockband_solve_lower(chol, b)
    return _banded_solve_lower(chol.bands, b)


def solve_upper_t(chol: Structured, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = b for lower-triangular structured L; b is (p,) or (p, n).

    For a ``Permuted`` factor M = P^T L this solves M^T x = b (b in permuted
    coordinates, as produced by ``solve_lower``), returning x in ORIGINAL
    coordinates: x = P^T L^{-T} b. Composition cho_solve = solve_upper_t o
    solve_lower therefore maps original -> original, and x = solve_upper_t(M, z)
    for iid z has covariance A^{-1} exactly as in the unpermuted case."""
    if isinstance(chol, Permuted):
        return chol.unpermute(solve_upper_t(chol.inner, b))
    if isinstance(chol, Dense):
        if chol.mat.shape[-1] <= _SMALL_DENSE_MAX:
            from openmcmc_tpu.linalg import smallmat as _sm

            vec = b.ndim == 1
            out = _sm.solve_upper_small(jnp.swapaxes(chol.mat, -1, -2), b[:, None] if vec else b)
            return out[:, 0] if vec else out
        return jax.scipy.linalg.solve_triangular(chol.mat, b, lower=True, trans=1)
    if isinstance(chol, Diagonal):
        d = chol.diag_ if b.ndim == 1 else chol.diag_[:, None]
        return b / d
    if isinstance(chol, BlockBand):
        return _blockband_solve_upper_t(chol, b)
    return _banded_solve_upper_t(chol.bands, b)


def _band_rows(bands: jnp.ndarray) -> jnp.ndarray:
    """Row storage R[j, i] = L[i, i-j] from column storage C[j, i] = L[i+j, i]."""
    bw = bands.shape[0] - 1
    rows = [bands[0]]
    for j in range(1, bw + 1):
        rows.append(jnp.concatenate([jnp.zeros((j,), bands.dtype), bands[j, : bands.shape[-1] - j]]))
    return jnp.stack(rows)


def _banded_solve_lower(bands: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Forward substitution: x[i] = (b[i] - sum_j L[i, i-j] x[i-j]) / L[i, i].

    Tridiagonal (bw=1) uses the log-depth affine associative scan."""
    bw = bands.shape[0] - 1
    if bw == 0:
        return b / (bands[0] if b.ndim == 1 else bands[0][:, None])
    if bw == 1:
        vec = b.ndim == 1
        rhs = b[:, None] if vec else b
        d = bands[0]
        l_prev = jnp.concatenate([jnp.zeros_like(bands[1][..., :1]), bands[1][..., :-1]], axis=-1)
        alpha = -l_prev / d
        beta = rhs / d[..., :, None]
        x = _affine_scan(alpha, beta, reverse=False)
        return x[:, 0] if vec else x
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    n = b.shape[1]
    rows = _band_rows(bands)  # (bw+1, p)

    def step(carry, inp):
        # carry: (bw, n) previous x values, carry[m] = x[i-1-m]
        row, rhs = inp  # row: (bw+1,), rhs: (n,)
        acc = rhs - mm(row[1:], carry)  # sum over j=1..bw of L[i, i-j] * x[i-j]
        x_i = acc / row[0]
        new = jnp.concatenate([x_i[None, :], carry[:-1]], axis=0) if bw > 1 else x_i[None, :]
        return new, x_i

    c0 = jnp.zeros((bw, n), b.dtype)
    _, xs = lax.scan(step, c0, (rows.T, b))
    return xs[:, 0] if vec else xs


def _banded_solve_upper_t(bands: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Back substitution on L^T: x[i] = (b[i] - sum_j L[i+j, i] x[i+j]) / L[i, i].

    Tridiagonal (bw=1) uses the log-depth affine associative scan (reversed)."""
    bw = bands.shape[0] - 1
    if bw == 0:
        return b / (bands[0] if b.ndim == 1 else bands[0][:, None])
    if bw == 1:
        vec = b.ndim == 1
        rhs = b[:, None] if vec else b
        d = bands[0]
        alpha = -bands[1] / d  # x_i = -(c_i/d_i) x_{i+1} + b_i/d_i; c_{p-1} is 0-padded
        beta = rhs / d[..., :, None]
        x = _affine_scan(alpha, beta, reverse=True)
        return x[:, 0] if vec else x
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    n = b.shape[1]

    def step(carry, inp):
        # carry[m] = x[i+1+m]
        col, rhs = inp  # col: (bw+1,) band column i of L
        acc = rhs - mm(col[1:], carry)
        x_i = acc / col[0]
        new = jnp.concatenate([x_i[None, :], carry[:-1]], axis=0) if bw > 1 else x_i[None, :]
        return new, x_i

    c0 = jnp.zeros((bw, n), b.dtype)
    _, xs = lax.scan(step, c0, (bands.T, b), reverse=True)
    return xs[:, 0] if vec else xs


def chol_log_det(chol: Structured) -> jnp.ndarray:
    """log det(Q) = 2 * sum(log diag(L)) for lower Cholesky factor L of Q."""
    return 2.0 * jnp.sum(jnp.log(diag(chol)))


def chol_matvec_t(chol: Structured, x: jnp.ndarray) -> jnp.ndarray:
    """L^T @ x for lower-triangular structured L; x is (p,) or (p, n).

    For a ``Permuted`` factor M = P^T L this is M^T x = L^T (P x), in permuted
    coordinates -- consumed only through the rotation-invariant quadratic form
    ||M^T r||^2 = r^T A r (mvn_log_pdf, proposal densities)."""
    if isinstance(chol, Permuted):
        return chol_matvec_t(chol.inner, chol.permute(x))
    if isinstance(chol, Dense):
        return mm(jnp.swapaxes(chol.mat, -1, -2), x)
    if isinstance(chol, Diagonal):
        d = chol.diag_ if x.ndim == 1 else chol.diag_[:, None]
        return d * x
    if isinstance(chol, BlockBand):
        return _blockband_matvec_t(chol, x)
    # (L^T)[i, i+j] = C[j, i]
    bands = chol.bands
    vec = x.ndim == 1
    if vec:
        x = x[:, None]
    y = bands[0][:, None] * x
    for j in range(1, bands.shape[0]):
        x_up = jnp.concatenate([x[j:], jnp.zeros((j, x.shape[1]), x.dtype)], axis=0)
        y = y + bands[j][:, None] * x_up
    return y[:, 0] if vec else y


def cho_solve(chol: Structured, b: jnp.ndarray) -> jnp.ndarray:
    """Solve Q x = b given the lower Cholesky factor of Q (reference gmrf.py:437-462)."""
    return solve_upper_t(chol, solve_lower(chol, b))


def solve(a: Structured, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for SPD structured A (reference gmrf.py:414-434)."""
    return cho_solve(cholesky(a), b)
