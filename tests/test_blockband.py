"""MXU-blocked banded Cholesky (structured.BlockBand) parity vs dense linalg.

The scalar banded column scan crawls at lattice bandwidths (VERDICT r4 weak #2:
3.7 it/s on the 64 x 64 lattice smoother); Banded matrices with bw >=
_BLOCK_BW_MIN now factor into a BlockBand of (s, s) MXU blocks. These tests pin
the factor, the solves, the transposed matvec, diag/logdet, padding behavior
(p not a multiple of s), the q = 2 block-bandwidth case (bw > 64), vmap
batching, and the end-to-end canonical sampling path the NormalNormal sweep
uses (reference gmrf.py:167-198 semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st


def _random_banded(rng, p, bw):
    A = np.zeros((p, p))
    for j in range(bw + 1):
        v = rng.normal(0, 0.3, p - j)
        A += np.diag(v, -j) + (np.diag(v, j) if j else 0)
    A = A @ A.T * 0.1 + np.eye(p) * (bw + 2.0)
    mask = np.abs(np.subtract.outer(np.arange(p), np.arange(p))) <= bw
    A = A * mask
    bands = np.zeros((bw + 1, p))
    for j in range(bw + 1):
        bands[j, : p - j] = np.diag(A, -j)
    return A, st.Banded(jnp.asarray(bands, jnp.float32))


@pytest.mark.parametrize(
    "p,bw",
    [(50, 9), (100, 12), (200, 40), (300, 70), (64, 63), (65, 64)],
)
def test_blockband_factor_and_solves(rng, p, bw):
    A, B = _random_banded(rng, p, bw)
    f = st.cholesky(B)
    assert isinstance(f, st.BlockBand)
    Lref = np.linalg.cholesky(A)
    np.testing.assert_allclose(
        np.asarray(st.to_dense_lower(f)), Lref, atol=2e-3 * np.abs(Lref).max()
    )
    b = rng.normal(0, 1, (p, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(st.solve_lower(f, jnp.asarray(b))),
        np.linalg.solve(Lref, b),
        atol=2e-3 * np.abs(np.linalg.solve(Lref, b)).max(),
    )
    np.testing.assert_allclose(
        np.asarray(st.solve_upper_t(f, jnp.asarray(b))),
        np.linalg.solve(Lref.T, b),
        atol=5e-3 * np.abs(np.linalg.solve(Lref.T, b)).max(),
    )
    np.testing.assert_allclose(
        np.asarray(st.chol_matvec_t(f, jnp.asarray(b))),
        Lref.T @ b,
        atol=1e-4 * np.abs(Lref.T @ b).max(),
    )
    np.testing.assert_allclose(np.asarray(st.diag(f)), np.diag(Lref), rtol=1e-5)
    assert abs(float(st.chol_log_det(f)) - np.linalg.slogdet(A)[1]) < 1e-3
    # vector rhs round-trips through the same padding
    xv = np.asarray(st.solve_lower(f, jnp.asarray(b[:, 0])))
    np.testing.assert_allclose(xv, np.linalg.solve(Lref, b[:, 0]), atol=2e-3)


def test_blockband_cho_solve_vmap(rng):
    p, bw = 120, 15
    A, B = _random_banded(rng, p, bw)
    b = rng.normal(0, 1, (p, 2)).astype(np.float32)
    batch = jnp.stack([B.bands] * 4)
    out = jax.vmap(lambda bb: st.cho_solve(st.cholesky(st.Banded(bb)), jnp.asarray(b)))(batch)
    xr = np.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(out)[0], xr, atol=5e-3 * np.abs(xr).max())
    np.testing.assert_allclose(np.asarray(out)[3], xr, atol=5e-3 * np.abs(xr).max())


def test_blockband_canonical_sample_moments(rng, key):
    """sample_normal_canonical through the blocked factor: mean and covariance
    of many draws match Q^{-1} b and Q^{-1} (chain-level statistics, SURVEY §4)."""
    p, bw = 40, 10
    A, B = _random_banded(rng, p, bw)
    bvec = rng.normal(0, 1, (p, 1))
    n_draws = 4096
    keys = jax.random.split(key, n_draws)
    draws = jax.vmap(lambda k: gmrf.sample_normal_canonical(k, jnp.asarray(bvec, jnp.float32), Q=B))(keys)
    draws = np.asarray(draws).reshape(n_draws, p)
    mu = np.linalg.solve(A, bvec).ravel()
    sd = np.sqrt(np.diag(np.linalg.inv(A)))
    err = np.abs(draws.mean(0) - mu) / (sd / np.sqrt(n_draws))
    assert err.max() < 5.0, err.max()
    cov_err = np.abs(np.cov(draws.T) - np.linalg.inv(A)).max()
    assert cov_err < 0.2 * sd.max() ** 2


def test_blockband_permuted_roundtrip(rng):
    """Permuted(Banded bw >= 9) factors to Permuted(BlockBand); cho_solve maps
    original -> original coordinates (the lattice smoother path)."""
    p, bw = 90, 11
    A, B = _random_banded(rng, p, bw)
    perm = rng.permutation(p)
    P = st.permuted(B, perm)  # represents A_orig with A_orig[perm][:, perm] = A
    f = st.cholesky(P)
    assert isinstance(f, st.Permuted) and isinstance(f.inner, st.BlockBand)
    inv = np.argsort(perm)
    A_orig = A[inv][:, inv]
    b = rng.normal(0, 1, (p, 1)).astype(np.float32)
    x = np.asarray(st.cho_solve(f, jnp.asarray(b)))
    xr = np.linalg.solve(A_orig, b)
    np.testing.assert_allclose(x, xr, atol=5e-3 * np.abs(xr).max())


def test_blockband_intrinsic_clamp():
    """A rank-deficient (intrinsic RW1-like) precision stays finite through the
    blocked factor (pivot clamp parity with the scalar kernels)."""
    p = 60
    main = np.full(p, 2.0)
    main[0] = main[-1] = 1.0
    A = np.diag(main) - np.diag(np.ones(p - 1), -1) - np.diag(np.ones(p - 1), 1)
    # widen to bw=9 with zero bands so the blocked path triggers
    bands = np.zeros((10, p))
    bands[0] = main
    bands[1, : p - 1] = -1.0
    f = st.cholesky(st.Banded(jnp.asarray(bands, jnp.float32)))
    assert isinstance(f, st.BlockBand)
    L = np.asarray(st.to_dense_lower(f))
    assert np.isfinite(L).all()
