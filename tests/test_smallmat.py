"""Unrolled small-matrix kernels vs jnp.linalg (reference: the numpy calls they
replace, e.g. np.linalg.cholesky/solve/slogdet in reference sampler/reversible_jump.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmcmc_tpu.linalg import smallmat as sm


@pytest.fixture(params=[1, 3, 8, 20, 40, 64])
def p(request):
    return request.param


def _spd(key, batch, p):
    A = jax.random.normal(key, (batch, p, p))
    return jnp.einsum("bij,bkj->bik", A, A) / p + 2.0 * jnp.eye(p)


def test_cholesky_small_matches_linalg(p):
    A = _spd(jax.random.PRNGKey(0), 7, p)
    L = sm.cholesky_small(A)
    L_ref = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), rtol=2e-5, atol=2e-5)


def test_triangular_solves(p):
    key = jax.random.PRNGKey(1)
    A = _spd(key, 5, p)
    L = jnp.linalg.cholesky(A)
    b = jax.random.normal(jax.random.PRNGKey(2), (5, p, 3))
    x = sm.solve_lower_small(L, b)
    np.testing.assert_allclose(np.asarray(L @ x), np.asarray(b), rtol=1e-4, atol=1e-4)
    U = jnp.swapaxes(L, -1, -2)
    y = sm.solve_upper_small(U, b)
    np.testing.assert_allclose(np.asarray(U @ y), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_spd_solve_small(p):
    A = _spd(jax.random.PRNGKey(3), 4, p)
    b = jax.random.normal(jax.random.PRNGKey(4), (4, p, 2))
    x = sm.spd_solve_small(A, b)
    x_ref = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-4, atol=2e-4)


def test_lu_solve_logdet_small(p):
    # general (non-symmetric) matrices, incl. ones needing pivoting
    key = jax.random.PRNGKey(5)
    A = jax.random.normal(key, (6, p, p)) + 0.5 * jnp.eye(p)
    # force a zero leading pivot in one batch element (pivoting required)
    A = A.at[0, 0, 0].set(0.0) if p > 1 else A
    b = jax.random.normal(jax.random.PRNGKey(6), (6, p, 1))
    x, logdet = sm.lu_solve_logdet_small(A, b)
    x_ref = jnp.linalg.solve(A, b)
    logdet_ref = jnp.linalg.slogdet(A)[1]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logdet), np.asarray(logdet_ref), rtol=1e-4, atol=1e-4)


def test_logdet_small_only(p):
    A = _spd(jax.random.PRNGKey(7), 3, p)
    np.testing.assert_allclose(
        np.asarray(sm.logdet_small(A)), np.asarray(jnp.linalg.slogdet(A)[1]), rtol=1e-4, atol=1e-4
    )


def test_diag_embed():
    v = jnp.arange(12.0).reshape(3, 4)
    D = sm.diag_embed(v)
    assert D.shape == (3, 4, 4)
    np.testing.assert_allclose(np.asarray(D[1]), np.diag(np.arange(4.0) + 4.0))


def test_under_vmap_and_jit():
    p = 6
    A = _spd(jax.random.PRNGKey(8), 10, p)
    b = jax.random.normal(jax.random.PRNGKey(9), (10, p, 1))
    f = jax.jit(jax.vmap(lambda a, r: sm.lu_solve_logdet_small(a, r)))
    x, ld = f(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(jnp.linalg.solve(A, b)), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(jnp.linalg.slogdet(A)[1]), rtol=1e-4, atol=1e-4)
