"""General sparse precision support: RCM ordering, Permuted structured matrices,
and end-to-end MCMC on non-banded GMRFs (2-D lattice, CAR graph).

Parity target: the reference factors ANY scipy.sparse pattern through SuperLU
(reference gmrf.py:489-520, sparse dispatch :414-462, sparse state passthrough
mcmc.py:66-67). Here the same patterns run through a host-side reverse
Cuthill-McKee permutation onto the banded lax.scan kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from openmcmc_tpu.linalg import gmrf, ordering
from openmcmc_tpu.linalg import structured as st


def _lattice_sparse(nx, ny, ridge=1e-3, shuffle_seed=None):
    """5-point-stencil lattice precision; shuffle_seed relabels vertices randomly
    (the realistic case: data arrives in arbitrary order, natural labels are not
    bandwidth-optimal and RCM must recover a good ordering)."""
    n = nx * ny
    idx = np.arange(n).reshape(nx, ny)
    if shuffle_seed is not None:
        relabel = np.random.default_rng(shuffle_seed).permutation(n)
        idx = relabel[idx]
    rows = np.concatenate([idx[:-1, :].ravel(), idx[:, :-1].ravel()])
    cols = np.concatenate([idx[1:, :].ravel(), idx[:, 1:].ravel()])
    W = sp.coo_matrix((np.ones(rows.size), (rows, cols)), shape=(n, n))
    W = W + W.T
    return (sp.diags(np.asarray(W.sum(axis=1)).ravel() + ridge) - W).tocsr()


def _random_graph_sparse(rng, n=60, k=5, rho=0.9):
    """Irregular SPATIAL graph (k-nearest-neighbors of random 2-D points): the
    realistic CAR use case -- local connectivity in arbitrary vertex order."""
    pts = rng.random((n, 2))
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    np.fill_diagonal(d2, np.inf)
    rows = np.repeat(np.arange(n), k)
    cols = np.argsort(d2, axis=1)[:, :k].ravel()
    W = sp.coo_matrix((np.ones(rows.size), (rows, cols)), shape=(n, n))
    W = ((W + W.T) > 0).astype(np.float64)
    deg = np.asarray(W.sum(axis=1)).ravel()
    return (sp.diags(deg + 1e-3) - rho * W).tocsr()


# ---------------------------------------------------------------------------
# ordering layer
# ---------------------------------------------------------------------------


def test_rcm_reduces_lattice_bandwidth():
    Q = _lattice_sparse(16, 16, shuffle_seed=0)
    coo = Q.tocoo()
    bw0 = ordering.half_bandwidth(coo.row, coo.col)
    perm = ordering.rcm_permutation(Q)
    Qp = Q[perm][:, perm].tocoo()
    bw_p = ordering.half_bandwidth(Qp.row, Qp.col)
    assert bw0 > 100  # shuffled labels: bandwidth ~ n
    assert bw_p <= 3 * 16  # RCM recovers near the grid width
    assert sorted(perm.tolist()) == list(range(256))


def test_rcm_numpy_fallback_matches_quality():
    Q = _lattice_sparse(8, 8, shuffle_seed=1)
    perm = ordering._rcm_numpy(Q)
    Qp = Q[perm][:, perm].tocoo()
    assert ordering.half_bandwidth(Qp.row, Qp.col) <= 16  # scipy gets ~8-9
    assert sorted(perm.tolist()) == list(range(64))


def test_bands_from_sparse_roundtrip():
    Q = _lattice_sparse(4, 4)
    coo = Q.tocoo()
    bw = ordering.half_bandwidth(coo.row, coo.col)
    bands = ordering.bands_from_sparse(Q, bw)
    dense = np.asarray(st.to_dense(st.Banded(jnp.asarray(bands))))
    np.testing.assert_allclose(dense, Q.toarray(), rtol=1e-6, atol=1e-6)


def test_from_sparse_selection():
    # diagonal pattern -> Diagonal
    d = st.from_sparse(sp.diags(np.arange(1.0, 9.0)).tocsr())
    assert isinstance(d, st.Diagonal)
    # tridiagonal in natural order -> plain Banded (no useless permutation)
    tri = sp.diags([-np.ones(19), 2.2 * np.ones(20), -np.ones(19)], [-1, 0, 1]).tocsr()
    b = st.from_sparse(tri)
    assert isinstance(b, st.Banded) and b.bw == 1
    # shuffled lattice -> Permuted(Banded)
    lat = st.from_sparse(_lattice_sparse(12, 12, shuffle_seed=2))
    assert isinstance(lat, st.Permuted) and isinstance(lat.inner, st.Banded)
    assert lat.inner.bw < 36
    # natural-order lattice: already banded at bw = ny, no useless permutation
    nat = st.from_sparse(_lattice_sparse(32, 8))
    assert isinstance(nat, st.Banded) and nat.bw == 8
    # arrow matrix (dense first row/col): RCM cannot help -> Dense
    n = 40
    arrow = sp.lil_matrix((n, n))
    arrow.setdiag(np.full(n, float(n)))
    arrow[0, :] = 1.0
    arrow[:, 0] = 1.0
    arrow[0, 0] = float(n)
    a = st.from_sparse(arrow.tocsr())
    assert isinstance(a, st.Dense)


# ---------------------------------------------------------------------------
# Permuted operations vs dense ground truth
# ---------------------------------------------------------------------------


@pytest.fixture(params=["lattice", "graph"])
def sparse_case(request, rng):
    if request.param == "lattice":
        Q = _lattice_sparse(9, 7, ridge=0.05, shuffle_seed=3)
    else:
        Q = _random_graph_sparse(rng)
    S = st.from_sparse(Q)
    assert isinstance(S, st.Permuted), "fixture should exercise the permuted path"
    return S, Q.toarray()


def test_permuted_dense_roundtrip(sparse_case):
    S, D = sparse_case
    np.testing.assert_allclose(np.asarray(st.to_dense(S)), D, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.diag(S)), np.diag(D), rtol=1e-6)


def test_permuted_matvec_row_dot(sparse_case, rng):
    S, D = sparse_case
    p = D.shape[0]
    x = jnp.asarray(rng.normal(size=(p, 3)))
    np.testing.assert_allclose(np.asarray(st.matvec(S, x)), D @ np.asarray(x), rtol=1e-4, atol=1e-5)
    i = p // 3
    np.testing.assert_allclose(
        float(st.row_dot(S, jnp.asarray(i), x[:, :1])), float(D[i] @ np.asarray(x[:, 0])), rtol=1e-4
    )


def test_permuted_scale_add(sparse_case):
    S, D = sparse_case
    p = D.shape[0]
    S2 = st.scale(2.5, S)
    assert isinstance(S2, st.Permuted)
    np.testing.assert_allclose(np.asarray(st.to_dense(S2)), 2.5 * D, rtol=1e-5, atol=1e-6)
    tau_diag = st.Diagonal(jnp.linspace(1.0, 2.0, p))
    Ssum = st.add(S, tau_diag)
    assert isinstance(Ssum, st.Permuted)
    np.testing.assert_allclose(
        np.asarray(st.to_dense(Ssum)), D + np.diag(np.linspace(1.0, 2.0, p)), rtol=1e-5, atol=1e-6
    )
    # same-permutation add stays permuted; banded operand densifies
    assert isinstance(st.add(S, S2), st.Permuted)
    assert isinstance(st.add(S, st.Banded(jnp.ones((2, p)))), st.Dense)


def test_permuted_cholesky_solve_logdet(sparse_case, rng):
    S, D = sparse_case
    p = D.shape[0]
    chol = st.cholesky(S)
    assert isinstance(chol, st.Permuted)
    # M M^T = Q for the unpermuted square root
    M = np.asarray(st.to_dense_lower(chol))
    np.testing.assert_allclose(M @ M.T, D, rtol=1e-4, atol=1e-5)
    b = rng.normal(size=(p, 2))
    x = np.asarray(st.cho_solve(chol, jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(D, b), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        float(st.chol_log_det(chol)), float(np.linalg.slogdet(D)[1]), rtol=1e-5
    )
    # solve() entry point (reference gmrf.py:414-434 sparse dispatch analog)
    np.testing.assert_allclose(np.asarray(st.solve(S, jnp.asarray(b))), np.linalg.solve(D, b), rtol=1e-3, atol=1e-4)


def test_permuted_sample_normal_canonical_moments(sparse_case, key):
    S, D = sparse_case
    p = D.shape[0]
    b = jnp.asarray(np.linspace(-1.0, 1.0, p)).reshape(-1, 1)
    n = 4096
    draws = jax.vmap(lambda k: gmrf.sample_normal_canonical(k, b, Q=S))(jax.random.split(key, n))
    draws = np.asarray(draws).reshape(n, p)
    mean_exact = np.linalg.solve(D, np.asarray(b)).ravel()
    cov_exact = np.linalg.inv(D)
    sd = np.sqrt(np.diag(cov_exact))
    tol = 5.0 * sd / np.sqrt(n)
    assert np.all(np.abs(draws.mean(0) - mean_exact) < tol + 1e-6)
    emp_sd = draws.std(0)
    assert np.all(np.abs(emp_sd - sd) < 6.0 * sd / np.sqrt(n) + 0.05 * sd)


def test_permuted_mvn_log_pdf(sparse_case, rng):
    S, D = sparse_case
    p = D.shape[0]
    x = rng.normal(size=(p, 1))
    got = float(gmrf.mvn_log_pdf(jnp.asarray(x), jnp.zeros((p, 1)), Q=S))
    sign, logdet = np.linalg.slogdet(D)
    want = 0.5 * (logdet - p * np.log(2 * np.pi) - x.ravel() @ D @ x.ravel())
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_permuted_truncated_gibbs_sweep(sparse_case, key):
    S, D = sparse_case
    p = D.shape[0]
    b = jnp.zeros((p,))
    x0 = jnp.full((p,), 0.5)
    out = gmrf.gibbs_canonical_truncated_normal(
        key, b, S, x0, lower=jnp.zeros(p), upper=jnp.full(p, 2.0), schedule="red_black"
    )
    out = np.asarray(out)
    assert out.shape == (p,)
    assert np.all(out >= 0.0) and np.all(out <= 2.0)
    assert not np.allclose(out, np.asarray(x0))


# ---------------------------------------------------------------------------
# pytree / jit behavior
# ---------------------------------------------------------------------------


def test_permuted_is_jittable_pytree(sparse_case, rng):
    S, D = sparse_case
    p = D.shape[0]

    @jax.jit
    def f(Sm, v):
        return st.matvec(Sm, v)

    v = jnp.asarray(rng.normal(size=(p,)))
    np.testing.assert_allclose(np.asarray(f(S, v)), D @ np.asarray(v), rtol=1e-4, atol=1e-5)
    leaves, treedef = jax.tree_util.tree_flatten(S)
    S2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert S2.perm == S.perm


# ---------------------------------------------------------------------------
# end-to-end MCMC with sparse (RCM-permuted) precisions
# ---------------------------------------------------------------------------


def test_lattice_smoother_e2e(rng, key):
    """2-D lattice GMRF smoother through NormalNormal with fixed scales: the
    posterior is exactly N((lam Q + tau I)^{-1} tau y, .), so the chain mean must
    match the direct solve (VERDICT round-2 'done when' case)."""
    from openmcmc_tpu.distributions import Normal
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import ScaledMatrix
    from openmcmc_tpu.samplers import NormalNormal

    nx = ny = 8
    n = nx * ny
    Q_sp = _lattice_sparse(nx, ny, ridge=0.05, shuffle_seed=5)
    lam, tau = 4.0, 2.0
    y = rng.normal(size=n)
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("Q_lat", "lam")),
        ]
    )
    state = {
        "y": y, "b": np.zeros(n), "mu": np.zeros(n), "lam": lam, "tau": tau,
        "P_tau": st.Diagonal(jnp.ones(n)), "Q_lat": Q_sp,  # scipy.sparse passthrough
    }
    n_chains, n_iter = 64, 40
    m = MCMC(state, [NormalNormal("b", mdl)], mdl, n_burn=5, n_iter=n_iter, n_chains=n_chains, seed=0)
    assert isinstance(m.data["Q_lat"], st.Permuted)  # _coerce_state converted it
    res = m.run()
    draws = np.asarray(res.store["b"]).reshape(n_chains, n_iter, n)
    Qd = lam * Q_sp.toarray() + tau * np.eye(n)
    mean_exact = np.linalg.solve(Qd, tau * y)
    sd = np.sqrt(np.diag(np.linalg.inv(Qd)))
    tol = 5.0 * sd / np.sqrt(n_chains * n_iter * 0.5)  # draws are iid given fixed scales
    assert np.all(np.abs(draws.mean((0, 1)) - mean_exact) < tol + 1e-4)


def test_car_model_full_gibbs_e2e(rng):
    """CAR model on an irregular spatial graph: full NormalNormal + NormalGamma
    sweep with the sparse precision converted at construction; checks tau recovery
    and finiteness (the reference serves this via SuperLU, gmrf.py:489-520)."""
    from openmcmc_tpu.distributions import Gamma, Normal
    from openmcmc_tpu.linalg import gmrf as gm
    from openmcmc_tpu.mcmc import MCMC
    from openmcmc_tpu.model import Model
    from openmcmc_tpu.parameters import ScaledMatrix
    from openmcmc_tpu.samplers import NormalGamma, NormalNormal

    n = 50
    pts = rng.random((n, 2))
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    np.fill_diagonal(d2, np.inf)
    rows = np.repeat(np.arange(n), 4)
    cols = np.argsort(d2, axis=1)[:, :4].ravel()
    W = sp.coo_matrix((np.ones(rows.size), (rows, cols)), shape=(n, n))
    W = ((W + W.T) > 0).astype(np.float64)
    Q_car = gm.precision_car(W, rho=0.9, ridge=1e-2)
    assert isinstance(Q_car, st.Permuted)

    tau_true = 4.0
    lam_true = 1.0
    # draw b_true from the CAR prior itself (self-consistent data: tau recoverable)
    Qd = lam_true * np.asarray(st.to_dense(Q_car))
    b_true = np.linalg.cholesky(np.linalg.inv(Qd)) @ rng.normal(size=n)
    y = b_true + rng.normal(0, 1 / np.sqrt(tau_true), n)
    mdl = Model(
        [
            Normal("y", mean="b", precision=ScaledMatrix("P_tau", "tau")),
            Normal("b", mean="mu", precision=ScaledMatrix("Q_car", "lam")),
            Gamma("tau", shape="a_tau", rate="b_tau"),
            Gamma("lam", shape="a_lam", rate="b_lam"),
        ]
    )
    state = {
        "y": y, "b": y.copy(), "mu": np.zeros(n), "tau": 1.0, "lam": 1.0,
        "P_tau": st.Diagonal(jnp.ones(n)), "Q_car": Q_car,
        "a_tau": 2.0, "b_tau": 0.5, "a_lam": 2.0, "b_lam": 2.0,
    }
    samplers = [NormalNormal("b", mdl), NormalGamma("tau", mdl), NormalGamma("lam", mdl)]
    m = MCMC(state, samplers, mdl, n_burn=30, n_iter=60, n_chains=32, seed=1)
    res = m.run()
    assert np.isfinite(np.asarray(res.log_post)).all()
    tau_mean = float(np.asarray(res.store["tau"]).mean())
    assert 1.5 < tau_mean < 12.0  # concentrates near tau_true with wide MC slack


def test_bad_bandwidth_warns_and_still_solves():
    """An expander-ish (small-world) pattern that RCM cannot compress: no
    silent O(p * bw^2) cliff — from_sparse emits BadBandwidthWarning naming
    the cost and the spectral-engine escape hatch, and whatever structure it
    picks still factors/solves correctly (VERDICT r5 item 7; reference
    handles the same pattern via SuperLU, gmrf.py:489-520)."""
    import warnings

    import scipy.sparse as sp

    from openmcmc_tpu.linalg.ordering import BadBandwidthWarning

    # an Erdos-Renyi expander: ring + FEW long links RCM still compresses to
    # bw ~ 100 (measured), but uniformly random edges at mean degree 4 keep
    # bw ~ 370 at p = 600 under any BFS ordering (no small separators)
    rng = np.random.default_rng(0)
    p = 600
    ne = p * 2
    a = rng.integers(0, p, ne * 2)
    b = rng.integers(0, p, ne * 2)
    keep = a != b
    A = sp.coo_matrix((np.ones(keep.sum()), (a[keep], b[keep])), shape=(p, p))
    A = ((A + A.T) > 0).astype(np.float64)
    deg = np.asarray(A.sum(axis=1)).ravel()
    Q_sp = (sp.diags(deg + 0.5) - A).tocsr()

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        Q = st.from_sparse(Q_sp)
    assert any(issubclass(w.category, BadBandwidthWarning) for w in caught)
    assert any("spectral" in str(w.message) for w in caught)

    rhs = rng.normal(size=(p, 1))
    x = np.asarray(st.solve(Q, jnp.asarray(rhs, jnp.float32)))
    x_ref = np.linalg.solve(Q_sp.toarray(), rhs)
    np.testing.assert_allclose(x, x_ref, atol=5e-3 * np.abs(x_ref).max())
