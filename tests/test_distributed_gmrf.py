"""Distributed GMRF tests on the 8-device CPU mesh: one huge tridiagonal system
sharded over the sequence axis (the framework's tensor/sequence-parallel analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.parallel import make_mesh, sample_rw1_canonical_sharded, tridiag_solve_sharded


@pytest.fixture
def seq_mesh():
    return make_mesh(axis_name="seq")


def _system(rng, n):
    s = np.sort(rng.uniform(0, 10, n))
    P = gmrf.precision_irregular(jnp.asarray(s))
    Q = st.add(st.scale(5.0, st.Banded(P.bands.at[0, 0].add(0.01))), st.Diagonal(jnp.ones(n)))
    a = Q.bands[0]
    c = Q.bands[1]
    return s, a, c, Q


def test_sharded_solve_matches_dense(rng, seq_mesh):
    n = 256  # 32 per device
    _, a, c, Q = _system(rng, n)
    rhs = jnp.asarray(rng.normal(size=(3, n)))
    a_b = jnp.broadcast_to(a, (3, n))
    c_b = jnp.broadcast_to(c, (3, n))
    x = tridiag_solve_sharded(a_b, c_b, rhs, seq_mesh)
    want = np.linalg.solve(np.asarray(st.to_dense(Q)), np.asarray(rhs).T).T
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-3, atol=2e-4)


def test_sharded_solve_under_jit_with_sharding(rng, seq_mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = 512
    _, a, c, Q = _system(rng, n)
    rhs = jnp.asarray(rng.normal(size=(2, n)))
    sharding = NamedSharding(seq_mesh, P(None, "seq"))
    a_b = jax.device_put(jnp.broadcast_to(a, (2, n)), sharding)
    c_b = jax.device_put(jnp.broadcast_to(c, (2, n)), sharding)
    rhs_s = jax.device_put(rhs, sharding)
    x = jax.jit(lambda aa, cc, rr: tridiag_solve_sharded(aa, cc, rr, seq_mesh))(a_b, c_b, rhs_s)
    assert len(x.sharding.device_set) == 8
    want = np.linalg.solve(np.asarray(st.to_dense(Q)), np.asarray(rhs).T).T
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-3, atol=2e-4)


def test_sharded_rw1_sampling_moments(rng, seq_mesh):
    """Perturbation sampling of a sharded smoother conditional: mean and covariance
    structure match the dense computation."""
    n = 128
    n_draws = 4096
    s = np.sort(rng.uniform(0, 10, n))
    lam, tau = 5.0, 1.0
    y = np.sin(s) + rng.normal(0, 1.0, n)
    b = jnp.broadcast_to(jnp.asarray(tau * y), (n_draws, n))
    tau_diag = jnp.full((n,), tau)

    key = jax.random.PRNGKey(0)
    x = sample_rw1_canonical_sharded(
        key, b, jnp.asarray(s), lam, jnp.broadcast_to(tau_diag, (n_draws, n)), seq_mesh, ridge=0.01
    )
    assert x.shape == (n_draws, n)

    P = gmrf.precision_irregular(jnp.asarray(s))
    Q = st.add(st.scale(lam, st.Banded(P.bands.at[0, 0].add(0.01 / lam))), st.Diagonal(tau_diag))
    Qd = np.array(st.to_dense(Q))
    # NOTE: ridge in the sampler adds 0.01 to Q[0,0]; build the same Q here
    Qd[0, 0] = lam * float(np.asarray(P.bands)[0][0]) + tau + 0.01
    mu = np.linalg.solve(Qd, tau * y)
    cov = np.linalg.inv(Qd)
    z = np.abs(np.asarray(x).mean(0) - mu) / np.sqrt(np.diag(cov) / n_draws)
    assert z.max() < 5.5, z.max()
    var_ratio = np.asarray(x).var(0) / np.diag(cov)
    np.testing.assert_allclose(var_ratio.mean(), 1.0, atol=0.05)


def test_2d_mesh_chains_by_sequence(rng):
    """Combined DP x SP: chains sharded on one mesh axis, the sequence on the other."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devices, ("chains", "seq"))
    n, n_chains = 64, 6
    s_loc, a, c, Q = _system(rng, n)
    rhs = jnp.asarray(rng.normal(size=(n_chains, n)))
    sharding = NamedSharding(mesh, P("chains", "seq"))
    a_b = jax.device_put(jnp.broadcast_to(a, (n_chains, n)), sharding)
    c_b = jax.device_put(jnp.broadcast_to(c, (n_chains, n)), sharding)
    rhs_s = jax.device_put(rhs, sharding)
    x = jax.jit(
        lambda aa, cc, rr: tridiag_solve_sharded(aa, cc, rr, mesh, "seq", batch_axis="chains")
    )(a_b, c_b, rhs_s)
    assert len(x.sharding.device_set) == 8
    want = np.linalg.solve(np.asarray(st.to_dense(Q)), np.asarray(rhs).T).T
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-3, atol=2e-4)
