"""Fused truncated-Gibbs kernel tests (TPU-gated statistical parity; CPU covers the
fallback dispatch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.linalg import pallas_truncated

ON_TPU = jax.default_backend() == "tpu"


def _setup(p=20):
    P = gmrf.precision_irregular(jnp.arange(p, dtype=jnp.float32))
    Q = st.add(st.scale(3.0, st.Banded(P.bands.at[0, 0].add(0.01))), st.Diagonal(jnp.ones(p)))
    return Q


def test_fallback_dispatch_cpu(key, rng):
    Q = _setup()
    b = jnp.asarray(rng.normal(size=(20, 1)))
    x0 = jnp.full((20, 1), 0.5)
    out = pallas_truncated.gibbs_truncated_tridiag(
        key, b, Q.bands, x0, jnp.zeros(20), jnp.full(20, 2.0)
    )
    assert out.shape == (20, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 2.0
    want = gmrf.gibbs_canonical_truncated_normal(key, b, Q, x0, lower=0.0, upper=2.0, _allow_pallas=False)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="fused kernel requires TPU")
def test_pallas_truncated_stationary_moments(rng):
    """Many sweeps via kernel vs scan: same stationary distribution."""
    p, B = 20, 2048
    Q = _setup(p)
    b = jnp.asarray(rng.normal(size=(p, 1)))
    x0 = jnp.full((p, 1), 0.5)
    lo, hi = jnp.zeros(p), jnp.full(p, 2.0)

    def sweeps(key):
        def body(x, k):
            return pallas_truncated.gibbs_truncated_tridiag(k, b, Q.bands, x, lo, hi), None
        x, _ = jax.lax.scan(body, x0, jax.random.split(key, 40))
        return x[:, 0]

    xp = np.asarray(jax.jit(jax.vmap(sweeps))(jax.random.split(jax.random.PRNGKey(0), B)))

    def sweeps_scan(key):
        def body(x, k):
            return gmrf.gibbs_canonical_truncated_normal(k, b, Q, x, lower=0.0, upper=2.0, _allow_pallas=False), None
        x, _ = jax.lax.scan(body, x0, jax.random.split(key, 40))
        return x[:, 0]

    xs = np.asarray(jax.jit(jax.vmap(sweeps_scan))(jax.random.split(jax.random.PRNGKey(1), B)))
    se = np.sqrt(xp.var(0) / B + xs.var(0) / B)
    assert np.all(np.abs(xp.mean(0) - xs.mean(0)) < 5 * se)
    np.testing.assert_allclose(xp.std(0), xs.std(0), rtol=0.1)
