"""Pallas fused-kernel tests.

The statistical parity checks only run on real TPU hardware (the CPU suite exercises
the custom_vmap fallback path through the existing linalg/sampler tests); here we
verify the dispatch logic and the fallback equivalence on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openmcmc_tpu.linalg import gmrf
from openmcmc_tpu.linalg import structured as st
from openmcmc_tpu.linalg.pallas_tridiag import sample_canonical_tridiag

ON_TPU = jax.default_backend() == "tpu"


def _tridiag_q(p=32):
    P = gmrf.precision_irregular(jnp.arange(p, dtype=jnp.float32))
    return st.add(st.scale(50.0, st.Banded(P.bands.at[0, 0].add(0.01))), st.Diagonal(jnp.ones(p)))


def test_unbatched_uses_fallback(key, rng):
    """Un-batched calls route to the associative-scan path on any backend."""
    Q = _tridiag_q()
    b = jnp.asarray(rng.normal(size=(32, 1)))
    x = sample_canonical_tridiag(key, b, Q.bands)
    assert x.shape == (32, 1) and bool(jnp.all(jnp.isfinite(x)))
    # identical to the direct non-pallas call with the same key
    want = gmrf.sample_normal_canonical(key, b, Q=Q, _allow_pallas=False)
    np.testing.assert_allclose(x, want, rtol=1e-5, atol=1e-6)


def test_vmapped_cpu_fallback_moments(key, rng):
    """On CPU, the custom_vmap rule falls back to the vmapped scan path."""
    Q = _tridiag_q()
    b = jnp.asarray(rng.normal(size=(32, 1)))
    xs = jax.jit(jax.vmap(lambda k: sample_canonical_tridiag(k, b, Q.bands)))(
        jax.random.split(key, 8000)
    )
    mean = np.asarray(xs).mean(0)
    want = np.linalg.solve(np.asarray(st.to_dense(Q)), np.asarray(b))
    np.testing.assert_allclose(mean, want, atol=0.02)


@pytest.mark.tpu
@pytest.mark.skipif(not ON_TPU, reason="fused Pallas kernel requires TPU hardware")
def test_pallas_batched_moments(key, rng):
    """On TPU, vmapped calls dispatch to the fused kernel; check mean/cov parity."""
    from openmcmc_tpu.linalg.pallas_tridiag import _pallas_batched

    p, n_b = 32, 8192
    Q = _tridiag_q(p)
    b = jnp.asarray(rng.normal(size=p))
    a = jnp.broadcast_to(Q.bands[0], (n_b, p)) + 0.0
    c = jnp.broadcast_to(Q.bands[1], (n_b, p)) + 0.0
    bb = jnp.broadcast_to(b, (n_b, p)) + 0.0
    x = np.asarray(_pallas_batched(jnp.asarray([5], jnp.int32), a, c, bb))
    Qd = np.asarray(st.to_dense(Q))
    mu = np.linalg.solve(Qd, np.asarray(b))
    cov = np.linalg.inv(Qd)
    z = np.abs(x.mean(0) - mu) / np.sqrt(np.diag(cov) / n_b)
    assert z.max() < 5.0
    emp = np.cov(x.T)
    assert np.linalg.norm(emp - cov) / np.linalg.norm(cov) < 0.1
