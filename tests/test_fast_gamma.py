"""fast_gamma / pallas gamma tests: statistical exactness of the fixed-round
Marsaglia-Tsang sampler on CPU (the pallas kernel is TPU-gated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from openmcmc_tpu.linalg.random import fast_gamma


@pytest.mark.parametrize("a", [0.5, 1.0, 2.5, 50.5, 500.0])
def test_fast_gamma_ks(a, key):
    x = np.asarray(fast_gamma(key, jnp.full((100000,), a)))
    assert np.all(x > 0)
    p = sps.kstest(x, "gamma", args=(a,)).pvalue
    assert p > 1e-3, (a, p)
    np.testing.assert_allclose(x.mean(), a, rtol=0.03)
    np.testing.assert_allclose(x.var(), a, rtol=0.06)


def test_fast_gamma_rate(key):
    x = np.asarray(fast_gamma(key, jnp.full((50000,), 4.0), rate=2.0))
    np.testing.assert_allclose(x.mean(), 2.0, rtol=0.03)


def test_fast_erfinv_accuracy():
    """Giles polynomial vs scipy erfinv across the domain incl. near-tails."""
    from scipy.special import erfinv as sp_erfinv

    from openmcmc_tpu.linalg.random import fast_erfinv

    # tail grid stops at 1 - 1e-6: within 1e-7 of +-1, float32 input quantization of
    # 1 - x^2 dominates any method's error (and the sampler clips there anyway)
    x = np.concatenate([
        np.linspace(-0.999999, 0.999999, 20001),
        1.0 - np.logspace(-6, -1, 200),
        -(1.0 - np.logspace(-6, -1, 200)),
    ])
    got = np.asarray(fast_erfinv(jnp.asarray(x, jnp.float32)))
    want = sp_erfinv(x)
    # f32 Giles accuracy: ~1e-7 relative in the bulk, ~5e-4 relative in the far
    # tail (|z| > 3.4) -- a KS distance of ~3e-6, far below any MC tolerance
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-3)
    bulk = np.abs(want) < 2.0
    assert rel[bulk].max() < 3e-6, rel[bulk].max()
    assert rel.max() < 1e-3, rel.max()


def test_fast_ndtri_roundtrip():
    from scipy.stats import norm as sp_norm

    from openmcmc_tpu.linalg.random import fast_ndtri

    q = np.linspace(1e-6, 1 - 1e-6, 10001)
    got = np.asarray(fast_ndtri(jnp.asarray(q, jnp.float32)))
    want = sp_norm.ppf(q)
    central = (q > 0.01) & (q < 0.99)
    assert np.abs(got - want)[central].max() < 1e-5
    assert np.abs(got - want).max() < 3e-3
