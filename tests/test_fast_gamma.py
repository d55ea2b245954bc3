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
