"""CPU statistical validation of the fused engines' PRNG math pipeline.

The on-chip PRNG itself cannot run on CPU (the interpret stub returns zeros), but
everything downstream of the raw bits -- the 24-bit mantissa uniform conversion,
Box-Muller, the fixed-round Marsaglia-Tsang Gamma squeeze and the shape < 1
boost -- is plain jnp math. Injecting a host bit source runs that EXACT pipeline
with real randomness, so a distributional regression (e.g. a broken Box-Muller
term, a wrong squeeze constant, a missing boost) fails this suite on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from openmcmc_tpu.fused import prng

N = 200_000


def _host_bits(key):
    keys = [key]

    def source(shape):
        keys[0], sub = jax.random.split(keys[0])
        return jax.random.bits(sub, shape, dtype=jnp.uint32)

    return source


def test_uniform_distribution(key):
    u = np.asarray(prng.uniform((N,), _host_bits(key)))
    assert u.min() > 0.0 and u.max() < 1.0
    # mean/var within 5 sigma
    assert abs(u.mean() - 0.5) < 5 * np.sqrt(1 / 12 / N)
    assert abs(u.var() - 1 / 12) < 5 * np.sqrt(1 / 180 / N) * 2
    _, p = sps.kstest(u[:20000], "uniform")
    assert p > 1e-4, p


def test_normal_distribution(key):
    z = np.asarray(prng.normal((N,), _host_bits(key)))
    assert abs(z.mean()) < 5 / np.sqrt(N)
    assert abs(z.var() - 1.0) < 5 * np.sqrt(2 / N)
    _, p = sps.kstest(z[:20000], "norm")
    assert p > 1e-4, p
    # skewness and excess kurtosis vanish (catches asymmetric pipeline bugs)
    assert abs(sps.skew(z)) < 6 / np.sqrt(6 / N) * np.sqrt(6 / N) + 0.03
    assert abs(sps.kurtosis(z)) < 0.06


@pytest.mark.parametrize("a_star", [0.501, 0.9, 1.0, 1.5, 4.0, 25.0])
def test_gamma_distribution(key, a_star):
    """Covers the Marsaglia-Tsang squeeze (a >= 1) and the U^(1/a) boost (a < 1,
    the round-2 advisor finding: weak priors land here)."""
    rate = jnp.full((N,), 2.0, jnp.float32)
    g = np.asarray(prng.gamma_mt(a_star, rate, _host_bits(key)))
    assert g.min() >= 0.0
    mean, var = a_star / 2.0, a_star / 4.0
    assert abs(g.mean() - mean) < 6 * np.sqrt(var / N) + 1e-3
    assert abs(g.var() - var) < 0.05 * var + 6 * np.sqrt(2 * var**2 / N)
    _, p = sps.kstest(g[:20000], "gamma", args=(a_star, 0.0, 0.5))
    assert p > 1e-4, (a_star, p)


def test_broken_box_muller_is_detected(key):
    """Meta-test (VERDICT round-2 'done when'): a deliberately corrupted
    Box-Muller -- using u instead of sqrt(-2 log u) -- must fail the same check
    that the real pipeline passes."""

    def broken_normal(shape, bit_source):
        u1 = prng.uniform(shape, bit_source)
        u2 = prng.uniform(shape, bit_source)
        return u1 * jnp.cos(2.0 * np.pi * u2)  # wrong radial term

    z = np.asarray(broken_normal((20000,), _host_bits(key)))
    _, p = sps.kstest(z, "norm")
    assert p < 1e-4  # the suite's detection threshold catches it


def test_gamma_elem_traced_shapes(key):
    """gamma_mt_elem: ELEMENTWISE shape arrays (the mixture engine's a0 + count/2
    with per-chain counts) must draw from the right Gamma for every shape."""
    shapes = np.array([1.0, 2.5, 7.0, 40.0, 101.0])
    m = N // 5
    a = jnp.asarray(np.repeat(shapes, m), jnp.float32)
    rate = jnp.full((5 * m,), 2.0, jnp.float32)
    g = np.asarray(prng.gamma_mt_elem(a, rate, _host_bits(key)))
    assert g.min() >= 0.0
    for i, a_i in enumerate(shapes):
        seg = g[i * m : (i + 1) * m]
        mean, var = a_i / 2.0, a_i / 4.0
        assert abs(seg.mean() - mean) < 6 * np.sqrt(var / m) + 1e-3, a_i
        _, p = sps.kstest(seg[:20000], "gamma", args=(a_i, 0.0, 0.5))
        assert p > 1e-4, (a_i, p)


def test_truncnorm_draw_distribution(key):
    """truncnorm_draw (polynomial erf/erfinv inverse-CDF) vs scipy.truncnorm,
    including an asymmetric box that clips real mass."""
    mu, scale, lo, hi = 0.7, 1.3, -0.5, 2.0
    x = np.asarray(prng.truncnorm_draw(mu, scale, lo, hi, (N,), _host_bits(key)))
    assert x.min() >= lo and x.max() <= hi
    a, b = (lo - mu) / scale, (hi - mu) / scale
    _, p = sps.kstest(x[:20000], "truncnorm", args=(a, b, mu, scale))
    assert p > 1e-4, p
    # logpdf parity against scipy on a grid (inside the box)
    grid = np.linspace(lo + 0.01, hi - 0.01, 101)
    got = np.asarray(prng.truncnorm_logpdf(jnp.asarray(grid, jnp.float32), mu, scale, lo, hi))
    want = sps.truncnorm.logpdf(grid, a, b, mu, scale)
    assert np.max(np.abs(got - want)) < 5e-4, np.max(np.abs(got - want))


def test_normal_pair_distribution(key):
    """normal_pair: both Box-Muller channels (cos rows then sin rows) must be
    iid N(0,1), and the paired elements (same radius) must be uncorrelated."""
    m = N // 2
    z = np.asarray(prng.normal_pair((2 * m, 1), _host_bits(key))).reshape(2 * m)
    cos_half, sin_half = z[:m], z[m:]
    for half, name in ((cos_half, "cos"), (sin_half, "sin")):
        assert abs(half.mean()) < 5 / np.sqrt(m), name
        assert abs(half.var() - 1.0) < 5 * np.sqrt(2 / m), name
        _, p = sps.kstest(half[:20000], "norm")
        assert p > 1e-4, (name, p)
    # exact independence of the two channels of one Box-Muller pair
    corr = np.corrcoef(cos_half, sin_half)[0, 1]
    assert abs(corr) < 5 / np.sqrt(m), corr
    # odd leading dimension must fall back to plain normal (no shape error)
    z_odd = np.asarray(prng.normal_pair((3, 101), _host_bits(key)))
    assert z_odd.shape == (3, 101) and np.isfinite(z_odd).all()


@pytest.mark.parametrize("a1,a2", [(1.0, 2.0), (4.5, 16.0), (51.0, 60.0)])
def test_gamma_mt2_distribution(key, a1, a2):
    """gamma_mt2: the stacked two-shape draw (incl. the shape-adaptive squeeze
    round counts) must produce the right marginal Gamma for BOTH rows, and the
    rows must be independent."""
    m = N // 2
    r1 = jnp.full((1, m), 2.0, jnp.float32)
    r2 = jnp.full((1, m), 0.5, jnp.float32)
    g1, g2 = prng.gamma_mt2(a1, a2, r1, r2, _host_bits(key))
    g1 = np.asarray(g1).reshape(m)
    g2 = np.asarray(g2).reshape(m)
    for g, a, rate in ((g1, a1, 2.0), (g2, a2, 0.5)):
        mean, var = a / rate, a / rate**2
        assert abs(g.mean() - mean) < 6 * np.sqrt(var / m) + 1e-3, (a, rate)
        _, p = sps.kstest(g[:20000], "gamma", args=(a, 0.0, 1.0 / rate))
        assert p > 1e-4, (a, rate, p)
    corr = np.corrcoef(g1, g2)[0, 1]
    assert abs(corr) < 5 / np.sqrt(m), corr


def test_normal_icdf_distribution(key):
    """normal_icdf (Giles inverse-erf polynomial): N(0,1) to KS tolerance; the
    ~5.2-sigma clamp only removes ~1e-7 tail mass."""
    z = np.asarray(prng.normal_icdf((N,), _host_bits(key)))
    assert abs(z.mean()) < 5 / np.sqrt(N)
    assert abs(z.var() - 1.0) < 5 * np.sqrt(2 / N)
    assert np.abs(z).max() < 5.5
    _, p = sps.kstest(z[:20000], "norm")
    assert p > 1e-4, p
    assert abs(sps.kurtosis(z)) < 0.06
