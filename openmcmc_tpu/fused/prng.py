"""Shared in-kernel PRNG helpers for fused Pallas engines.

All fused engines draw their randomness from the on-chip TPU PRNG
(``pltpu.prng_random_bits``), seeded per grid program. Box-Muller normals and
fixed-round Marsaglia-Tsang (2000) Gamma draws: a bounded number of vectorized
rejection rounds replaces jax.random.gamma's data-dependent while_loop (each round
accepts with prob > 0.95 for shape > 1, so GAMMA_ROUNDS = 6 leaves a miss
probability < 1e-7; misses fall back to the mode-matched d*v value).

Replaces the scipy RNG layer of the reference (reference gmrf.py:20-26 uses
scipy.stats rvs throughout).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586
LOG_2PI = 1.8378770664093453
GAMMA_ROUNDS = 6


def uniform(shape):
    """U(0, 1) from the on-chip PRNG (24-bit mantissa resolution, never 0)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    i24 = pltpu.bitcast(jnp.right_shift(bits, 8), jnp.int32)
    return (i24.astype(jnp.float32) + 0.5) * (1.0 / 16777216.0)


def normal(shape):
    """N(0, 1) via Box-Muller."""
    u1 = uniform(shape)
    u2 = uniform(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def gamma_mt(a_star: float, rate):
    """Marsaglia-Tsang Gamma(a_star)/rate, elementwise on ``rate``; a_star static.

    Marsaglia-Tsang is valid for shape >= 1; shapes below 1 use the standard boost
    G(a) = G(a + 1) * U^(1/a) (Marsaglia & Tsang 2000, section 6), so weak priors
    like a = 1e-3 with a small data increment (a* = a + p/2 < 1) draw from the
    correct distribution."""
    if a_star < 1.0:
        g1 = gamma_mt(a_star + 1.0, jnp.ones(rate.shape, jnp.float32))
        u = uniform(rate.shape)
        return g1 * jnp.exp(jnp.log(u) / a_star) / rate
    d = a_star - 1.0 / 3.0
    c = 1.0 / float(np.sqrt(9.0 * d))
    value = jnp.full(rate.shape, d, jnp.float32)
    accepted = jnp.zeros(rate.shape, jnp.bool_)
    for _ in range(GAMMA_ROUNDS):
        x = normal(rate.shape)
        v = (1.0 + c * x) ** 3
        u = uniform(rate.shape)
        ok = jnp.logical_and(
            v > 0.0,
            jnp.log(u) < 0.5 * x * x + d - d * v + d * jnp.log(jnp.where(v > 0.0, v, 1.0)),
        )
        take = jnp.logical_and(ok, jnp.logical_not(accepted))
        value = jnp.where(take, d * v, value)
        accepted = jnp.logical_or(accepted, ok)
    return value / rate
