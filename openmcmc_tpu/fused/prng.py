"""Shared in-kernel PRNG helpers for fused Pallas engines.

All fused engines draw their randomness from the on-chip TPU PRNG
(``pltpu.prng_random_bits``), seeded per grid program. Box-Muller normals and
fixed-round Marsaglia-Tsang (2000) Gamma draws: a bounded number of vectorized
rejection rounds replaces jax.random.gamma's data-dependent while_loop (each round
accepts with prob > 0.95 for shape > 1, so GAMMA_ROUNDS = 6 leaves a miss
probability < 1e-7; misses fall back to the mode-matched d*v value).

Replaces the scipy RNG layer of the reference (reference gmrf.py:20-26 uses
scipy.stats rvs throughout).

CPU statistical testability: every sampler here takes an optional ``bit_source``
callable ``shape -> uint32 bits``. The default is the on-chip PRNG (usable only
inside a Pallas kernel; the interpret-mode stub returns zeros, so interpret runs
are deterministic pipelines, not statistics). Tests inject a host bit source
(``jax.random.bits``) and run the EXACT math pipeline -- 24-bit mantissa
conversion, Box-Muller, the Marsaglia-Tsang squeeze and the shape < 1 boost --
as plain jnp on CPU, where Kolmogorov-Smirnov / moment tests catch any
regression in the distributional math (tests/test_fused_prng_stats.py).
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586
LOG_2PI = 1.8378770664093453
GAMMA_ROUNDS = 6

# -- host bit source: statistical CI for ASSEMBLED engines on CPU ----------------
#
# Under ``pltpu.force_tpu_interpret_mode()`` the on-chip PRNG is stubbed to zeros,
# so interpret runs of the full engines are deterministic pipelines. Installing a
# :class:`HostBitSource` (via :func:`host_bits`) reroutes every kernel draw through
# a threefry stream computed as ordinary traced jax ops, so the ENTIRE assembled
# engine -- per-grid-program seeding, lane mapping, draw-site sequencing, DMA
# streaming -- runs on CPU with real randomness and its posteriors can be tested
# statistically in ordinary CI (tests/test_fused_engines_cpu_stats.py). Kernels
# participate through two one-line hooks: :func:`seed_bits` instead of
# ``pltpu.prng_seed``, and :func:`begin_iteration` at the top of their fori_loop
# body (the body is traced ONCE, so per-iteration stream variation must fold in
# the traced loop index; draw SITES within a body are distinguished by a Python
# counter that advances during tracing).

_HOST_SOURCE = None


class HostBitSource:
    """Counter-based threefry uint32 stream keyed on (program seed, iteration, site).

    ``collide_programs=True`` is a TEST KNOB that deliberately ignores the
    per-program seed -- every grid program then draws the SAME stream, the bug
    class the cross-program distinctness tests must catch."""

    def __init__(self, collide_programs: bool = False):
        self.collide_programs = collide_programs
        self._key_it = None
        self._key_cur = None
        self._base = None
        self._site = 0

    def seed(self, seed_val):
        import jax

        if self.collide_programs:
            seed_val = jnp.asarray(seed_val, jnp.int32) * 0
        self._base = jax.random.PRNGKey(jnp.asarray(seed_val, jnp.int32))
        self._key_it = self._base  # draws before any begin_iteration
        self._key_cur = self._base
        self._site = 0

    def begin(self, it):
        import jax

        self._key_it = jax.random.fold_in(self._base, it)
        self._key_cur = self._key_it
        self._site = 0

    def begin_inner(self, t):
        import jax

        # inner traced loop (e.g. a streamed tile fori_loop): the body traces
        # once, so per-tile stream variation must fold the traced index in;
        # offset keeps inner keys structurally distinct from outer sites
        self._key_cur = jax.random.fold_in(self._key_it, 1_000_000 + t)
        self._site = 0

    def end_inner(self):
        self._key_cur = self._key_it
        self._site = 500  # outer sites after an inner loop never collide

    def __call__(self, shape):
        import jax

        key = jax.random.fold_in(self._key_cur, self._site)
        self._site += 1
        return jax.random.bits(key, tuple(shape), jnp.uint32)


@contextlib.contextmanager
def host_bits(source: HostBitSource):
    """Install ``source`` as the default bit source for every kernel draw.

    Must wrap the engine call that TRACES the kernels (callers should
    ``jax.clear_caches()`` first: a cached executable traced without the source
    keeps the stubbed zeros)."""
    global _HOST_SOURCE
    prev = _HOST_SOURCE
    _HOST_SOURCE = source
    try:
        yield source
    finally:
        _HOST_SOURCE = prev


def seed_bits(seed_val) -> None:
    """Kernel hook: seed the draw stream (hardware ``pltpu.prng_seed`` in
    production; the installed host source under interpret-mode statistical CI)."""
    if _HOST_SOURCE is not None:
        _HOST_SOURCE.seed(seed_val)
    else:
        pltpu.prng_seed(seed_val)


def begin_iteration(it) -> None:
    """Kernel hook: mark the start of a fori_loop iteration (no-op in production;
    folds the traced loop index into the host stream under statistical CI)."""
    if _HOST_SOURCE is not None:
        _HOST_SOURCE.begin(it)


def begin_inner(t) -> None:
    """Kernel hook: start of an INNER traced loop pass (e.g. one streamed data
    tile). No-op in production (the hardware PRNG is stateful, so a fori body
    traced once still draws fresh bits every pass); folds the traced inner index
    into the host stream under statistical CI, where the trace-once body would
    otherwise replay identical bits for every pass."""
    if _HOST_SOURCE is not None:
        _HOST_SOURCE.begin_inner(t)


def end_inner() -> None:
    """Kernel hook: end of an inner traced loop (pairs with :func:`begin_inner`)."""
    if _HOST_SOURCE is not None:
        _HOST_SOURCE.end_inner()


def _resolve(bit_source):
    if bit_source is not None:
        return bit_source
    return _HOST_SOURCE if _HOST_SOURCE is not None else _tpu_bits


def _mt_rounds(a_star: float) -> int:
    """Squeeze rounds needed for a given STATIC Marsaglia-Tsang shape.

    Measured per-round acceptance (1e6 trials): 0.951 at a=1, 0.992 at a=4,
    0.998 at a=16, 0.9994 at a=51. The tiers below keep the miss probability
    (falling back to the mode-matched d*v init) under ~5e-9 per draw -- well
    under one expected fallback per 100M draws -- while halving the dominant
    gamma cost for the large conjugate shapes (a* = a0 + n/2)."""
    if a_star < 4.0:
        return GAMMA_ROUNDS
    if a_star < 16.0:
        return 4
    return 3


def _tpu_bits(shape):
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def uniform(shape, bit_source=None):
    """U(0, 1) from the active bit source (24-bit mantissa resolution, never 0).

    Default source: the on-chip PRNG in production, or the installed
    :class:`HostBitSource` under interpret-mode statistical CI."""
    src = _resolve(bit_source)
    bits = src(shape)
    shifted = jnp.right_shift(bits, 8)  # top 24 bits: value < 2^24 fits int32 exactly
    if src is _tpu_bits:
        i24 = pltpu.bitcast(shifted, jnp.int32)  # Mosaic-friendly in-kernel cast
    else:
        i24 = shifted.astype(jnp.int32)  # host bit sources run outside Pallas
    return (i24.astype(jnp.float32) + 0.5) * (1.0 / 16777216.0)


def normal(shape, bit_source=None):
    """N(0, 1) via Box-Muller."""
    u1 = uniform(shape, bit_source)
    u2 = uniform(shape, bit_source)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def normal_pair(shape, bit_source=None):
    """N(0, 1) using BOTH Box-Muller outputs (cos and sin of one radius).

    For an even leading dimension this halves the bit-generation, log and sqrt
    work per element relative to :func:`normal` (the two outputs of a Box-Muller
    pair are exactly independent, so the stream stays iid N(0,1)); measured ~35%
    faster for the (p, lanes) draws dominating the spectral engines. Odd leading
    dimensions fall back to :func:`normal`."""
    half = shape[0] // 2
    if half * 2 != shape[0]:
        return normal(shape, bit_source)
    u1 = uniform((half,) + tuple(shape[1:]), bit_source)
    u2 = uniform((half,) + tuple(shape[1:]), bit_source)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = _TWO_PI * u2
    return jnp.concatenate([r * jnp.cos(ang), r * jnp.sin(ang)], axis=0)


def gamma_mt_elem(a_star, rate, bit_source=None):
    """Marsaglia-Tsang Gamma(a_star)/rate with ELEMENTWISE (traced) shape array.

    ``a_star`` may vary per element (e.g. conjugate updates a0 + count/2 where the
    count is a per-chain statistic), but every entry must be >= 1: the squeeze is
    only valid there and the scalar boost of :func:`gamma_mt` cannot be applied
    per element without wasting a full extra draw. Callers (fused/mixture.py
    matcher) must guarantee a_star >= 1 structurally (a0 >= 1)."""
    d = a_star - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)
    value = d
    accepted = jnp.zeros(jnp.shape(rate), jnp.bool_)
    for _ in range(GAMMA_ROUNDS):
        x = normal_icdf(jnp.shape(rate), bit_source)
        v = (1.0 + c * x) ** 3
        u = uniform(jnp.shape(rate), bit_source)
        ok = jnp.logical_and(
            v > 0.0,
            jnp.log(u) < 0.5 * x * x + d - d * v + d * jnp.log(jnp.where(v > 0.0, v, 1.0)),
        )
        take = jnp.logical_and(ok, jnp.logical_not(accepted))
        value = jnp.where(take, d * v, value)
        accepted = jnp.logical_or(accepted, ok)
    return value / rate


def normal_icdf(shape, bit_source=None):
    """N(0, 1) via the Giles (2012) inverse-erf polynomial: z = sqrt(2) erfinv(2u-1).

    ~2.7x cheaper per element than paired Box-Muller on TPU (one log + ~12 FMA
    vs log + sqrt + trig): measured 15 -> 5.5 ms for the spectral smoother's
    (p, lanes) draw. The clamp bounds |z| at ~5.2 sigma -- 2u-1 rounds to
    exactly +-1.0 in f32 for u within 6e-8 of the ends (f32 spacing at 1 is
    1.2e-7), which would give erfinv(+-1) = inf; Box-Muller's own truncation is
    5.9 sigma, and the clipped mass (~1e-7) is far below statistical resolution
    at any chain count in use. Used for ALL fused engines' direct normal draws
    and as the candidate normal inside every Marsaglia-Tsang gamma round; the
    interpret-mode numpy mirrors (tests/test_pallas_interpret.py) encode this
    inverse-CDF stream."""
    u = uniform(shape, bit_source)
    t = jnp.clip(2.0 * u - 1.0, -1.0 + 1.2e-7, 1.0 - 1.2e-7)
    return _SQRT2 * erfinv_poly(t)


def gamma_mt2(a1: float, a2: float, rate1, rate2, bit_source=None):
    """Two independent Gamma draws (static shapes a1, a2 >= 1) sharing round ops.

    ``rate1``/``rate2`` are (1, B) rows. A (1, B) vector op already occupies a
    full 8-sublane register tile on TPU, so running each Marsaglia-Tsang round
    on the STACKED (2, B) array costs the same as one of the two (1, B) rounds —
    measured ~2x over two separate :func:`gamma_mt` calls, which together
    dominate the spectral smoother's iteration cost. Shapes < 1 fall back to
    two boosted gamma_mt calls."""
    if a1 < 1.0 or a2 < 1.0:
        return gamma_mt(a1, rate1, bit_source), gamma_mt(a2, rate2, bit_source)
    rate = jnp.concatenate([rate1, rate2], axis=0)  # (2, B)
    d = jnp.concatenate(
        [jnp.full_like(rate1, a1 - 1.0 / 3.0), jnp.full_like(rate2, a2 - 1.0 / 3.0)], axis=0
    )
    c = 1.0 / jnp.sqrt(9.0 * d)
    value = d
    accepted = jnp.zeros(rate.shape, jnp.bool_)
    for _ in range(max(_mt_rounds(a1), _mt_rounds(a2))):
        x = normal_icdf(rate.shape, bit_source)
        v = (1.0 + c * x) ** 3
        u = uniform(rate.shape, bit_source)
        ok = jnp.logical_and(
            v > 0.0,
            jnp.log(u) < 0.5 * x * x + d - d * v + d * jnp.log(jnp.where(v > 0.0, v, 1.0)),
        )
        take = jnp.logical_and(ok, jnp.logical_not(accepted))
        value = jnp.where(take, d * v, value)
        accepted = jnp.logical_or(accepted, ok)
    out = value / rate
    return out[0:1, :], out[1:2, :]


def erf_poly(x):
    """Abramowitz-Stegun 7.1.26 erf polynomial (max abs err 1.5e-7; f32-exact).

    Mosaic has no lowering for ``lax.erf``, so fused kernels carry their own;
    only exp/divide are used."""
    sgn = jnp.where(x < 0.0, -1.0, 1.0)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sgn * (1.0 - poly * jnp.exp(-ax * ax))


def erfinv_poly(t):
    """Giles (2012) single-precision inverse erf polynomial (linalg/random.py math,
    inlined so kernels have no host dependencies)."""
    w = -jnp.log((1.0 - t) * (1.0 + t))
    w_small = w - 2.5
    w_big = jnp.sqrt(jnp.maximum(w, 1e-30)) - 3.0
    arg = jnp.where(w < 5.0, w_small, w_big)
    cs = [
        (2.81022636e-08, -2.00214257e-04),
        (3.43273939e-07, 1.00950558e-04),
        (-3.5233877e-06, 1.34934322e-03),
        (-4.39150654e-06, -3.67342844e-03),
        (2.1858087e-04, 5.73950773e-03),
        (-1.25372503e-03, -7.62246130e-03),
        (-4.17768164e-03, 9.43887047e-03),
        (2.46640727e-01, 1.00167406e00),
        (1.50140941e00, 2.83297682e00),
    ]
    small = w < 5.0
    p = jnp.where(small, cs[0][0], cs[0][1])
    for a, b in cs[1:]:
        p = p * arg + jnp.where(small, a, b)
    return p * t


_SQRT2 = 1.4142135623730951
_INV_SQRT2 = 0.7071067811865476


def truncnorm_draw(mu, scale, lo, hi, shape, bit_source=None):
    """Inverse-CDF truncated-normal draw on [lo, hi] (in-kernel form of
    linalg/gmrf.py truncated_normal_rv, with the polynomial erf pair)."""
    a = (lo - mu) / scale
    b = (hi - mu) / scale
    ea = erf_poly(a * _INV_SQRT2)
    eb = erf_poly(b * _INV_SQRT2)
    u = uniform(shape, bit_source)
    t = ea + u * (eb - ea)
    z = _SQRT2 * erfinv_poly(jnp.clip(t, -1.0 + 1e-7, 1.0 - 1e-7))
    z = jnp.clip(z, a, b)
    return jnp.clip(mu + scale * z, lo, hi)


def truncnorm_logpdf(x, mu, scale, lo, hi):
    """Truncated-normal log-density on [lo, hi]; the box-mass uses the erf
    difference clamped at 1e-30 (tails beyond f32 resolution at kernel scales).

    Out-of-support points return -inf, matching linalg/gmrf.py
    truncated_normal_log_pdf (and the reference's scipy semantics): an MH
    reverse density evaluated at a current value outside the proposal bounds
    must force rejection -- this bites exactly when a state entered via a
    NON-truncated move (e.g. an RJ birth drawing omega from its untruncated
    Gamma prior) sits outside the random-walk truncation box."""
    a = (lo - mu) / scale
    b = (hi - mu) / scale
    z = (x - mu) / scale
    mass = 0.5 * (erf_poly(b * _INV_SQRT2) - erf_poly(a * _INV_SQRT2))
    dens = -0.5 * (z * z + LOG_2PI) - jnp.log(scale) - jnp.log(jnp.maximum(mass, 1e-30))
    inside = jnp.logical_and(x >= lo, x <= hi)
    return jnp.where(inside, dens, -jnp.inf)


def gamma_mt(a_star: float, rate, bit_source=None):
    """Marsaglia-Tsang Gamma(a_star)/rate, elementwise on ``rate``; a_star static.

    Marsaglia-Tsang is valid for shape >= 1; shapes below 1 use the standard boost
    G(a) = G(a + 1) * U^(1/a) (Marsaglia & Tsang 2000, section 6), so weak priors
    like a = 1e-3 with a small data increment (a* = a + p/2 < 1) draw from the
    correct distribution."""
    if a_star < 1.0:
        g1 = gamma_mt(a_star + 1.0, jnp.ones(rate.shape, jnp.float32), bit_source)
        u = uniform(rate.shape, bit_source)
        return g1 * jnp.exp(jnp.log(u) / a_star) / rate
    d = a_star - 1.0 / 3.0
    c = 1.0 / float(np.sqrt(9.0 * d))
    value = jnp.full(rate.shape, d, jnp.float32)
    accepted = jnp.zeros(rate.shape, jnp.bool_)
    for _ in range(_mt_rounds(a_star)):
        x = normal_icdf(rate.shape, bit_source)
        v = (1.0 + c * x) ** 3
        u = uniform(rate.shape, bit_source)
        ok = jnp.logical_and(
            v > 0.0,
            jnp.log(u) < 0.5 * x * x + d - d * v + d * jnp.log(jnp.where(v > 0.0, v, 1.0)),
        )
        take = jnp.logical_and(ok, jnp.logical_not(accepted))
        value = jnp.where(take, d * v, value)
        accepted = jnp.logical_or(accepted, ok)
    return value / rate
