"""Fused Pallas TPU kernel for the truncated-normal coordinate Gibbs sweep.

The reference's truncated canonical Gaussian sampler is an irreducibly sequential
per-dimension loop (reference gmrf.py:201-266): each coordinate draws a 1-D truncated
normal whose conditional mean depends on the just-updated neighbors. The XLA version
(lax.scan over coordinates) pays per-step overhead p times per sweep; this kernel runs
the whole sweep in one launch, chains on the lane axis, with all uniforms generated
upfront from the on-chip PRNG.

Tridiagonal precisions only: cond_mean_i = (b_i - c_{i-1} x_{i-1} - c_i x_{i+1}) / a_i.
The inverse normal CDF uses the hardware-lowered ``lax.erf_inv``; the forward CDF uses
an Abramowitz-Stegun 7.1.26 polynomial erf (|err| < 1.5e-7 -- far below MC noise).

Measured (v5e, 4096 chains, P=50): statistically indistinguishable from the scan path
(stationary moments match), but per-coordinate transcendental math dominates both
implementations, so the kernel is only ~even with XLA (2.5 ms vs 2.3 ms per sweep).
Disabled by default (ENABLE_PALLAS_TRUNCATED = False); kept as the substrate for
future multi-sweep fusion (running K thinning sweeps per launch would amortize
everything outside the transcendentals).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ENABLE_PALLAS_TRUNCATED = False
BLOCK_B = 2048
_SQRT2 = 1.4142135623730951
_INV_SQRT2 = 0.7071067811865475


def _erf_poly(x):
    """A&S 7.1.26 polynomial erf, |error| < 1.5e-7, via odd extension."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _ndtr(z):
    return 0.5 * (1.0 + _erf_poly(z * _INV_SQRT2))


def _kernel(seed_ref, a_ref, c_ref, b_ref, x0_ref, lo_ref, hi_ref, x_ref, u_ref):
    p = a_ref.shape[0]
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    # all uniforms generated once into scratch; rows read back per coordinate
    bits = pltpu.bitcast(pltpu.prng_random_bits((p, BLOCK_B)), jnp.uint32)
    i24 = pltpu.bitcast(jnp.right_shift(bits, 8), jnp.int32)
    u_ref[:, :] = (i24.astype(jnp.float32) + 0.5) * (1.0 / 16777216.0)  # (0, 1)

    x_ref[:, :] = x0_ref[:, :]
    zeros = jnp.zeros((1, BLOCK_B), jnp.float32)

    def body(i, x_prev):
        a_i = a_ref[pl.ds(i, 1), :]
        s = jax.lax.rsqrt(a_i)
        inv = s * s
        c_prev = jnp.where(i > 0, c_ref[pl.ds(jnp.maximum(i - 1, 0), 1), :], zeros)
        c_i = jnp.where(i < p - 1, c_ref[pl.ds(i, 1), :], zeros)
        x_next = x_ref[pl.ds(jnp.minimum(i + 1, p - 1), 1), :]
        m = inv * (b_ref[pl.ds(i, 1), :] - c_prev * x_prev - c_i * x_next)

        lo = lo_ref[pl.ds(i, 1), :]
        hi = hi_ref[pl.ds(i, 1), :]
        alpha = jnp.clip((lo - m) / s, -8.0, 8.0)
        beta = jnp.clip((hi - m) / s, -8.0, 8.0)
        fa = _ndtr(alpha)
        fb = _ndtr(beta)
        q = fa + u_ref[pl.ds(i, 1), :] * (fb - fa)
        q = jnp.clip(q, 1e-7, 1.0 - 1e-7)
        z = _SQRT2 * lax.erf_inv(2.0 * q - 1.0)
        xi = jnp.clip(m + s * z, lo, hi)
        x_ref[pl.ds(i, 1), :] = xi
        return xi

    lax.fori_loop(0, p, body, zeros)


def _pallas_gibbs_batched(seed, a, c, b, x0, lo, hi):
    """All inputs (B, P); returns (B, P) one-sweep updates."""
    n_b, p = a.shape
    pad = (-n_b) % BLOCK_B
    if pad:
        def padrow(arr, fill):
            return jnp.concatenate([arr, jnp.full((pad, p), fill, arr.dtype)], 0)

        a, c, b, x0 = padrow(a, 1.0), padrow(c, 0.0), padrow(b, 0.0), padrow(x0, 0.0)
        lo, hi = padrow(lo, -1.0), padrow(hi, 1.0)
    total = a.shape[0]
    args = [v.T for v in (a, c, b, x0, lo, hi)]  # (P, B): chains on lanes
    spec = pl.BlockSpec((p, BLOCK_B), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(total // BLOCK_B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 6,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((p, total), jnp.float32),
        scratch_shapes=[pltpu.VMEM((p, BLOCK_B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seed, *args)
    return out.T[:n_b]


def _fallback(key, b, bands, x, lo, hi):
    from openmcmc_tpu.linalg import gmrf
    from openmcmc_tpu.linalg import structured as st

    return gmrf.gibbs_canonical_truncated_normal(
        key, b, st.Banded(bands), x, lower=lo.reshape(-1, 1), upper=hi.reshape(-1, 1), _allow_pallas=False
    )


@jax.custom_batching.custom_vmap
def gibbs_truncated_tridiag(key, b, bands, x, lo, hi):
    """One truncated coordinate-Gibbs sweep for tridiagonal Q in band storage.

    b, x: (P, 1); lo, hi: (P,) finite-or-±inf bounds. Batched TPU calls run the fused
    kernel; un-batched calls use the coordinate scan.
    """
    return _fallback(key, b, bands, x, lo, hi)


@gibbs_truncated_tridiag.def_vmap
def _gibbs_truncated_vmap(axis_size, in_batched, key, b, bands, x, lo, hi):
    key_b = in_batched[0]
    if jax.default_backend() != "tpu" or not key_b:
        axes = tuple(0 if bt else None for bt in in_batched)
        out = jax.vmap(_fallback, in_axes=axes)(key, b, bands, x, lo, hi)
        return out, True

    def bcast(v, batched):
        return v if batched else jnp.broadcast_to(v, (axis_size,) + v.shape)

    b2, bands2, x2, lo2, hi2 = (
        bcast(v, bt) for v, bt in zip((b, bands, x, lo, hi), in_batched[1:])
    )
    out_shape = x2.shape[1:]
    kd = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    seed = (kd[0] ^ kd[kd.shape[0] // 2]).astype(jnp.int32).reshape(1)
    p = bands2.shape[-1]
    xs = _pallas_gibbs_batched(
        seed,
        bands2[:, 0, :],
        bands2[:, 1, :],
        b2.reshape(axis_size, p),
        x2.reshape(axis_size, p),
        jnp.broadcast_to(lo2.reshape(axis_size, -1), (axis_size, p)).astype(jnp.float32),
        jnp.broadcast_to(hi2.reshape(axis_size, -1), (axis_size, p)).astype(jnp.float32),
    )
    return xs.reshape((axis_size,) + out_shape), True
