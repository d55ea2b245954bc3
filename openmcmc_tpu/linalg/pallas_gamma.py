"""Fused Pallas TPU kernel for Gamma sampling (Marsaglia-Tsang, on-chip PRNG).

The conjugate NormalGamma step draws one Gamma per chain per sweep; with threefry the
PRNG bits dominate the cost (8 candidate rounds x 2 streams). This kernel generates
all candidate randomness from the TPU hardware PRNG and unrolls the squeeze-rejection
rounds as branch-free selects, one VMEM-resident elementwise pass.

Integration mirrors pallas_tridiag: ``gamma`` is a custom_vmap function whose
un-batched path is the XLA Marsaglia-Tsang sampler (linalg.random.fast_gamma) and
whose batched rule dispatches here on TPU.

Measured tradeoff (v5e, 8192 draws/call): statistically exact (KS-clean across
shapes), ~free randomness, but per-launch overhead inside a lax.scan (~200 us) makes
it a net LOSS against threefry for one small draw per sweep iteration -- the conjugate
samplers therefore keep jax.random.gamma. Use this kernel for large one-shot batches
(prior predictive draws, initialization), where it is ~10x faster.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openmcmc_tpu.linalg.random import fast_gamma

_TWO_PI = 6.283185307179586
N_ROUNDS = 6
_LANES = 1024


def _bits_to_uniform(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    i24 = pltpu.bitcast(jnp.right_shift(bits, 8), jnp.int32)
    return (i24.astype(jnp.float32) + 0.5) * (1.0 / 16777216.0)  # (0, 1)


def _kernel(seed_ref, a_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])
    a = a_ref[:, :]
    needs_boost = a < 1.0
    a_eff = jnp.where(needs_boost, a + 1.0, a)
    d = a_eff - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)

    value = d  # fallback if every round misses (prob < 1e-10)
    accepted = jnp.zeros_like(a, dtype=jnp.bool_)
    for _ in range(N_ROUNDS):
        u1 = _bits_to_uniform(a.shape)
        u2 = _bits_to_uniform(a.shape)
        x = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
        v = (1.0 + c * x) ** 3
        u = _bits_to_uniform(a.shape)
        ok = jnp.logical_and(
            v > 0.0,
            jnp.log(u) < 0.5 * x * x + d - d * v + d * jnp.log(jnp.where(v > 0.0, v, 1.0)),
        )
        take = jnp.logical_and(ok, jnp.logical_not(accepted))
        value = jnp.where(take, d * v, value)
        accepted = jnp.logical_or(accepted, ok)

    u_boost = _bits_to_uniform(a.shape)
    value = jnp.where(needs_boost, value * u_boost ** (1.0 / jnp.where(needs_boost, a, 1.0)), value)
    out_ref[:, :] = value


def _pallas_gamma_flat(seed: jnp.ndarray, a_flat: jnp.ndarray) -> jnp.ndarray:
    n = a_flat.shape[0]
    pad = (-n) % _LANES
    a2 = jnp.concatenate([a_flat, jnp.ones((pad,), a_flat.dtype)]) if pad else a_flat
    a2 = a2.reshape(-1, _LANES)
    out = pl.pallas_call(
        _kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a2.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seed, a2)
    return out.reshape(-1)[:n]


@jax.custom_batching.custom_vmap
def gamma(key, a):
    """Gamma(a) draws, elementwise over a. Batched TPU calls use the fused kernel."""
    return fast_gamma(key, a)


@gamma.def_vmap
def _gamma_vmap(axis_size, in_batched, key, a):
    key_batched, a_batched = in_batched
    if jax.default_backend() != "tpu" or not key_batched:
        out = jax.vmap(fast_gamma, in_axes=(0 if key_batched else None, 0 if a_batched else None))(key, a)
        return out, True
    a2 = a if a_batched else jnp.broadcast_to(a, (axis_size,) + a.shape)
    kd = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    seed = (kd[0] ^ kd[kd.shape[0] // 2]).astype(jnp.int32).reshape(1)
    out = _pallas_gamma_flat(seed, a2.reshape(-1).astype(jnp.float32))
    return out.reshape(a2.shape), True
