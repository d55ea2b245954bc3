"""Fused Pallas TPU kernel for canonical tridiagonal Gaussian sampling.

The hottest operation in every GMRF Gibbs sweep is drawing
x ~ N(Q^{-1} b, Q^{-1}) for a tridiagonal precision Q (Rue & Held Alg 2.5; the
reference bottoms out in SuperLU, reference gmrf.py:167-198,489-520). The XLA path
(associative scans, structured.py) costs ~700 us per sweep at 8192 chains; this kernel
fuses the whole draw into one pass over VMEM:

    1. Thomas/Cholesky recurrence  ld_i = sqrt(a_i - (c_{i-1}/ld_{i-1})^2)
    2. forward substitution        w_i  = (b_i - l_{i-1} w_{i-1}) / ld_i
    3. Box-Muller noise z from the on-chip PRNG (pltpu.prng_random_bits)
    4. one backward substitution   x = L^{-T} (w + z)

Data layout: chains on the LANE axis. Blocks are (P, BLOCK_B): each sequential step i
touches one (1, BLOCK_B) row = full 128-lane vectors, so the inherently serial
dimension costs ~P vector ops while thousands of chains ride the lanes. The wrapper
transposes from the driver's (B, P) layout (one XLA transpose each way).

Integration: :func:`sample_canonical_tridiag` is a ``jax.custom_batching.custom_vmap``
function -- un-batched callers get the associative-scan path, and the driver's vmap
over chains dispatches here. PRNG note: the kernel uses the TPU hardware PRNG seeded
from the caller's key, so draws differ from (but are statistically equivalent to) the
threefry path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 2048
_TWO_PI = 6.283185307179586


CHUNK = 8  # rows per dynamic slice; inner substeps statically unrolled


def _kernel(seed_ref, a_ref, c_ref, b_ref, x_ref, ld_ref, u_ref, cprev_ref):
    """One program handles a (P_pad, BLOCK_B) block of chains.

    The sequential recurrences process CHUNK rows per dynamic slice with a statically
    unrolled inner loop: per-row work is pure register ops instead of per-row VMEM
    dynamic slices. cprev (the shifted subdiagonal, cprev_i = c_{i-1}) is built once
    into scratch so forward-pass chunk slices align with the row index.
    """
    p = a_ref.shape[0]
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    cprev_ref[pl.ds(1, p - 1), :] = c_ref[pl.ds(0, p - 1), :]
    cprev_ref[0:1, :] = jnp.zeros((1, BLOCK_B), jnp.float32)

    # Box-Muller normals for the whole block from the on-chip PRNG
    bits1 = pltpu.bitcast(pltpu.prng_random_bits((p, BLOCK_B)), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits((p, BLOCK_B)), jnp.uint32)
    # 24-bit mantissa uniforms in (0, 1]; top 24 bits fit in a positive int32
    # (Mosaic has no uint32->f32 cast, so go through int32)
    i24_1 = pltpu.bitcast(jnp.right_shift(bits1, 8), jnp.int32)
    i24_2 = pltpu.bitcast(jnp.right_shift(bits2, 8), jnp.int32)
    u1 = (i24_1.astype(jnp.float32) + 1.0) * (1.0 / 16777216.0)
    u2 = i24_2.astype(jnp.float32) * (1.0 / 16777216.0)
    z_all = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
    u_ref[:, :] = z_all  # z now; z + w after the forward pass

    ones = jnp.ones((1, BLOCK_B), jnp.float32)
    zeros = jnp.zeros((1, BLOCK_B), jnp.float32)
    n_chunks = p // CHUNK

    def fwd(ci, carry):
        ld_prev, w_prev = carry
        base = ci * CHUNK
        a_ch = a_ref[pl.ds(base, CHUNK), :]
        cp_ch = cprev_ref[pl.ds(base, CHUNK), :]
        b_ch = b_ref[pl.ds(base, CHUNK), :]
        z_ch = u_ref[pl.ds(base, CHUNK), :]
        ld_rows = []
        u_rows = []
        for k in range(CHUNK):
            l_prev = cp_ch[k : k + 1, :] / ld_prev
            ld = jnp.sqrt(a_ch[k : k + 1, :] - l_prev * l_prev)
            w = (b_ch[k : k + 1, :] - l_prev * w_prev) / ld
            ld_rows.append(ld)
            u_rows.append(w + z_ch[k : k + 1, :])
            ld_prev, w_prev = ld, w
        ld_ref[pl.ds(base, CHUNK), :] = jnp.concatenate(ld_rows, axis=0)
        u_ref[pl.ds(base, CHUNK), :] = jnp.concatenate(u_rows, axis=0)
        return ld_prev, w_prev

    lax.fori_loop(0, n_chunks, fwd, (ones, zeros))

    def bwd(cj, x_next):
        base = (n_chunks - 1 - cj) * CHUNK
        ld_ch = ld_ref[pl.ds(base, CHUNK), :]
        # c_{p-1} is zero by the band-storage convention, so the top row couples to
        # nothing even though x_next starts from the (discarded) padded rows
        c_ch = c_ref[pl.ds(base, CHUNK), :]
        u_ch = u_ref[pl.ds(base, CHUNK), :]
        x_rows = [None] * CHUNK
        for k in reversed(range(CHUNK)):
            ld = ld_ch[k : k + 1, :]
            x_next = (u_ch[k : k + 1, :] - (c_ch[k : k + 1, :] / ld) * x_next) / ld
            x_rows[k] = x_next
        x_ref[pl.ds(base, CHUNK), :] = jnp.concatenate(x_rows, axis=0)
        return x_next

    lax.fori_loop(0, n_chunks, bwd, zeros)


@functools.partial(jax.jit, static_argnames=())
def _pallas_batched(seed: jnp.ndarray, a: jnp.ndarray, c: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched draw: a, c, b are (B, P); returns (B, P) samples."""
    n_b, p = a.shape
    pad = (-n_b) % BLOCK_B
    if pad:
        ones = jnp.ones((pad, p), a.dtype)
        a = jnp.concatenate([a, ones], 0)
        c = jnp.concatenate([c, jnp.zeros((pad, p), c.dtype)], 0)
        b = jnp.concatenate([b, jnp.zeros((pad, p), b.dtype)], 0)
    p_pad = (-p) % CHUNK
    if p_pad:
        # pad the time dimension with an identity block (a=1, c=0, b=0)
        a = jnp.concatenate([a, jnp.ones((a.shape[0], p_pad), a.dtype)], 1)
        c = jnp.concatenate([c, jnp.zeros((c.shape[0], p_pad), c.dtype)], 1)
        b = jnp.concatenate([b, jnp.zeros((b.shape[0], p_pad), b.dtype)], 1)
    total = a.shape[0]
    p_full = p + p_pad
    at, ct, bt = a.T, c.T, b.T  # (P, B): chains on lanes

    grid = (total // BLOCK_B,)
    spec = pl.BlockSpec((p_full, BLOCK_B), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            spec,
            spec,
            spec,
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((p_full, total), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((p_full, BLOCK_B), jnp.float32),
            pltpu.VMEM((p_full, BLOCK_B), jnp.float32),
            pltpu.VMEM((p_full, BLOCK_B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seed, at, ct, bt)
    return out.T[:n_b, :p]


def _unbatched_fallback(key, b, bands):
    from openmcmc_tpu.linalg import gmrf

    from openmcmc_tpu.linalg import structured as st

    return gmrf.sample_normal_canonical(key, b, Q=st.Banded(bands), _allow_pallas=False)


@jax.custom_batching.custom_vmap
def sample_canonical_tridiag(key, b, bands):
    """x ~ N(Q^{-1} b, Q^{-1}) for tridiagonal Q in band storage (2, P).

    b: (P,) or (P, 1). Un-batched calls use the associative-scan path; vmapped calls
    (the driver's chain batching) dispatch to the fused Pallas kernel on TPU.
    """
    return _unbatched_fallback(key, b, bands)


@sample_canonical_tridiag.def_vmap
def _sample_canonical_tridiag_vmap(axis_size, in_batched, key, b, bands):
    key_batched, b_batched, bands_batched = in_batched
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu or not key_batched:
        out = jax.vmap(
            _unbatched_fallback,
            in_axes=(0 if key_batched else None, 0 if b_batched else None, 0 if bands_batched else None),
        )(key, b, bands)
        return out, True

    b2 = b if b_batched else jnp.broadcast_to(b, (axis_size,) + b.shape)
    bands2 = bands if bands_batched else jnp.broadcast_to(bands, (axis_size,) + bands.shape)
    # output shape must match the primal path: sample_normal returns a (p, 1) column
    # for flat (p,) input (reference gmrf.py:29-61 convention)
    b_shape = b2.shape[1:]
    if len(b_shape) == 1:
        b_shape = b_shape + (1,)
    bv = b2.reshape(axis_size, -1)
    a = bands2[:, 0, :]
    c = bands2[:, 1, :]
    # derive one int32 kernel seed from the (batched) key material
    kd = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    seed = (kd[0] ^ kd[kd.shape[0] // 2]).astype(jnp.int32).reshape(1)
    x = _pallas_batched(seed, a, c, bv)
    return x.reshape((axis_size,) + b_shape), True
