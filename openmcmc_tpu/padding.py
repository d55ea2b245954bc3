"""Padded variable-dimension state: the TPU-native representation for reversible jump.

The reference changes array shapes on birth/death moves (np.concatenate /
np.delete, reference reversible_jump.py:129-132,173-176), which is incompatible with
XLA's static shapes. Here every variable-dimension parameter is padded to a maximum
size with an integer *active count* carried in the state (the reference's own
``max_variable_size`` storage convention, reference sampler/sampler.py:81-87,
anticipates exactly this layout):

- active entries occupy indices 0..count-1 along the variable axis,
- padding entries are ZERO (so, e.g., padded basis columns times padded coefficient
  rows contribute nothing to predictors),
- birth appends at index ``count``; death deletes order-preservingly by gathering
  indices [0..j-1, j+1..count-1] and zeroing the tail (same semantics as np.delete).

All helpers are pure jnp and safe under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def active_mask(count, size: int, dtype=None) -> jnp.ndarray:
    """(size,) mask: 1.0 for indices < count, else 0.0."""
    count = jnp.reshape(jnp.asarray(count), ())
    mask = (jnp.arange(size) < count)
    return mask if dtype is None else mask.astype(dtype)


def mask_along_axis(arr: jnp.ndarray, count, axis: int) -> jnp.ndarray:
    """Zero out entries at positions >= count along ``axis``."""
    m = active_mask(count, arr.shape[axis], dtype=arr.dtype)
    shape = [1] * arr.ndim
    shape[axis] = arr.shape[axis]
    return arr * m.reshape(shape)


def _axis_iota(size: int, axis: int, ndim: int) -> jnp.ndarray:
    """(1,..,size,..,1) position iota along ``axis`` for broadcasting against arr."""
    shape = [1] * ndim
    shape[axis] = size
    return jnp.arange(size).reshape(shape)


def append(arr: jnp.ndarray, value: jnp.ndarray, count, axis: int) -> jnp.ndarray:
    """Write ``value`` at index ``count`` along ``axis`` (the birth move).

    value must have size 1 along ``axis`` (a single new element).

    Implemented as a one-hot ``where`` select, NOT ``lax.dynamic_update_slice``: under
    vmap a dynamic-update-slice with per-chain start indices lowers to an XLA scatter
    that TPU executes as a serialized per-batch-element loop (profiled at ~1 ms per
    occurrence for 2048 chains); the select is a single vectorized VPU op."""
    count = jnp.reshape(jnp.asarray(count), ()).astype(jnp.int32)
    pos = _axis_iota(arr.shape[axis], axis, arr.ndim)
    return jnp.where(pos == count, value.astype(arr.dtype), arr)


def delete(arr: jnp.ndarray, index, count, axis: int) -> jnp.ndarray:
    """Order-preserving delete of ``index`` along ``axis`` (the death move).

    Shifts the tail left by one and zeroes everything at positions >= count - 1.
    Matches np.delete + zero-padding. Implemented as a static one-step shift plus a
    positional ``where`` (a ``jnp.take`` with traced indices becomes a TPU gather with
    per-chain index vectors -- measurably slow under vmap)."""
    index = jnp.reshape(jnp.asarray(index), ())
    count = jnp.reshape(jnp.asarray(count), ())
    size = arr.shape[axis]
    pos = _axis_iota(size, axis, arr.ndim)
    # shifted[pos] = arr[pos + 1]; the (dropped) last position is zero-filled
    tail = lax.slice_in_dim(arr, 1, size, axis=axis)
    zero = jnp.zeros_like(lax.slice_in_dim(arr, 0, 1, axis=axis))
    shifted = jnp.concatenate([tail, zero], axis=axis)
    out = jnp.where(pos < index, arr, shifted)
    return mask_along_axis(out, count - 1, axis)


def insert_identity_column(mat: jnp.ndarray, col_index, row_index=None) -> jnp.ndarray:
    """Shift columns of ``mat`` right from ``col_index`` and place the unit vector
    e_{row_index} there (used to build the death-move transition matrix F,
    reference reversible_jump.py:293). Static-shift + select (no gathers)."""
    col_index = jnp.reshape(jnp.asarray(col_index), ())
    if row_index is None:
        row_index = col_index
    n = mat.shape[-1]
    pos = jnp.arange(n)
    # columns: for j < col_index keep mat[:, j]; j == col_index -> e_row; j > col_index -> mat[:, j-1]
    shifted = jnp.concatenate([mat[..., :, :1], mat[..., :, :-1]], axis=-1)
    out = jnp.where((pos > col_index)[None, :], shifted, mat)
    e = (jnp.arange(mat.shape[-2]) == row_index).astype(mat.dtype)
    return jnp.where((pos == col_index)[None, :], e[:, None], out)


def take_column(arr: jnp.ndarray, index, axis: int) -> jnp.ndarray:
    """Extract the single slice at (traced) ``index`` along ``axis``, keeping the axis
    with size 1: a one-hot masked reduction instead of ``lax.dynamic_slice`` (which
    under vmap becomes a per-chain-index gather)."""
    index = jnp.reshape(jnp.asarray(index), ())
    pos = _axis_iota(arr.shape[axis], axis, arr.ndim)
    onehot = (pos == index).astype(arr.dtype)
    return jnp.sum(arr * onehot, axis=axis, keepdims=True)


def insert_column(mat: jnp.ndarray, column: jnp.ndarray, col_index) -> jnp.ndarray:
    """Shift columns of ``mat`` right from ``col_index`` and place ``column``
    ((..., p, 1)) there (generalization of insert_identity_column; static-shift +
    select, no gathers)."""
    col_index = jnp.reshape(jnp.asarray(col_index), ())
    n = mat.shape[-1]
    pos = jnp.arange(n)
    shifted = jnp.concatenate([mat[..., :, :1], mat[..., :, :-1]], axis=-1)
    out = jnp.where((pos > col_index)[None, :], shifted, mat)
    return jnp.where((pos == col_index)[None, :], column, out)
