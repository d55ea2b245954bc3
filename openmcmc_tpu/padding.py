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


def append(arr: jnp.ndarray, value: jnp.ndarray, count, axis: int) -> jnp.ndarray:
    """Write ``value`` at index ``count`` along ``axis`` (the birth move).

    value must have size 1 along ``axis`` (a single new element)."""
    count = jnp.reshape(jnp.asarray(count), ()).astype(jnp.int32)
    start = [0] * arr.ndim
    start[axis] = count
    return lax.dynamic_update_slice(arr, value.astype(arr.dtype), tuple(start))


def delete(arr: jnp.ndarray, index, count, axis: int) -> jnp.ndarray:
    """Order-preserving delete of ``index`` along ``axis`` (the death move).

    Gathers positions [0..index-1, index+1..], shifting the tail left by one, then
    zeroes everything at positions >= count - 1. Matches np.delete + zero-padding."""
    index = jnp.reshape(jnp.asarray(index), ())
    count = jnp.reshape(jnp.asarray(count), ())
    size = arr.shape[axis]
    pos = jnp.arange(size)
    src = jnp.where(pos < index, pos, jnp.minimum(pos + 1, size - 1))
    out = jnp.take(arr, src, axis=axis)
    return mask_along_axis(out, count - 1, axis)


def insert_identity_column(mat: jnp.ndarray, col_index, row_index=None) -> jnp.ndarray:
    """Shift columns of ``mat`` right from ``col_index`` and place the unit vector
    e_{row_index} there (used to build the death-move transition matrix F,
    reference reversible_jump.py:293)."""
    col_index = jnp.reshape(jnp.asarray(col_index), ())
    if row_index is None:
        row_index = col_index
    n = mat.shape[-1]
    pos = jnp.arange(n)
    # columns: for j < col_index keep mat[:, j]; j == col_index -> e_row; j > col_index -> mat[:, j-1]
    shifted = jnp.take(mat, jnp.clip(pos - 1, 0, n - 1), axis=-1)
    keep = jnp.take(mat, pos, axis=-1)
    out = jnp.where((pos > col_index)[None, :], shifted, keep)
    e = (jnp.arange(mat.shape[-2]) == row_index).astype(mat.dtype)
    return jnp.where((pos == col_index)[None, :], e[:, None], out)
