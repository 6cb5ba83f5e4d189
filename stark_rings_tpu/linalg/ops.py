"""Transpose / rounded_div (reference linear_algebra/src/ops.rs)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["transpose", "rounded_div_jnp", "pad_ragged"]


def transpose(vals, elem_ndim: int):
    """Transpose the two leading (row, col) axes of a matrix-of-elements
    tensor (ops.rs:9-62).  Element axes (trailing) are untouched."""
    return jnp.swapaxes(vals, 0, 1)


def pad_ragged(rows, elem_shape, dtype):
    """Pad a list of unequal-length per-row element arrays with zeros
    (Transpose for Vec<Vec<R>>, ops.rs:13-34) -> rectangular np array."""
    ncols = max((len(r) for r in rows), default=0)
    out = np.zeros((len(rows), ncols) + tuple(elem_shape), dtype=dtype)
    for i, r in enumerate(rows):
        if len(r):
            out[i, : len(r)] = r
    return out


def rounded_div_jnp(a, b):
    """Round-half-away-from-zero signed integer division (ops.rs:64-80).

    a, b: int arrays (b may be scalar)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    abs_a, abs_b = jnp.abs(a), jnp.abs(b)
    mag = (abs_a + abs_b // 2) // abs_b
    neg = (a < 0) != (b < 0)
    return jnp.where(neg, -mag, mag)
