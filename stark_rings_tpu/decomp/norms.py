"""Norms over signed representatives (reference traits.rs:6-56:
WithL2Norm -> BigUint, WithLinfNorm -> BigUint; blanket impls for slices).

Host-side exact norms return python ints (the reference returns BigUint —
arbitrary precision).  ``linf_norm`` in `.balanced` is the traced device
Linf; ``l2_norm_squared_words`` below is the traced device L2: the exact
(NOT mod-q) sum of squared signed magnitudes as little-endian base-2^32
words, so a 2^16-coeff witness norm check never round-trips through host
object arrays.  Squaring is a word-convolution of the base-2^32 magnitude
words (every partial product < 2^64 splits into two < 2^32 terms, so
plain uint64 adds stay exact for > 2^28 elements), followed by one carry
normalization."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..fields import Field
from ..spec.field import to_signed

__all__ = [
    "l2_norm_squared", "linf_norm_exact",
    "l2_norm_squared_words", "words_to_int", "int_to_words", "l2_check",
]

_MASK32 = np.uint64(0xFFFFFFFF)


def _signed_iter(f: Field, x):
    vals = f.decode(x)
    for v in np.asarray(vals, dtype=object).reshape(-1):
        yield to_signed(int(v), f.q)


def l2_norm_squared(f: Field, x) -> int:
    """sum of squared signed representatives (WithL2Norm) — host exact."""
    return sum(s * s for s in _signed_iter(f, x))


def linf_norm_exact(f: Field, x) -> int:
    """max |signed representative| (WithLinfNorm) — host exact."""
    return max((abs(s) for s in _signed_iter(f, x)), default=0)


def _square_words(w):
    """Exact square of a base-2^32 word vector: uint64[..., W] (words
    < 2^32) -> uint64[..., 2W+1] unnormalized words (each < ~2^37)."""
    W = w.shape[-1]
    acc = [None] * (2 * W + 1)

    def _add(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v

    for i in range(W):
        for j in range(i, W):
            p = w[..., i] * w[..., j]          # < 2^64, exact in uint64
            lo, hi = p & _MASK32, p >> np.uint64(32)
            reps = 1 if j == i else 2          # 2*p would overflow; split
            for _ in range(reps):
                _add(i + j, lo)
                _add(i + j + 1, hi)
    zero = jnp.zeros(w.shape[:-1], dtype=jnp.uint64)
    return jnp.stack([a if a is not None else zero for a in acc], axis=-1)


def _normalize_words(words, extra: int = 2):
    """Carry-propagate unnormalized uint64 words into proper base-2^32
    little-endian form (each output word < 2^32), appending ``extra``
    overflow words."""
    digits = []
    carry = jnp.zeros(words.shape[:-1], dtype=jnp.uint64)
    for j in range(words.shape[-1]):
        s = words[..., j] + carry
        digits.append(s & _MASK32)
        carry = s >> np.uint64(32)
    for _ in range(extra):
        digits.append(carry & _MASK32)
        carry = carry >> np.uint64(32)
    return jnp.stack(digits, axis=-1)


def l2_norm_squared_words(f: Field, x, axis=None, chunk_n=None):
    """Traced exact sum of squared signed magnitudes.

    Returns normalized little-endian base-2^32 words uint64[..., W_out]
    whose integer value equals :func:`l2_norm_squared` over the reduced
    axes (axis=None reduces every element axis; an int/tuple axis keeps
    the rest batched — the batched norm surface folding provers need).
    Decode on host with :func:`words_to_int`.

    Exactness is unconditional: each unnormalized square word carries at
    most 2W terms < 2^32, so a plain uint64 sum stays exact only up to
    2^32/(2W) reduced elements (~1e9 non-limbed, ~2.7e8 for the 8-limb
    field).  Past that STATIC bound the reduction runs in chunks with a
    carry normalization between chunks (normalized words are < 2^32, so
    the chunk-partial sum is exact for any realizable chunk count)."""
    from .balanced import signed_magnitude

    _, mag = signed_magnitude(f, x)
    w = f.widen(mag)                      # uint64 [..., elem..., W]
    sq = _square_words(w)                 # [..., elem..., 2W+1]
    if axis is None:
        red = tuple(range(sq.ndim - 1))
    else:
        if isinstance(axis, int):
            axis = (axis,)
        red = tuple(a % (sq.ndim - 1) for a in axis)
    if not red:
        return _normalize_words(sq)
    n_red = 1
    for a in red:
        n_red *= sq.shape[a]
    max_terms = 2 * w.shape[-1]           # per-word terms in _square_words
    safe_n = (1 << 32) // max_terms       # n * max_terms * (2^32-1) < 2^64
    if chunk_n is not None:               # test hook: force the chunk path
        safe_n = int(chunk_n)
    if n_red <= safe_n:
        return _normalize_words(jnp.sum(sq, axis=red))
    # chunked exact reduction: flatten the reduced axes to the front,
    # normalize each chunk's partial sum before combining
    sq = jnp.moveaxis(sq, red, tuple(range(len(red))))
    sq = sq.reshape((n_red,) + tuple(sq.shape[len(red):]))
    partials = []
    for s0 in range(0, n_red, safe_n):
        chunk = sq[s0:min(s0 + safe_n, n_red)]
        partials.append(_normalize_words(jnp.sum(chunk, axis=0)))
    # normalized words are < 2^32 and the chunk count is far below 2^32,
    # so one more plain uint64 sum over the partials is exact
    return _normalize_words(sum(partials[1:], start=partials[0]))


def words_to_int(words) -> int:
    """Host decode: little-endian base-2^32 words -> python int."""
    w = np.asarray(words, dtype=np.uint64)
    assert w.ndim == 1, "pass one norm's words (index batched results)"
    return sum(int(d) << (32 * j) for j, d in enumerate(w))


def int_to_words(v: int, n_words: int):
    """Host encode: python int -> uint64[n_words] base-2^32 words."""
    assert v >= 0 and v < 1 << (32 * n_words), (v, n_words)
    return jnp.asarray(
        [(v >> (32 * j)) & 0xFFFFFFFF for j in range(n_words)],
        dtype=jnp.uint64)


def l2_check(f: Field, x, bound_sq: int, axis=None):
    """Traced norm check: ||x||_2^2 <= bound_sq, elementwise over the
    non-reduced axes.  The comparison is a lexicographic word compare
    (most-significant first) — no host round trip.  A bound too large
    for the norm's word count is mathematically always satisfied."""
    words = l2_norm_squared_words(f, x, axis=axis)
    W = words.shape[-1]
    if bound_sq >= 1 << (32 * W):
        return jnp.ones(words.shape[:-1], dtype=bool)
    bw = int_to_words(bound_sq, W)
    le = jnp.ones(words.shape[:-1], dtype=bool)
    decided = jnp.zeros_like(le)
    for j in reversed(range(W)):
        lt = words[..., j] < bw[j]
        gt = words[..., j] > bw[j]
        le = jnp.where(~decided & lt, True,
                       jnp.where(~decided & gt, False, le))
        decided = decided | lt | gt
    return le
