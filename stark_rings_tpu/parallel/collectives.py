"""TPU-lowerable exact collectives for widened (base-2^32 word) sums.

The TPU runtime's all-reduce only lowers 32-bit-native ``Sum``
computations: a ``psum`` over uint64 words turns, after XLA's 64-bit
emulation on 32-bit lanes, into a pair computation the backend rejects
("Supported lowering only of Sum all reduce", observed on the v5e AOT
path).  ``psum_words`` keeps the cross-device reduction exact by
splitting every uint64 word into four 16-bit chunks held in uint32,
psum-ing those natively, and recombining — chunk sums stay below
``P * 2^16 << 2^32`` for any realistic mesh, and the recombination is
exact modulo 2^64, which suffices because the true total is the value
being represented.

This replaces the reference's rayon in-process reductions
(/root/reference/crates/linear_algebra/src/sparse_matrix.rs:202-217)
with a collective that actually lowers on TPU hardware.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["psum_words"]


def psum_words(words, axis_name):
    """Exact cross-device sum of uint64 word arrays.

    ``words``: uint64[...] with true per-device values < 2^64 and a true
    total < 2^64 (the widened-accumulation invariant: words < n * 2^32
    for n local summands).  Returns uint64[...] = sum over ``axis_name``.
    """
    chunks = jnp.stack(
        [((words >> np.uint64(16 * k)) & np.uint64(0xFFFF))
         .astype(jnp.uint32) for k in range(4)])
    tot = jax.lax.psum(chunks, axis_name)          # one u32 all-reduce
    out = tot[0].astype(jnp.uint64)
    for k in range(1, 4):
        out = out + (tot[k].astype(jnp.uint64) << np.uint64(16 * k))
    return out
