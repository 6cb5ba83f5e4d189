"""Dense constant modular matrices: the small-D CRT/ICRT as ONE fused op.

The reference's per-model CRT kernels are chains of butterfly layers and
slot isomorphisms (goldilocks/ntt.rs:68-127, babybear/ntt.rs:143-317);
round 1 ran them as 8-9 chained two-term gather stages — correct but
latency-bound for D <= 72.  Since the whole chain is one Fq-linear map,
we probe the integer-exact spec with basis vectors once and apply the
composite as a single D x D modular mat-vec over the batch: one fused
XLA kernel instead of a 9-deep dependency chain (SURVEY §7's "one D x D
constant matmul per model").

Generic over every field, including the 8-limb stark prime: Montgomery
storage commutes with Fq-linear maps (y*R = M @ (x*R) mod q), so the
encoded matrix applies directly to storage values.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np

from ..fields import Field

__all__ = ["DenseModMat", "probe_dense_matrix"]


def probe_dense_matrix(fn: Callable[[Sequence[int]], Sequence[int]],
                       d_in: int, d_out: int, q: int) -> np.ndarray:
    """Probe a linear function on int lists with basis vectors.

    Returns the [d_out, d_in] object-int matrix M with fn(x) = M @ x."""
    m = np.zeros((d_out, d_in), dtype=object)
    for j in range(d_in):
        e = [0] * d_in
        e[j] = 1
        col = fn(e)
        for i in range(d_out):
            m[i, j] = col[i] % q
    return m


class DenseModMat:
    """Constant [R, C] matrix over Fq applied along the coefficient axis.

    ``x`` has shape [..., C(, limbs)]; returns [..., R(, limbs)].
    """

    def __init__(self, field: Field, m_ints):
        self.f = field
        m = np.asarray(m_ints, dtype=object)
        self.R, self.C = m.shape
        self.m = field.encode(m)       # storage [R, C(, L)]

    def __call__(self, x):
        f = self.f
        if f.limbed:
            prod = f.mul(self.m, x[..., None, :, :])
            return f.sum(prod, axis=-2)
        prod = f.mul(self.m, x[..., None, :])
        return f.sum(prod, axis=-1)
