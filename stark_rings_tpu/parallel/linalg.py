"""Sharded ring linear algebra: distributed mat-vec over a device mesh.

The dense/sparse matvecs of `stark_rings_tpu.linalg` scale out by sharding
the CONTRACTION (column) axis: each device multiplies its column block
against its slice of the vector and the partial sums meet in one widened
`psum` (exact mod-q: base-2^32 word sums, folded once after the
collective) — the multi-chip version of the reference's rayon row loops
(sparse_matrix.rs:202-217)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..fields import Field
from .collectives import psum_words

__all__ = ["ShardedMatVec"]


class ShardedMatVec:
    """Builder for column-sharded dense mat-vec kernels.

    A: [n, m] + elem, sharded over axis 1 (columns); v: [m] + elem,
    sharded over axis 0. Result: [n] + elem, replicated."""

    def __init__(self, elems, mesh: Mesh, axis: str = "x"):
        self.e = elems
        self.mesh = mesh
        self.axis = axis

    def specs(self):
        nd = self.e.elem_ndim
        tail = (None,) * nd
        return (P(None, self.axis, *tail), P(self.axis, *tail),
                P(*((None,) + tail)))

    def make_matvec_fn(self):
        e = self.e
        f = e.f
        axis = self.axis

        def local(A_blk, v_blk):
            prod = e.mul(A_blk, v_blk[None])        # [n, m_loc]+elem
            w = f.widen(prod)                       # [n, m_loc, ..., W]
            local_words = jnp.sum(w, axis=1)
            total = psum_words(local_words, axis)
            return f.reduce_words(total)

        a_spec, v_spec, out_spec = self.specs()
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=(a_spec, v_spec),
            out_specs=out_spec, check_vma=False))
