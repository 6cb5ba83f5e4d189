"""Sharded dense MLE operations over a device mesh.

Evaluations [2^n] are sharded in contiguous blocks over a 1-D mesh axis,
i.e. the TOP log2(P) variables (little-endian convention: variable 0 is
the least-significant index bit, reference mle/dense.rs:171-199) are the
shard index.  Consequences:

* ``fix_variables`` on the FIRST k variables is embarrassingly local for
  k <= n - log2(P): pairs (2b, 2b+1) never cross a shard.
* finishing an evaluation (k > n - log2(P)) needs one tiny collective:
  an ``all_gather`` of the per-device scalars followed by a replicated
  log2(P)-step lerp.
* inner products / sums over the hypercube are local widened sums + one
  ``psum`` (the reference's rayon reduction, done with collectives).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..fields import Field
from .collectives import psum_words

__all__ = ["ShardedMLE"]


class ShardedMLE:
    """Factory for mesh-sharded dense-MLE kernels over one field."""

    def __init__(self, field: Field, num_vars: int, mesh: Mesh,
                 axis: str = "x"):
        self.f = field
        self.nv = num_vars
        self.mesh = mesh
        self.axis = axis
        self.P = mesh.shape[axis]
        assert (1 << num_vars) % self.P == 0
        self.logP = self.P.bit_length() - 1
        assert num_vars >= self.logP

    def spec(self):
        tail = (None,) * (1 if self.f.limbed else 0)
        return P(self.axis, *tail)

    # -- local bodies (run inside shard_map) ------------------------------
    def _local_fix(self, evals, points):
        f = self.f
        ev = evals
        for r in points:
            half = ev.shape[0] // 2
            ev2 = ev.reshape((half, 2) + ev.shape[1:])
            left = ev2[:, 0]
            right = ev2[:, 1]
            ev = f.add(left, f.mul(r, f.sub(right, left)))
        return ev

    def _finish_eval(self, local_scalar, points_top):
        """local_scalar: [1(,L)] per device; gather and fold the top
        log2(P) variables (replicated compute, negligible size)."""
        f = self.f
        gathered = jax.lax.all_gather(local_scalar, self.axis, axis=0,
                                      tiled=True)          # [P(,L)]
        # gathered[s]: shard index s holds the assignment of the remaining
        # (top) variables, little-endian in s — so the fold is the same
        # adjacent-pair lerp as the local fix.
        ev = gathered
        for r in points_top:
            half = ev.shape[0] // 2
            ev2 = ev.reshape((half, 2) + ev.shape[1:])
            left = ev2[:, 0]
            right = ev2[:, 1]
            ev = f.add(left, f.mul(r, f.sub(right, left)))
        return ev

    # -- public jitted builders ------------------------------------------
    def make_fix_fn(self, k: int):
        """fix the first k variables (k <= nv - logP): fully local."""
        assert k <= self.nv - self.logP
        sp = self.spec()

        def local(evals, *points):
            return self._local_fix(evals, points)

        in_specs = (sp,) + (P(),) * k
        return jax.jit(jax.shard_map(local, mesh=self.mesh,
                                     in_specs=in_specs, out_specs=sp))

    def make_eval_fn(self):
        """full evaluation at an nv-point: local fix + gather + top fold."""
        sp = self.spec()
        nv, logP = self.nv, self.logP

        def local(evals, *points):
            low = points[: nv - logP]
            top = points[nv - logP:]
            s = self._local_fix(evals, low)      # [1(,L)]
            return self._finish_eval(s, top)[0]

        in_specs = (sp,) + (P(),) * nv
        return jax.jit(jax.shard_map(local, mesh=self.mesh,
                                     in_specs=in_specs, out_specs=P(),
                                     check_vma=False))

    def make_hypercube_sum_fn(self):
        """sum over {0,1}^nv: local widened sum + psum + fold."""
        sp = self.spec()
        f = self.f

        def local(evals):
            w = f.widen(evals)
            local_words = jnp.sum(w.reshape(-1, w.shape[-1]), axis=0)
            total = psum_words(local_words, self.axis)
            return f.reduce_words(total)

        return jax.jit(jax.shard_map(local, mesh=self.mesh,
                                     in_specs=(sp,), out_specs=P(),
                                     check_vma=False))

    def make_inner_product_fn(self):
        """<a, b> over the hypercube: local mul + widened psum reduce."""
        sp = self.spec()
        f = self.f

        def local(a, b):
            prod = f.mul(a, b)
            w = f.widen(prod)
            local_words = jnp.sum(w.reshape(-1, w.shape[-1]), axis=0)
            total = psum_words(local_words, self.axis)
            return f.reduce_words(total)

        return jax.jit(jax.shard_map(local, mesh=self.mesh,
                                     in_specs=(sp, sp), out_specs=P(),
                                     check_vma=False))

    def make_sumcheck_fn(self):
        """Multi-chip product-claim sumcheck prover arithmetic.

        Tables G, H [2^nv(,L)] sharded over the mesh axis (top
        variables = shard index).  The first nv - log2(P) rounds bind
        LOW variables: stride-2 pairs never cross a shard, so the fold
        is local and each round's degree-2 message costs ONE tiny
        psum (exact widened-word reduction).  The last log2(P) rounds
        run replicated on the all_gathered per-device scalars.  Output
        equals mle/sumcheck.sumcheck_prove_with_challenges on the
        unsharded tables (tested on the 8-device mesh)."""
        sp = self.spec()
        f = self.f
        nv, logP, axis = self.nv, self.logP, self.axis

        def exact_sum(x):
            w = f.widen(x)
            words = jnp.sum(w.reshape(-1, w.shape[-1]), axis=0)
            return f.reduce_words(psum_words(words, axis))

        def local(G, H, *challenges):
            from ..mle.sumcheck import sumcheck_fold, sumcheck_round

            msgs = []
            for i in range(nv - logP):
                r = challenges[i]
                G0, G1 = G[0::2], G[1::2]
                H0, H1 = H[0::2], H[1::2]
                dG, dH = f.sub(G1, G0), f.sub(H1, H0)
                p0 = exact_sum(f.mul(G0, H0))
                p1 = exact_sum(f.mul(G1, H1))
                p2 = exact_sum(f.mul(f.add(G1, dG), f.add(H1, dH)))
                msgs.append(jnp.stack([p0, p1, p2]))
                G, H = sumcheck_fold(f, r, G0, H0, dG, dH)
            # top rounds: replicated on the gathered [P(,L)] tables
            G = jax.lax.all_gather(G, axis, axis=0, tiled=True)
            H = jax.lax.all_gather(H, axis, axis=0, tiled=True)
            for i in range(nv - logP, nv):
                p0, p1, p2, G0, H0, dG, dH = sumcheck_round(f, G, H)
                msgs.append(jnp.stack([p0, p1, p2]))
                G, H = sumcheck_fold(f, challenges[i], G0, H0, dG, dH)
            return jnp.stack(msgs), G[0], H[0]

        in_specs = (sp, sp) + (P(),) * nv
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=in_specs,
            out_specs=(P(), P(), P()), check_vma=False))

    def make_sumcheck_many_fn(self, k: int):
        """Multi-chip k-ary product sumcheck (degree-k rounds).

        Same sharding/collective plan as :meth:`make_sumcheck_fn` — one
        exact widened psum per message evaluation point in the low
        rounds, replicated tail — generalized to S = sum_x prod_i T_i(x)
        (the HyperPlonk random_mle_list shape).  Output equals
        mle/sumcheck.sumcheck_prove_many_with_challenges unsharded."""
        sp = self.spec()
        f = self.f
        nv, logP, axis = self.nv, self.logP, self.axis

        def exact_sum(x):
            w = f.widen(x)
            words = jnp.sum(w.reshape(-1, w.shape[-1]), axis=0)
            return f.reduce_words(psum_words(words, axis))

        def local(*args):
            from ..mle.sumcheck import (sumcheck_fold_many,
                                        sumcheck_round_many)

            tables = list(args[:k])
            challenges = args[k:]
            msgs = []
            for i in range(nv - logP):
                # the shared degree-k stepping, with the psum-backed
                # exact reduction swapped in for the local sum
                round_msgs, t0s, deltas = sumcheck_round_many(
                    f, tables, reduce=exact_sum)
                msgs.append(jnp.stack(round_msgs))
                tables = sumcheck_fold_many(f, challenges[i], t0s, deltas)
            tables = [jax.lax.all_gather(T, axis, axis=0, tiled=True)
                      for T in tables]
            for i in range(nv - logP, nv):
                round_msgs, t0s, deltas = sumcheck_round_many(f, tables)
                msgs.append(jnp.stack(round_msgs))
                tables = sumcheck_fold_many(f, challenges[i], t0s, deltas)
            return jnp.stack(msgs), [T[0] for T in tables]

        in_specs = (sp,) * k + (P(),) * nv
        return jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=in_specs,
            out_specs=(P(), [P()] * k), check_vma=False))
