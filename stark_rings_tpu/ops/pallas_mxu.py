"""Fused Pallas MXU kernel: 128-point modular matmul level with in-VMEM
limb fold.

This is the kernel `ops/mxu.py` needs to win: the XLA formulation
materializes the 10x10 int8 limb-product tensor and 19 int32 bucket
planes to HBM (~19-76 bytes per coefficient); here each tile does

    int8 matmuls (MXU)  ->  bucket accumulate (int32, VMEM)
                        ->  base-2^32 word packing (u32 pairs, VMEM)
                        ->  Goldilocks fold (u32 pair ops)

and writes only the final u64 (as two u32 planes) back to HBM.

Shares the digit layout (7-bit unsigned digits in int8, 10 per value) and
fold identities with ops/mxu.py, and the u32 pair arithmetic with
ops/pallas_goldilocks.py — bit-exact against both.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mxu import _DBITS, _DIGITS, _NBUCKETS, MxuModMat
from .pallas_goldilocks import _add_q, _pair_sub, _reduce128, _sub_q

__all__ = ["MxuModMatPallas"]

_M127 = np.uint32(127)


def _digits_from_planes(xlo, xhi):
    """u32 planes -> list of DIGITS int8 arrays of 7-bit digits."""
    out = []
    for k in range(_DIGITS):
        b = _DBITS * k
        if b + _DBITS <= 32:
            d = (xlo >> np.uint32(b)) & _M127
        elif b >= 32:
            d = (xhi >> np.uint32(b - 32)) & _M127
        else:
            d = ((xlo >> np.uint32(b)) | (xhi << np.uint32(32 - b))) & _M127
        out.append(d.astype(jnp.int8))
    return out


_N_WORDS = (_DBITS * (_NBUCKETS - 1) + 31) // 32 + 2


def _word_state(shape):
    """Incremental word accumulators: keeping only ONE int32 bucket live
    at a time bounds the kernel's VMEM footprint (a full V list spills)."""
    zero = jnp.zeros(shape, dtype=jnp.uint32)
    return [zero] * _N_WORDS, [zero] * _N_WORDS, zero


def _word_accumulate(wlo, whi, zero, s, v32):
    """Add bucket s's value (int32 < 2^25) into the word accumulators."""
    v = v32.astype(jnp.uint32)
    r = _DBITS * s
    j, sh = r >> 5, r & 31
    clo = v << np.uint32(sh)
    chi = (v >> np.uint32(32 - sh)) if sh else zero
    t = wlo[j] + clo
    carry = (t < clo).astype(jnp.uint32)
    wlo[j] = t
    whi[j] = whi[j] + carry
    t2 = wlo[j + 1] + chi
    carry2 = (t2 < chi).astype(jnp.uint32)
    wlo[j + 1] = t2
    whi[j + 1] = whi[j + 1] + carry2


def _word_finalize(wlo, whi, zero):
    """Word accumulators -> canonical (lo, hi) u32 planes mod q."""
    digits = []
    carry = zero
    for j in range(_N_WORDS):
        t = wlo[j] + carry
        c = (t < carry).astype(jnp.uint32)
        digits.append(t)
        carry = whi[j] + c
    digits.append(carry)
    while len(digits) < 7:
        digits.append(zero)
    d = digits
    # A = d0 + d1*2^32 etc. as (lo, hi) pairs
    b32_lo, b32_hi = _reduce128(zero, d[2], d[3], zero)  # B*2^32 mod q
    c32_lo, c32_hi = _reduce128(zero, d[4], d[5], zero)  # C*2^32 mod q
    # reduce A (< 2^64) and B (< 2^64) to canonical: one cond subtract
    a_lo, a_hi = _canon64(d[0], d[1])
    bm_lo, bm_hi = _canon64(d[2], d[3])
    acc_lo, acc_hi = _add_q(a_lo, a_hi, *_sub_pair(b32_lo, b32_hi,
                                                   bm_lo, bm_hi))
    acc_lo, acc_hi = _sub_q(acc_lo, acc_hi, c32_lo, c32_hi)
    d6_lo, d6_hi = _canon64(d[6], zero)
    return _add_q(acc_lo, acc_hi, d6_lo, d6_hi)


def _fold_buckets_u32(V):
    """Compatibility wrapper: fold a full bucket list."""
    wlo, whi, zero = _word_state(V[0].shape)
    for s, v in enumerate(V):
        _word_accumulate(wlo, whi, zero, s, v)
    return _word_finalize(wlo, whi, zero)


def _canon64(lo, hi):
    """u64 (as pair) -> canonical mod q (single conditional subtract:
    any u64 value is < 2q for Goldilocks)."""
    QLO, QHI = np.uint32(1), np.uint32(0xFFFFFFFF)
    ge = (hi > QHI) | ((hi == QHI) & (lo >= QLO))
    slo, shi, _ = _pair_sub(lo, hi, QLO, QHI)
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


def _sub_pair(alo, ahi, blo, bhi):
    return _sub_q(alo, ahi, blo, bhi)


class MxuModMatPallas:
    """y = M @ x (mod q), x u64 [C, M_cols], via a fused MXU kernel.

    C (the contraction dim) must be <= 128-ish for the int32 bound; tiles
    of ``tile`` columns are processed per kernel invocation.

    Two kernel shapes:
    * ``stacked=True`` (default): ONE [NBUCKETS*R, DIGITS*C] int8 matmul
      per tile against the concatenated digit planes — bucket weight
      row-block s holds W_{s-l} at column-block l (zeros elsewhere), so
      the bucket sums fall out of the single big matmul (1.9x the minimal
      MAC count, but the MXU runs one well-shaped contraction instead of
      100 tiny ones).
    * ``stacked=False``: 100 small [R, C] matmuls streamed by bucket.
    """

    def __init__(self, m_ints, tile: int = 512, interpret: bool = False,
                 stacked: bool = True):
        base = MxuModMat(m_ints)
        self.R, self.C = base.R, base.C
        self.planes = base.planes          # int8 [DIGITS, R, C]
        self.tile = tile
        self.interpret = interpret
        self.stacked = stacked
        if stacked:
            big = np.zeros((_NBUCKETS * self.R, _DIGITS * self.C),
                           dtype=np.int8)
            for sidx in range(_NBUCKETS):
                for l in range(_DIGITS):
                    k = sidx - l
                    if 0 <= k < _DIGITS:
                        big[sidx * self.R:(sidx + 1) * self.R,
                            l * self.C:(l + 1) * self.C] = self.planes[k]
            self.big_planes = big

    def _kernel(self, xlo_ref, xhi_ref, w_ref, olo_ref, ohi_ref):
        xd = _digits_from_planes(xlo_ref[:], xhi_ref[:])
        if self.stacked:
            xcat = jnp.concatenate(xd, axis=0)       # [DIGITS*C, T] int8
            vall = jnp.dot(w_ref[:], xcat,
                           preferred_element_type=jnp.int32)
            wlo, whi, zero = _word_state(vall[: self.R].shape)
            for s in range(_NBUCKETS):
                _word_accumulate(wlo, whi, zero, s,
                                 vall[s * self.R:(s + 1) * self.R])
        else:
            # one live bucket at a time: matmuls for bucket s, fold, drop
            wlo = whi = zero = None
            for s in range(_NBUCKETS):
                acc = None
                for k in range(max(0, s - _DIGITS + 1), min(_DIGITS, s + 1)):
                    p = jnp.dot(w_ref[k], xd[s - k],
                                preferred_element_type=jnp.int32)
                    acc = p if acc is None else acc + p
                if wlo is None:
                    wlo, whi, zero = _word_state(acc.shape)
                _word_accumulate(wlo, whi, zero, s, acc)
        lo, hi = _word_finalize(wlo, whi, zero)
        olo_ref[:] = lo
        ohi_ref[:] = hi

    def apply(self, x):
        """x u64 [C, M] -> u64 [R, M]."""
        C, M = x.shape
        assert C == self.C
        T = self.tile
        pad = (-M) % T
        v = jax.lax.bitcast_convert_type(x, jnp.uint32)
        xlo, xhi = v[..., 0], v[..., 1]
        if pad:
            xlo = jnp.concatenate(
                [xlo, jnp.zeros((C, pad), jnp.uint32)], axis=1)
            xhi = jnp.concatenate(
                [xhi, jnp.zeros((C, pad), jnp.uint32)], axis=1)
        Mp = M + pad
        whole = pl.BlockSpec(memory_space=pltpu.VMEM)
        pcall = pl.pallas_call(
            self._kernel,
            in_specs=[whole] * 3,
            out_specs=(whole, whole),
            out_shape=(jax.ShapeDtypeStruct((self.R, T), jnp.uint32),
                       jax.ShapeDtypeStruct((self.R, T), jnp.uint32)),
            interpret=self.interpret,
        )
        w_arg = self.big_planes if self.stacked else self.planes
        los, his = [], []
        for g in range(Mp // T):
            lo, hi = pcall(xlo[:, g * T:(g + 1) * T],
                           xhi[:, g * T:(g + 1) * T], w_arg)
            los.append(lo)
            his.append(hi)
        lo = jnp.concatenate(los, axis=1) if len(los) > 1 else los[0]
        hi = jnp.concatenate(his, axis=1) if len(his) > 1 else his[0]
        if pad:
            lo, hi = lo[:, :M], hi[:, :M]
        out = jnp.stack([lo, hi], axis=-1)
        return jax.lax.bitcast_convert_type(out, jnp.uint64)
