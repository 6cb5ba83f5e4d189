"""Pallas epilogue kernels for the MXU NTT v2 (ops/mxu2.py).

The int8 dots run at XLA level (measured 275-700 TOPS there vs ~25 in
Mosaic); what XLA cannot do efficiently is the *fold*: combining the 9
signed int32 bucket planes into a canonical u64 mod q — at XLA level the
u64 emulation materializes every intermediate to HBM (measured ~65us per
deg-2^16 element for ONE fold).  These kernels do the fold (and the
fused mid-twiddle modmul) in VMEM on u32 pairs.

Whole-array BlockSpecs + an unrolled XLA chunk loop (gridded BlockSpecs
crash the remote compiler on this stack — see CLAUDE.md pitfalls).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_goldilocks import _mul_q, _reduce128, _sub_q
from .mxu2 import B_BITS, K_BUCKETS

__all__ = ["fold_end", "fold_tw", "pointwise_mul", "pointwise_chain"]

_BIAS = np.uint32(1 << 26)
_BIAS_VAL = sum((1 << 26) << (B_BITS * k) for k in range(K_BUCKETS))
_Q = 2**64 - 2**32 + 1
_BM = _BIAS_VAL % _Q
_BM_LO = np.uint32(_BM & 0xFFFFFFFF)
_BM_HI = np.uint32(_BM >> 32)


def _u32cast(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _fold_rows(v, R):
    """v: int32 [K*R, C] -> canonical (lo, hi) u32 [R, C].

    value = sum_k (v_k + 2^26) 2^(8k) - BIAS  (mod q); the +2^26 bias
    makes every bucket nonnegative (|v_k| < 2^26 by the int8 accumulation
    bound), and u32 wraparound implements it for free on the raw bits.
    """
    zero = jnp.zeros((R,) + v.shape[1:], dtype=jnp.uint32)
    w = [zero, zero, zero, zero]
    ov = [zero, zero, zero, zero]
    for k in range(K_BUCKETS):
        b = _u32cast(v[k * R:(k + 1) * R]) + _BIAS
        r = B_BITS * k
        j, sh = r >> 5, r & 31
        clo = b << np.uint32(sh) if sh else b
        t = w[j] + clo
        cy = (t < clo).astype(jnp.uint32)
        w[j] = t
        if sh:
            ov[j + 1] = ov[j + 1] + cy + (b >> np.uint32(32 - sh))
        else:
            ov[j + 1] = ov[j + 1] + cy
    for j in range(1, 4):
        t = w[j] + ov[j]
        w[j] = t
        if j < 3:
            ov[j + 1] = ov[j + 1] + (t < ov[j]).astype(jnp.uint32)
    lo, hi = _reduce128(w[0], w[1], w[2], w[3])
    return _sub_q(lo, hi, _BM_LO, _BM_HI)


def _make_fold_end_kernel(R):
    def kern(v_ref, olo_ref, ohi_ref):
        lo, hi = _fold_rows(v_ref[:], R)
        olo_ref[:] = lo
        ohi_ref[:] = hi

    return kern


def _make_fold_tw_kernel(R, t, bc):
    def kern(v_ref, twlo_ref, twhi_ref, olo_ref, ohi_ref):
        twlo = twlo_ref[:]
        twhi = twhi_ref[:]
        for b in range(bc):
            lo, hi = _fold_rows(v_ref[:, b * t:(b + 1) * t], R)
            plo, phi = _mul_q(lo, hi, twlo, twhi)
            olo_ref[:, b * t:(b + 1) * t] = plo
            ohi_ref[:, b * t:(b + 1) * t] = phi

    return kern


_WHOLE = pl.BlockSpec(memory_space=pltpu.VMEM)


def _pack_u64(lo, hi):
    return jax.lax.bitcast_convert_type(
        jnp.stack([lo, hi], axis=-1), jnp.uint64)


def _chunked(pcall, V, cols, chunk, extra=()):
    outs = []
    for c0 in range(0, cols, chunk):
        outs.append(pcall(V[:, c0:c0 + chunk], *extra))
    if len(outs) == 1:
        return outs[0]
    los, his = zip(*outs)
    return jnp.concatenate(los, axis=1), jnp.concatenate(his, axis=1)


def fold_end(V, R, chunk=512, interpret=False):
    """int32 [K*R, cols] -> u64 [R, cols] (cols % chunk == 0 or one chunk)."""
    cols = V.shape[1]
    chunk = min(chunk, cols)
    if cols % chunk:
        chunk = cols
    kern = _make_fold_end_kernel(R)
    pcall = pl.pallas_call(
        kern,
        in_specs=[_WHOLE],
        out_specs=(_WHOLE, _WHOLE),
        out_shape=(jax.ShapeDtypeStruct((R, chunk), jnp.uint32),
                   jax.ShapeDtypeStruct((R, chunk), jnp.uint32)),
        interpret=interpret,
    )
    lo, hi = _chunked(pcall, V, cols, chunk)
    return _pack_u64(lo, hi)


def fold_tw(V, tw_lo, tw_hi, R, bc=2, interpret=False):
    """int32 [K*R, B*t] + twiddle u32 [R, t] -> u64 [R, B*t].

    Column layout is (b, t): the twiddle broadcasts over the leading
    batch index; ``bc`` batch elements are folded per kernel call.
    """
    t = tw_lo.shape[1]
    cols = V.shape[1]
    B = cols // t
    bc = min(bc, B)
    while B % bc:
        bc -= 1
    kern = _make_fold_tw_kernel(R, t, bc)
    pcall = pl.pallas_call(
        kern,
        in_specs=[_WHOLE] * 3,
        out_specs=(_WHOLE, _WHOLE),
        out_shape=(jax.ShapeDtypeStruct((R, bc * t), jnp.uint32),
                   jax.ShapeDtypeStruct((R, bc * t), jnp.uint32)),
        interpret=interpret,
    )
    lo, hi = _chunked(pcall, V, cols, bc * t, extra=(tw_lo, tw_hi))
    return _pack_u64(lo, hi)


# ---------------------------------------------------------------------------
# standalone pointwise modular multiply (NTT-form hot loop)
# ---------------------------------------------------------------------------


def _pointwise_kernel(alo, ahi, blo, bhi, olo, ohi):
    lo, hi = _mul_q(alo[:], ahi[:], blo[:], bhi[:])
    olo[:] = lo
    ohi[:] = hi


def _make_chain_kernel(depth):
    def kern(alo, ahi, blo, bhi, olo, ohi):
        lo, hi = alo[:], ahi[:]
        xlo, xhi = blo[:], bhi[:]
        for _ in range(depth):
            lo, hi = _mul_q(lo, hi, xlo, xhi)
        olo[:] = lo
        ohi[:] = hi

    return kern


def pointwise_chain(a, b, depth=16, chunk_rows=128, width=2048,
                    interpret=False):
    """x <- x*b (mod q), ``depth`` times, all inside VMEM.

    The compute-envelope benchmark for the NTT-form pointwise hot loop
    (ntt_form.rs:159-189): one kernel per tile does the whole dependent
    chain on u32 pairs with zero intermediate HBM traffic."""
    shape = a.shape
    total = int(np.prod(shape))
    if total % width:
        width = shape[-1]
    a2 = a.reshape(-1, width)
    b2 = b.reshape(-1, width)
    av = jax.lax.bitcast_convert_type(a2, jnp.uint32)
    bv = jax.lax.bitcast_convert_type(b2, jnp.uint32)
    rows = a2.shape[0]
    chunk = min(chunk_rows, rows)
    while rows % chunk:
        chunk -= 1
    pcall = pl.pallas_call(
        _make_chain_kernel(depth),
        in_specs=[_WHOLE] * 4,
        out_specs=(_WHOLE, _WHOLE),
        out_shape=(jax.ShapeDtypeStruct((chunk, width), jnp.uint32),
                   jax.ShapeDtypeStruct((chunk, width), jnp.uint32)),
        interpret=interpret,
    )
    los, his = [], []
    for r0 in range(0, rows, chunk):
        lo, hi = pcall(av[r0:r0 + chunk, :, 0], av[r0:r0 + chunk, :, 1],
                       bv[r0:r0 + chunk, :, 0], bv[r0:r0 + chunk, :, 1])
        los.append(lo)
        his.append(hi)
    lo = jnp.concatenate(los, axis=0) if len(los) > 1 else los[0]
    hi = jnp.concatenate(his, axis=0) if len(his) > 1 else his[0]
    return _pack_u64(lo, hi).reshape(shape)


def pointwise_mul(a, b, chunk_rows=128, width=2048, interpret=False):
    """Canonical u64 [...] x [...] -> a*b mod q via a VMEM kernel.

    Operands are split into u32 planes at XLA level (a bitcast, free) and
    processed as [chunk_rows, width] tiles."""
    shape = a.shape
    total = int(np.prod(shape))
    if total % width or (total // width) % 1:
        width = shape[-1]
    a2 = a.reshape(-1, width)
    b2 = b.reshape(-1, width)
    av = jax.lax.bitcast_convert_type(a2, jnp.uint32)
    bv = jax.lax.bitcast_convert_type(b2, jnp.uint32)
    rows = a2.shape[0]
    chunk = min(chunk_rows, rows)
    while rows % chunk:
        chunk -= 1
    pcall = pl.pallas_call(
        _pointwise_kernel,
        in_specs=[_WHOLE] * 4,
        out_specs=(_WHOLE, _WHOLE),
        out_shape=(jax.ShapeDtypeStruct((chunk, width), jnp.uint32),
                   jax.ShapeDtypeStruct((chunk, width), jnp.uint32)),
        interpret=interpret,
    )
    los, his = [], []
    for r0 in range(0, rows, chunk):
        lo, hi = pcall(av[r0:r0 + chunk, :, 0], av[r0:r0 + chunk, :, 1],
                       bv[r0:r0 + chunk, :, 0], bv[r0:r0 + chunk, :, 1])
        los.append(lo)
        his.append(hi)
    lo = jnp.concatenate(los, axis=0) if len(los) > 1 else los[0]
    hi = jnp.concatenate(his, axis=0) if len(his) > 1 else his[0]
    return _pack_u64(lo, hi).reshape(shape)


# ---------------------------------------------------------------------------
# Pallas-epilogue NTT: XLA int8 dots + VMEM folds
# ---------------------------------------------------------------------------


from .mxu2 import Mxu2NTT  # noqa: E402  (no import cycle: mxu2 is leaf)


class Mxu2PallasNTT(Mxu2NTT):
    """Mxu2NTT with the fold/twiddle epilogues in Pallas kernels.

    ``pointwise_pallas`` selects the slot-product implementation: the
    XLA u64 chain fuses into one elementwise kernel and wins for a
    single product; the Pallas kernel wins for in-VMEM chains."""

    def __init__(self, N: int = 1 << 16, n1=None, interpret: bool = False,
                 pointwise_pallas: bool = False):
        super().__init__(N, n1)
        self.interpret = interpret
        self.pointwise_pallas = pointwise_pallas
        self._tw32 = {}
        for name, tab in (("tw", self.tw), ("twi", self.twi)):
            v = jax.lax.bitcast_convert_type(tab, jnp.uint32)
            self._tw32[name] = (v[..., 0], v[..., 1])

    def _tw_planes(self, tw):
        if tw is self.tw:
            return self._tw32["tw"]
        if tw is self.twi:
            return self._tw32["twi"]
        v = jax.lax.bitcast_convert_type(tw, jnp.uint32)
        return v[..., 0], v[..., 1]

    def _fold_end(self, mat, V, B, t):
        y = fold_end(V, mat.R, interpret=self.interpret)
        return y.reshape(mat.R, B, t)

    def _fold_tw(self, mat, V, tw, B, t):
        lo, hi = self._tw_planes(tw)
        y = fold_tw(V, lo, hi, mat.R, interpret=self.interpret)
        return y.reshape(mat.R, B, t)

    def pointwise(self, fa, fb):
        if self.pointwise_pallas:
            return pointwise_mul(fa, fb, interpret=self.interpret)
        return super().pointwise(fa, fb)
