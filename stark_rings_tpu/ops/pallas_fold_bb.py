"""Pallas epilogue kernels for the BabyBear MXU NTT (ops/mxu_bb.py).

Same shape as ops/pallas_fold.py's DMA-looped goldilocks folds, sized
for the 31-bit modulus: the fold is 5 biased buckets packed into one
u32 pair and a SINGLE-word Montgomery REDC (vs goldilocks' 128-bit
reduction), and all values are single u32 lanes (no lo/hi planes).
One ``pallas_call`` per fold with the column-chunk loop inside the
kernel (double-buffered HBM<->VMEM copies) — module size independent of
batch, same as the goldilocks path (CLAUDE.md pitfalls).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_goldilocks import _mul32
from .mxu_bb import B_BITS, K_BUCKETS, _Q, _QINV32, _BIAS_VAL

__all__ = ["bb_fold_end_dma", "bb_fold_tw_dma", "bb_fold_end2_mul_dma"]

_Qu = np.uint32(_Q)
_QINVu = np.uint32(_QINV32)
_BIAS = np.uint32(1 << 26)
_BIAS_RED = np.uint32(_BIAS_VAL * pow(1 << 32, -1, _Q) % _Q)


def _u32cast(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _bb_fold_rows(v, R, signed=True):
    """int32 [K*R, C] bucket planes -> canonical u32 [R, C].

    Signed: value = sum_k (v_k + 2^26) 2^(8k) < 2^59 as a u32 (lo, hi)
    pair, then one word-REDC (the weights carry 2^32, mxu_bb.py) and
    the constant bias image is subtracted mod q.  Unsigned (u8 x u8
    scheme, K=4): buckets are already nonnegative — no bias handling.
    """
    K = v.shape[0] // R
    lo = None
    hi = None
    for k in range(K):
        b = _u32cast(v[k * R:(k + 1) * R])
        if signed:
            b = b + _BIAS                                # < 2^27
        sh = B_BITS * k
        if sh == 0:
            lo = b
            hi = jnp.zeros_like(b)
        elif sh < 32:
            clo = b << np.uint32(sh)
            t = lo + clo
            cy = (t < clo).astype(jnp.uint32)
            lo = t
            hi = hi + cy + (b >> np.uint32(32 - sh))
        else:
            hi = hi + (b << np.uint32(sh - 32))
    # REDC: m = lo * q' mod 2^32; t = hi + hi32(m q) + (lo != 0)
    m = lo * _QINVu
    _, mq_hi = _mul32(m, jnp.full_like(m, _Qu))
    t = hi + mq_hi + (lo != np.uint32(0)).astype(jnp.uint32)
    t = jnp.where(t >= _Qu, t - _Qu, t)
    if not signed:
        return t
    return jnp.where(t < _BIAS_RED, t + _Qu - _BIAS_RED, t - _BIAS_RED)


def _bb_mont_mul(a, b):
    """Montgomery product of u32 storage values (REDC(a*b))."""
    lo, hi = _mul32(a, b)
    m = lo * _QINVu
    _, mq_hi = _mul32(m, jnp.full_like(m, _Qu))
    t = hi + mq_hi + (lo != np.uint32(0)).astype(jnp.uint32)
    return jnp.where(t >= _Qu, t - _Qu, t)


_ANY = pl.BlockSpec(memory_space=pltpu.ANY)


def _i32(x):
    return jnp.int32(x) if isinstance(x, int) else x


def _make_bb_fold_dma_kernel(R, n_chunks, chunk, t=None, bc=None,
                             transpose_out=False, mul2=False, signed=True,
                             stacked=0):
    """Single-plane DMA-looped fold kernel (see pallas_fold.py twin).

    mul2: two bucket-plane inputs, fold both and emit their Montgomery
    product (the forward end-folds + slot product fused).  With
    ``stacked`` set (mul2 only), ONE input holds both operands side by
    side ([K*R, 2*cols], operand j at column offset j*stacked) and the
    kernel DMAs each half directly."""
    twiddled = t is not None
    n_in = 2 if mul2 else 1
    n_hbm = 1 if (mul2 and stacked) else n_in
    ochunk = bc * R if (transpose_out and twiddled) else chunk

    def kern(*refs):
        srcs = refs[:n_hbm]
        rest = refs[n_hbm:]
        if stacked:
            srcs = (srcs[0], srcs[0])
        offs = (0, stacked) if stacked else (0,) * n_in
        if twiddled:
            tw = rest[0]
            o_hbm = rest[1]
            vin, vout, in_sem, out_sem = rest[2:]
        else:
            o_hbm = rest[0]
            vin, vout, in_sem, out_sem = rest[1:]

        def in_copies(i, slot):
            i, slot = _i32(i), _i32(slot)
            return [pltpu.make_async_copy(
                srcs[j].at[:, pl.ds(i * chunk + _i32(offs[j]), chunk)],
                vin.at[slot, _i32(j)], in_sem.at[slot, _i32(j)])
                for j in range(n_in)]

        def out_copy(i, slot):
            i, slot = _i32(i), _i32(slot)
            dst = o_hbm.at[:, pl.ds(i * ochunk, ochunk)]
            return pltpu.make_async_copy(vout.at[slot], dst,
                                         out_sem.at[slot])

        for cp in in_copies(0, 0):
            cp.start()

        def body(i, carry):
            slot = jax.lax.rem(i, jnp.int32(2))
            nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

            @pl.when(i + 1 < n_chunks)
            def _():
                for cp in in_copies(i + 1, nxt):
                    cp.start()

            for cp in in_copies(i, slot):
                cp.wait()

            @pl.when(i >= 2)
            def _():
                out_copy(i - 2, slot).wait()

            if mul2:
                a = _bb_fold_rows(vin[slot, _i32(0)], R, signed)
                b = _bb_fold_rows(vin[slot, _i32(1)], R, signed)
                vout[slot] = _bb_mont_mul(a, b)
            elif twiddled:
                for bb_ in range(bc):
                    y = _bb_fold_rows(
                        vin[slot, _i32(0), :, bb_ * t:(bb_ + 1) * t], R,
                        signed)
                    p = _bb_mont_mul(y, tw[:])
                    if transpose_out:
                        vout[slot, :, bb_ * R:(bb_ + 1) * R] = p.T
                    else:
                        vout[slot, :, bb_ * t:(bb_ + 1) * t] = p
            else:
                vout[slot] = _bb_fold_rows(vin[slot, _i32(0)], R, signed)
            out_copy(i, slot).start()
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks), body,
                          jnp.int32(0))
        for tail in range(max(0, n_chunks - 2), n_chunks):
            out_copy(tail, tail % 2).wait()

    return kern


def _bb_fold_dma(Vs, R, chunk, tw=None, bc=4, transpose_out=False,
                 interpret=False, signed=True, stacked=False):
    mul2 = len(Vs) == 2 or stacked
    cols = Vs[0].shape[1] // 2 if stacked else Vs[0].shape[1]
    if tw is not None:
        t = tw.shape[1]
        chunk = min(chunk, cols)
        bc = max(1, min(bc, chunk // t))
        chunk = bc * t
        while cols % chunk:
            bc -= 1
            chunk = bc * t
    else:
        t = None
        bc = None
        chunk = min(chunk, cols)
        while cols % chunk:
            chunk //= 2
    n_chunks = cols // chunk
    KR = Vs[0].shape[0]
    kern = _make_bb_fold_dma_kernel(R, n_chunks, chunk, t, bc,
                                    transpose_out, mul2, signed,
                                    stacked=cols if stacked else 0)
    n_in = 2 if mul2 else 1
    if transpose_out and tw is not None:
        out_shape = (t, (cols // t) * R)
        vshape = (2, t, bc * R)
    else:
        out_shape = (R, cols)
        vshape = (2, R, chunk)
    in_specs = [_ANY] * len(Vs) + ([pl.BlockSpec(memory_space=pltpu.VMEM)]
                                   if tw is not None else [])
    pcall = pl.pallas_call(
        kern,
        in_specs=in_specs,
        out_specs=_ANY,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2, n_in, KR, chunk), jnp.int32),
            pltpu.VMEM(vshape, jnp.uint32),
            pltpu.SemaphoreType.DMA((2, n_in)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )
    args = tuple(Vs) + ((tw,) if tw is not None else ())
    return pcall(*args)


def bb_fold_end_dma(V, R, chunk=2048, interpret=False, signed=True):
    """int32 [K*R, cols] -> u32 [R, cols], one kernel."""
    return _bb_fold_dma((V,), R, chunk, interpret=interpret, signed=signed)


def bb_fold_tw_dma(V, tw, R, chunk=2048, transpose_out=False,
                   interpret=False, signed=True):
    """fold + mid-twiddle Montgomery mul (+fused transpose), one kernel.

    ``tw``: u32 [R, t] Montgomery twiddle block, broadcast over batch."""
    return _bb_fold_dma((V,), R, chunk, tw=tw,
                        transpose_out=transpose_out, interpret=interpret,
                        signed=signed)


def bb_fold_end2_mul_dma(Va, Vb=None, R=None, chunk=1024, interpret=False,
                         signed=True):
    """(fold(Va) * fold(Vb)) Montgomery product, fused in one kernel.

    With Vb=None, Va holds BOTH operands stacked side by side
    ([K*R, 2*cols], operand b in the right half) and the kernel reads
    each half via DMA column offsets."""
    if Vb is None:
        return _bb_fold_dma((Va,), R, chunk, interpret=interpret,
                            signed=signed, stacked=True)
    return _bb_fold_dma((Va, Vb), R, chunk, interpret=interpret,
                        signed=signed)


from .mxu_bb import MxuBBNTT  # noqa: E402  (mxu_bb is a leaf module)


class MxuBBPallasNTT(MxuBBNTT):
    """MxuBBNTT with the fold/twiddle epilogues in DMA-looped Pallas
    kernels, the mid transpose fused into the twiddled fold, and the
    slot product fused into the two forward end-folds — the same
    single-module construction that won for goldilocks
    (ops/pallas_fold.Mxu2PallasNTT)."""

    def __init__(self, N: int = 1 << 12, n1=None, interpret: bool = False,
                 fold_chunk: int = 2048, fuse_transpose: bool = True,
                 fuse_pointwise: bool = True, unsigned: bool = True,
                 stack_forward: bool = False):
        super().__init__(N, n1, unsigned)
        self.interpret = interpret
        self.fold_chunk = fold_chunk
        self.fuse_transpose = fuse_transpose
        self.fuse_pointwise = fuse_pointwise
        self.stack_forward = stack_forward

    def _fold_end(self, mat, V, B, t):
        y = bb_fold_end_dma(V, mat.R, chunk=self.fold_chunk,
                            interpret=self.interpret,
                            signed=not self.unsigned)
        return y.reshape(mat.R, B, t)

    def _fold_tw(self, mat, V, tw, B, t):
        y = bb_fold_tw_dma(V, jnp.asarray(tw), mat.R,
                           chunk=self.fold_chunk, interpret=self.interpret,
                           signed=not self.unsigned)
        return y.reshape(mat.R, B, t)

    def _lvl_tw_t(self, mat, x, tw, big=None):
        if not self.fuse_transpose:
            return super()._lvl_tw_t(mat, x, tw, big)
        C, B, t = x.shape
        V = mat.dot(x.reshape(C, B * t), big)
        y = bb_fold_tw_dma(V, jnp.asarray(tw), mat.R,
                           chunk=self.fold_chunk, transpose_out=True,
                           interpret=self.interpret,
                           signed=not self.unsigned)
        return y.reshape(t, B, mat.R)

    def _fwd_buckets(self, x, c=None):
        """Forward transform WITHOUT the final end-fold: the int32
        bucket planes bb_fold_end2_mul_dma consumes directly."""
        tw = self._c(c, "tw", self.tw)
        mid = self._lvl_tw_t(self.mat1, self._to_internal(x), tw,
                             self._c(c, "w1", None))
        C, B, t = mid.shape
        V = self.mat2.dot(mid.reshape(C, B * t), self._c(c, "w2", None))
        return V, B, t

    def precompute(self, b, c=None):
        """Cached-operand state for mul_cached: un-folded level-2 bucket
        planes on the fused path (see pallas_fold.Mxu2PallasNTT)."""
        if not self.fuse_pointwise:
            return super().precompute(b, c)
        V, _, _ = self._fwd_buckets(b, c)
        return V

    def mul_cached(self, a, fb, c=None):
        if not self.fuse_pointwise:
            return super().mul_cached(a, fb, c)
        Va, B, t = self._fwd_buckets(a, c)
        if fb.shape[1] != B * t:
            # batch-1 cached operand: broadcast bucket columns over the
            # live batch (challenge-multiply pattern)
            assert fb.shape[1] == t, (fb.shape, B, t)
            fb = jnp.broadcast_to(fb[:, None, :],
                                  (fb.shape[0], B, t)).reshape(
                                      fb.shape[0], B * t)
        prod = bb_fold_end2_mul_dma(Va, fb, self.mat2.R,
                                    chunk=min(self.fold_chunk, 1024),
                                    interpret=self.interpret,
                                    signed=not self.unsigned)
        prod = prod.reshape(self.mat2.R, B, t)
        return self._from_internal(self.inverse_internal(prod, c))

    def square(self, a, c=None):
        if not self.fuse_pointwise:
            return super().square(a, c)
        Va, B, t = self._fwd_buckets(a, c)
        prod = bb_fold_end2_mul_dma(Va, Va, self.mat2.R,
                                    chunk=min(self.fold_chunk, 1024),
                                    interpret=self.interpret,
                                    signed=not self.unsigned)
        prod = prod.reshape(self.mat2.R, B, t)
        return self._from_internal(self.inverse_internal(prod, c))

    def mul(self, a, b, c=None):
        """Full multiply with the forward end-folds + slot product in
        ONE kernel (bb_fold_end2_mul_dma)."""
        if not self.fuse_pointwise:
            return super().mul(a, b, c)
        tw = self._c(c, "tw", self.tw)
        w1 = self._c(c, "w1", None)
        w2 = self._c(c, "w2", None)
        if self.stack_forward:
            # One stacked forward for both operands (see
            # pallas_fold.Mxu2PallasNTT.mul): shared weight matrices ->
            # one dot/fold pair at 2x columns; the fold2 kernel reads
            # each operand's half of the stacked buckets via DMA
            # offsets.
            ab = jnp.concatenate(
                [self._to_internal(a), self._to_internal(b)], axis=1)
            mid = self._lvl_tw_t(self.mat1, ab, tw, w1)
            C, B2, t = mid.shape
            B = B2 // 2
            V = self.mat2.dot(mid.reshape(C, B2 * t), w2)
            prod = bb_fold_end2_mul_dma(V, None, self.mat2.R,
                                        chunk=min(self.fold_chunk, 1024),
                                        interpret=self.interpret,
                                        signed=not self.unsigned)
            t = self.mat1.R
        else:
            mids = []
            for x in (a, b):
                mid = self._lvl_tw_t(self.mat1, self._to_internal(x), tw,
                                     w1)
                C, B, t = mid.shape
                mids.append(self.mat2.dot(mid.reshape(C, B * t), w2))
            prod = bb_fold_end2_mul_dma(mids[0], mids[1], self.mat2.R,
                                        chunk=min(self.fold_chunk, 1024),
                                        interpret=self.interpret,
                                        signed=not self.unsigned)
        prod = prod.reshape(self.mat2.R, B, t)
        return self._from_internal(self.inverse_internal(prod, c))
