"""Pallas epilogue kernels for the MXU NTT v2 (ops/mxu2.py).

The 8-bit dots run at XLA level (measured 275-700 TOPS there vs ~25 in
Mosaic); what XLA cannot do efficiently is the *fold*: combining the
int32 bucket planes (8 unsigned by default, 9 signed+biased with
unsigned=False — see ops/mxu2.py) into a canonical u64 mod q — at XLA
level the u64 emulation materializes every intermediate to HBM
(measured ~65us per deg-2^16 element for ONE fold).  These kernels do
the fold (and the fused mid-twiddle modmul) in VMEM on u32 pairs.

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

__all__ = ["fold_end", "fold_tw", "fold_end_dma", "fold_tw_dma",
           "fold_end2_mul_dma", "pointwise_mul", "pointwise_dma",
           "pointwise_chain"]

_BIAS = np.uint32(1 << 26)
_BIAS_VAL = sum((1 << 26) << (B_BITS * k) for k in range(K_BUCKETS))
_Q = 2**64 - 2**32 + 1
_BM = _BIAS_VAL % _Q
_BM_LO = np.uint32(_BM & 0xFFFFFFFF)
_BM_HI = np.uint32(_BM >> 32)


def _u32cast(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _fold_rows(v, R, signed=True):
    """v: int32 [K*R, C] -> canonical (lo, hi) u32 [R, C].

    Signed scheme (K=9 signed weight digits): value =
    sum_k (v_k + 2^26) 2^(8k) - BIAS  (mod q); the +2^26 bias makes
    every bucket nonnegative (|v_k| < 2^26 by the int8 accumulation
    bound), and u32 wraparound implements it for free on the raw bits.
    Unsigned scheme (u8 x u8 dots, K=8): buckets are already
    nonnegative int32 — no bias add, no bias subtract.
    """
    K = v.shape[0] // R
    zero = jnp.zeros((R,) + v.shape[1:], dtype=jnp.uint32)
    w = [zero, zero, zero, zero]
    ov = [zero, zero, zero, zero]
    for k in range(K):
        b = _u32cast(v[k * R:(k + 1) * R])
        if signed:
            b = b + _BIAS
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
    if not signed:
        return lo, hi
    return _sub_q(lo, hi, _BM_LO, _BM_HI)


def _make_fold_end_kernel(R, signed=True):
    def kern(v_ref, olo_ref, ohi_ref):
        lo, hi = _fold_rows(v_ref[:], R, signed)
        olo_ref[:] = lo
        ohi_ref[:] = hi

    return kern


def _make_fold_tw_kernel(R, t, bc, signed=True):
    def kern(v_ref, twlo_ref, twhi_ref, olo_ref, ohi_ref):
        twlo = twlo_ref[:]
        twhi = twhi_ref[:]
        for b in range(bc):
            lo, hi = _fold_rows(v_ref[:, b * t:(b + 1) * t], R, signed)
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


def fold_end(V, R, chunk=512, interpret=False, signed=True):
    """int32 [K*R, cols] -> u64 [R, cols] (cols % chunk == 0 or one chunk)."""
    cols = V.shape[1]
    chunk = min(chunk, cols)
    if cols % chunk:
        chunk = cols
    kern = _make_fold_end_kernel(R, signed)
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


def fold_tw(V, tw_lo, tw_hi, R, bc=2, interpret=False, signed=True):
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
    kern = _make_fold_tw_kernel(R, t, bc, signed)
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
# DMA-looped folds: ONE pallas_call per fold, the chunk loop runs INSIDE
# the kernel (double-buffered HBM<->VMEM copies).  The chunked XLA-level
# variants above emit cols/chunk separate custom-calls per fold, which
# (a) blows up module size — the fully-fused multiply never compiled on
# the remote service — and (b) scales dispatch count with batch.  With
# the loop in-kernel the whole multiply fits in ONE module.
# ---------------------------------------------------------------------------


def _make_fold_dma_kernel(R, n_chunks, chunk, t=None, bc=None,
                          transpose_out=False, unroll=False, signed=True):
    """Fold kernel with an internal fori_loop over column chunks.

    With t/bc set, fuses the mid-twiddle modmul (twiddle planes stay
    resident in VMEM).  Two twiddled regimes: chunk == bc*t (bc whole
    batch elements per iteration) or chunk < t with t % chunk == 0
    (sub-tile iteration — required once t exceeds the VMEM chunk budget,
    e.g. deg-2^18+ where t = 512).  With transpose_out, each folded
    [R, t] tile is written transposed, so the output is [t, B*R] — the
    mid-level transpose of the four-step NTT fused into the epilogue
    (no separate XLA u64 transpose pass)."""
    twiddled = t is not None
    subt = twiddled and chunk < t
    sub = (t // chunk) if subt else 1
    ochunk = bc * R if (transpose_out and not subt) else chunk

    def kern(*refs):
        if twiddled:
            v_hbm, twlo, twhi, olo_hbm, ohi_hbm = refs[:5]
            vin, vlo, vhi, in_sem, out_sem = refs[5:]
        else:
            v_hbm, olo_hbm, ohi_hbm = refs[:3]
            vin, vlo, vhi, in_sem, out_sem = refs[3:]

        def in_copy(i, slot):
            i, slot = _i32(i), _i32(slot)
            return pltpu.make_async_copy(
                v_hbm.at[:, pl.ds(i * chunk, chunk)],
                vin.at[slot], in_sem.at[slot])

        def out_copies(i, slot):
            i, slot = _i32(i), _i32(slot)
            if transpose_out and subt:
                b = i // jnp.int32(sub) if not isinstance(i, int) \
                    else i // sub
                toff = (i % jnp.int32(sub) if not isinstance(i, int)
                        else i % sub) * chunk
                dst_lo = olo_hbm.at[pl.ds(toff, chunk),
                                    pl.ds(b * R, R)]
                dst_hi = ohi_hbm.at[pl.ds(toff, chunk),
                                    pl.ds(b * R, R)]
            else:
                dst_lo = olo_hbm.at[:, pl.ds(i * ochunk, ochunk)]
                dst_hi = ohi_hbm.at[:, pl.ds(i * ochunk, ochunk)]
            return (
                pltpu.make_async_copy(vlo.at[slot], dst_lo,
                                      out_sem.at[slot, _i32(0)]),
                pltpu.make_async_copy(vhi.at[slot], dst_hi,
                                      out_sem.at[slot, _i32(1)]))

        in_copy(0, 0).start()

        def body(i, carry):
            # int32 indices: Mosaic's memref_slice rejects i64 (x64 mode)
            if isinstance(i, int):          # unrolled: static control flow
                slot, nxt = i % 2, (i + 1) % 2
            else:
                slot = jax.lax.rem(i, jnp.int32(2))
                nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

            @_when(i + 1 < n_chunks)
            def _():
                in_copy(i + 1, nxt).start()

            in_copy(i, slot).wait()

            @_when(i >= 2)
            def _():
                for cp in out_copies(i - 2, slot):
                    cp.wait()

            v = vin[slot]
            if twiddled and subt:
                toff = ((i % sub) if isinstance(i, int)
                        else jax.lax.rem(i, jnp.int32(sub))) * chunk
                lo_t = twlo[:, pl.ds(_i32(toff), chunk)]
                hi_t = twhi[:, pl.ds(_i32(toff), chunk)]
                lo, hi = _fold_rows(v, R, signed)
                plo, phi = _mul_q(lo, hi, lo_t, hi_t)
                if transpose_out:
                    vlo[slot] = plo.T
                    vhi[slot] = phi.T
                else:
                    vlo[slot] = plo
                    vhi[slot] = phi
            elif twiddled:
                lo_t = twlo[:]
                hi_t = twhi[:]
                for b in range(bc):
                    lo, hi = _fold_rows(v[:, b * t:(b + 1) * t], R, signed)
                    plo, phi = _mul_q(lo, hi, lo_t, hi_t)
                    if transpose_out:
                        vlo[slot, :, b * R:(b + 1) * R] = plo.T
                        vhi[slot, :, b * R:(b + 1) * R] = phi.T
                    else:
                        vlo[slot, :, b * t:(b + 1) * t] = plo
                        vhi[slot, :, b * t:(b + 1) * t] = phi
            else:
                lo, hi = _fold_rows(v, R, signed)
                vlo[slot] = lo
                vhi[slot] = hi
            for cp in out_copies(i, slot):
                cp.start()
            return carry

        if unroll:
            for i in range(n_chunks):
                body(i, 0)
        else:
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks), body,
                              jnp.int32(0))
        for tail in range(max(0, n_chunks - 2), n_chunks):
            for cp in out_copies(tail, tail % 2):
                cp.wait()

    return kern


_ANY = pl.BlockSpec(memory_space=pltpu.ANY)


def _i32(x):
    """Static python-int kernel indices lower as i64 constants under
    x64 mode, which Mosaic's memref_slice verifier rejects."""
    return jnp.int32(x) if isinstance(x, int) else x


def _when(pred):
    """pl.when that also accepts a static python bool (unrolled loops)."""
    if isinstance(pred, (bool, np.bool_)):
        def deco(fn):
            if pred:
                fn()
            return fn
        return deco
    return pl.when(pred)


def _fold_dma(V, R, chunk, tw_planes=None, bc=2, transpose_out=False,
              unroll=False, interpret=False, signed=True):
    cols = V.shape[1]
    subt = False
    if tw_planes is not None:
        t = tw_planes[0].shape[1]
        chunk = min(chunk, cols)
        if chunk >= t:
            bc = max(1, min(bc, chunk // t))
            chunk = bc * t
            while cols % chunk:
                bc -= 1
                chunk = bc * t
        else:
            subt = True           # iterate sub-tiles of each element
            bc = 1
            while t % chunk:
                chunk //= 2
    else:
        t = None
        bc = None
        chunk = min(chunk, cols)
        while cols % chunk:
            chunk //= 2
    n_chunks = cols // chunk
    KR = V.shape[0]
    kern = _make_fold_dma_kernel(R, n_chunks, chunk, t, bc, transpose_out,
                                 unroll, signed)
    in_specs = [_ANY] + ([_WHOLE, _WHOLE] if tw_planes is not None else [])
    if transpose_out:
        out_rows, out_cols = t, (cols // t) * R
        vshape = (2, chunk, R) if subt else (2, t, bc * R)
    else:
        out_rows, out_cols = R, cols
        vshape = (2, R, chunk)
    pcall = pl.pallas_call(
        kern,
        in_specs=in_specs,
        out_specs=(_ANY, _ANY),
        out_shape=(jax.ShapeDtypeStruct((out_rows, out_cols), jnp.uint32),
                   jax.ShapeDtypeStruct((out_rows, out_cols), jnp.uint32)),
        scratch_shapes=[
            pltpu.VMEM((2, KR, chunk), jnp.int32),
            pltpu.VMEM(vshape, jnp.uint32),
            pltpu.VMEM(vshape, jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )
    args = (V,) if tw_planes is None else (V, tw_planes[0], tw_planes[1])
    lo, hi = pcall(*args)
    return _pack_u64(lo, hi)


def fold_end_dma(V, R, chunk=512, unroll=False, interpret=False,
                 signed=True):
    """fold_end with the chunk loop inside ONE kernel (see module note)."""
    return _fold_dma(V, R, chunk, unroll=unroll, interpret=interpret,
                     signed=signed)


def fold_tw_dma(V, tw_lo, tw_hi, R, chunk=512, transpose_out=False,
                unroll=False, interpret=False, signed=True):
    """fold_tw with the chunk loop inside ONE kernel.

    transpose_out=True returns [t, (cols//t)*R] — each folded+twiddled
    [R, t] tile written transposed (the four-step mid transpose fused)."""
    return _fold_dma(V, R, chunk, tw_planes=(tw_lo, tw_hi),
                     transpose_out=transpose_out, unroll=unroll,
                     interpret=interpret, signed=signed)


def _make_fold2_mul_kernel(R, n_chunks, chunk, signed=True, stacked=0):
    """Fold TWO bucket-plane inputs and multiply them slotwise, fused.

    Saves the standalone pointwise kernel's HBM round trip: the two
    forward transforms' canonical u64 values never hit HBM separately —
    only the slot product does.

    With ``stacked`` set, there is ONE bucket-plane input holding both
    operands side by side ([K*R, 2*cols], operand j at column offset
    j*stacked) and the kernel DMAs each half directly — no XLA-level
    strided slice (which would materialize ~100 MB copies)."""

    def kern(*refs):
        if stacked:
            v_hbm, olo_hbm, ohi_hbm = refs[:3]
            vin, vlo, vhi, in_sem, out_sem = refs[3:]
            srcs = (v_hbm, v_hbm)
            offs = (0, stacked)
        else:
            va_hbm, vb_hbm, olo_hbm, ohi_hbm = refs[:4]
            vin, vlo, vhi, in_sem, out_sem = refs[4:]
            srcs = (va_hbm, vb_hbm)
            offs = (0, 0)

        def in_copies(i, slot):
            i, slot = _i32(i), _i32(slot)
            return [pltpu.make_async_copy(
                srcs[j].at[:, pl.ds(i * chunk + _i32(offs[j]), chunk)],
                vin.at[slot, _i32(j)], in_sem.at[slot, _i32(j)])
                for j in range(2)]

        def out_copies(i, slot):
            i, slot = _i32(i), _i32(slot)
            return (
                pltpu.make_async_copy(
                    vlo.at[slot], olo_hbm.at[:, pl.ds(i * chunk, chunk)],
                    out_sem.at[slot, _i32(0)]),
                pltpu.make_async_copy(
                    vhi.at[slot], ohi_hbm.at[:, pl.ds(i * chunk, chunk)],
                    out_sem.at[slot, _i32(1)]))

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
                for cp in out_copies(i - 2, slot):
                    cp.wait()

            alo, ahi = _fold_rows(vin[slot, _i32(0)], R, signed)
            blo, bhi = _fold_rows(vin[slot, _i32(1)], R, signed)
            lo, hi = _mul_q(alo, ahi, blo, bhi)
            vlo[slot] = lo
            vhi[slot] = hi
            for cp in out_copies(i, slot):
                cp.start()
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks), body,
                          jnp.int32(0))
        for tail in range(max(0, n_chunks - 2), n_chunks):
            for cp in out_copies(tail, tail % 2):
                cp.wait()

    return kern


def fold_end2_mul_dma(Va, Vb=None, R=None, chunk=256, interpret=False,
                      signed=True):
    """(fold(Va) * fold(Vb)) mod q, fused: int32 [K*R, cols] x2 -> u64
    [R, cols].  Replaces fold_end(Va), fold_end(Vb) and the pointwise
    kernel in the full multiply.

    With Vb=None, Va holds BOTH operands stacked side by side
    ([K*R, 2*cols], operand b in the right half); the kernel reads each
    half via DMA column offsets."""
    stacked = Vb is None
    cols = Va.shape[1] // 2 if stacked else Va.shape[1]
    chunk = min(chunk, cols)
    while cols % chunk:
        chunk //= 2
    n_chunks = cols // chunk
    KR = Va.shape[0]
    pcall = pl.pallas_call(
        _make_fold2_mul_kernel(R, n_chunks, chunk, signed,
                               stacked=cols if stacked else 0),
        in_specs=[_ANY] if stacked else [_ANY, _ANY],
        out_specs=(_ANY, _ANY),
        out_shape=(jax.ShapeDtypeStruct((R, cols), jnp.uint32),
                   jax.ShapeDtypeStruct((R, cols), jnp.uint32)),
        scratch_shapes=[
            pltpu.VMEM((2, 2, KR, chunk), jnp.int32),
            pltpu.VMEM((2, R, chunk), jnp.uint32),
            pltpu.VMEM((2, R, chunk), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )
    lo, hi = pcall(Va) if stacked else pcall(Va, Vb)
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


def _make_pointwise_dma_kernel(n_chunks, chunk, width):
    def kern(alo, ahi, blo, bhi, olo_h, ohi_h, vin, vlo, vhi,
             in_sem, out_sem):
        srcs = (alo, ahi, blo, bhi)

        def in_copies(i, slot):
            i, slot = _i32(i), _i32(slot)
            return [pltpu.make_async_copy(
                srcs[j].at[pl.ds(i * chunk, chunk)],
                vin.at[slot, _i32(j)], in_sem.at[slot, _i32(j)])
                for j in range(4)]

        def out_copies(i, slot):
            i, slot = _i32(i), _i32(slot)
            return (
                pltpu.make_async_copy(
                    vlo.at[slot], olo_h.at[pl.ds(i * chunk, chunk)],
                    out_sem.at[slot, _i32(0)]),
                pltpu.make_async_copy(
                    vhi.at[slot], ohi_h.at[pl.ds(i * chunk, chunk)],
                    out_sem.at[slot, _i32(1)]))

        for cp in in_copies(0, 0):
            cp.start()

        def body(i, carry):
            # int32 indices: Mosaic's memref_slice rejects i64 (x64 mode)
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
                for cp in out_copies(i - jnp.int32(2), slot):
                    cp.wait()

            lo, hi = _mul_q(vin[slot, _i32(0)], vin[slot, _i32(1)],
                            vin[slot, _i32(2)], vin[slot, _i32(3)])
            vlo[slot] = lo
            vhi[slot] = hi
            for cp in out_copies(i, slot):
                cp.start()
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks), body,
                          jnp.int32(0))
        for tail in range(max(0, n_chunks - 2), n_chunks):
            for cp in out_copies(tail, tail % 2):
                cp.wait()

    return kern


def pointwise_dma(a, b, chunk_rows=64, width=2048, interpret=False):
    """pointwise_mul with the row-chunk loop inside ONE kernel."""
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
    n_chunks = rows // chunk
    pcall = pl.pallas_call(
        _make_pointwise_dma_kernel(n_chunks, chunk, width),
        in_specs=[_ANY] * 4,
        out_specs=(_ANY, _ANY),
        out_shape=(jax.ShapeDtypeStruct((rows, width), jnp.uint32),
                   jax.ShapeDtypeStruct((rows, width), jnp.uint32)),
        scratch_shapes=[
            pltpu.VMEM((2, 4, chunk, width), jnp.uint32),
            pltpu.VMEM((2, chunk, width), jnp.uint32),
            pltpu.VMEM((2, chunk, width), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )
    lo, hi = pcall(av[..., 0], av[..., 1], bv[..., 0], bv[..., 1])
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
                 pointwise_pallas: bool = False, dma_folds: bool = False,
                 fold_chunk: int = 512, fuse_transpose: bool = True,
                 fuse_pointwise: bool = False, unsigned: bool = True,
                 stack_forward: bool = False):
        super().__init__(N, n1, unsigned)
        self.interpret = interpret
        self.pointwise_pallas = pointwise_pallas
        self.dma_folds = dma_folds
        self.fold_chunk = fold_chunk
        self.fuse_transpose = fuse_transpose
        self.fuse_pointwise = fuse_pointwise
        self.stack_forward = stack_forward
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
        if self.dma_folds:
            y = fold_end_dma(V, mat.R, chunk=self.fold_chunk,
                             interpret=self.interpret,
                             signed=not self.unsigned)
        else:
            y = fold_end(V, mat.R, interpret=self.interpret,
                         signed=not self.unsigned)
        return y.reshape(mat.R, B, t)

    def _fold_tw(self, mat, V, tw, B, t):
        lo, hi = self._tw_planes(tw)
        if self.dma_folds:
            y = fold_tw_dma(V, lo, hi, mat.R, chunk=self.fold_chunk,
                            interpret=self.interpret,
                            signed=not self.unsigned)
        else:
            y = fold_tw(V, lo, hi, mat.R, interpret=self.interpret,
                        signed=not self.unsigned)
        return y.reshape(mat.R, B, t)

    def _lvl_tw_t(self, mat, x, tw, big=None):
        """Mid level with the transpose fused into the fold kernel."""
        if not (self.dma_folds and self.fuse_transpose):
            return super()._lvl_tw_t(mat, x, tw, big)
        C, B, t = x.shape
        V = mat.dot(x.reshape(C, B * t), big)
        lo, hi = self._tw_planes(tw)
        y = fold_tw_dma(V, lo, hi, mat.R, chunk=self.fold_chunk,
                        transpose_out=True, interpret=self.interpret,
                        signed=not self.unsigned)
        return y.reshape(t, B, mat.R)

    def pointwise(self, fa, fb):
        if self.pointwise_pallas:
            if self.dma_folds:
                return pointwise_dma(fa, fb, interpret=self.interpret)
            return pointwise_mul(fa, fb, interpret=self.interpret)
        return super().pointwise(fa, fb)

    def _fwd_buckets(self, x, c=None):
        """Level-1 + level-2 dot of the forward transform WITHOUT the
        final end-fold: returns the int32 bucket planes [K*R, B*t] that
        fold_end2_mul_dma consumes directly."""
        tw = self._c(c, "tw", self.tw)
        mid = self._lvl_tw_t(self.mat1, self._to_internal(x), tw,
                             self._c(c, "w1", None))
        C, B, t = mid.shape
        V = self.mat2.dot(mid.reshape(C, B * t), self._c(c, "w2", None))
        return V, B, t

    def precompute(self, b, c=None):
        """Cached-operand state: on the fused path this is the UN-FOLDED
        level-2 bucket tensor, so mul_cached can feed it straight into
        fold_end2_mul_dma (the live operand's end-fold and the slot
        product stay fused in one kernel; the cached operand costs no
        kernel work at all per multiply)."""
        if not (self.dma_folds and self.fuse_pointwise):
            return super().precompute(b, c)
        V, _, _ = self._fwd_buckets(b, c)
        return V

    def _tail_cached(self, a, Vb, c=None):
        Va, B, t = self._fwd_buckets(a, c)
        if Vb.shape[1] != B * t:
            # batch-1 cached operand (challenge-multiply pattern):
            # broadcast its bucket columns across the live batch.  The
            # tile is cheap relative to the forward it replaces (t cols
            # -> B*t cols of int32; XLA fuses the broadcast into the
            # kernel's operand feed).
            assert Vb.shape[1] == t and B * t % Vb.shape[1] == 0, \
                (Vb.shape, B, t)
            Vb = jnp.broadcast_to(Vb[:, None, :],
                                  (Vb.shape[0], B, t)).reshape(
                                      Vb.shape[0], B * t)
        prod = fold_end2_mul_dma(Va, Vb, self.mat2.R,
                                 chunk=min(self.fold_chunk, 256),
                                 interpret=self.interpret,
                                 signed=not self.unsigned)
        prod = prod.reshape(self.mat2.R, B, t)
        return self._from_internal(self.inverse_internal(prod, c))

    def mul_cached(self, a, fb, c=None):
        if not (self.dma_folds and self.fuse_pointwise):
            return super().mul_cached(a, fb, c)
        return self._tail_cached(a, fb, c)

    def square(self, a, c=None):
        if not (self.dma_folds and self.fuse_pointwise):
            return super().square(a, c)
        Va, B, t = self._fwd_buckets(a, c)
        prod = fold_end2_mul_dma(Va, Va, self.mat2.R,
                                 chunk=min(self.fold_chunk, 256),
                                 interpret=self.interpret,
                                 signed=not self.unsigned)
        prod = prod.reshape(self.mat2.R, B, t)
        return self._from_internal(self.inverse_internal(prod, c))

    def mul(self, a, b, c=None):
        """Full multiply with the two forward end-folds and the slot
        product fused into ONE kernel (fold_end2_mul_dma): the forward
        transforms' canonical u64 never round-trip through HBM."""
        if not (self.dma_folds and self.fuse_pointwise):
            return super().mul(a, b, c)
        tw = self._c(c, "tw", self.tw)
        w1 = self._c(c, "w1", None)
        w2 = self._c(c, "w2", None)
        if self.stack_forward:
            # Both operands' forward transforms share the same constant
            # weight matrices, so run them as ONE stacked batch: one
            # level-1 dot, one twiddled fold kernel and one level-2 dot
            # at 2x columns instead of two of each (fewer kernel
            # launches; identical MACs and fold work).  Column order of
            # the stacked V is (b2, t) with operand a at b2 < B, so the
            # fold2 kernel reads each operand's half via DMA offsets.
            ab = jnp.concatenate(
                [self._to_internal(a), self._to_internal(b)], axis=1)
            mid = self._lvl_tw_t(self.mat1, ab, tw, w1)   # [t, 2B, R]
            C, B2, t = mid.shape
            B = B2 // 2
            V = self.mat2.dot(mid.reshape(C, B2 * t), w2)
            prod = fold_end2_mul_dma(V, None, self.mat2.R,
                                     chunk=min(self.fold_chunk, 256),
                                     interpret=self.interpret,
                                     signed=not self.unsigned)
            t = self.mat1.R   # post-transpose minor axis (= N1)
        else:
            mids = []
            for x in (a, b):
                mid = self._lvl_tw_t(self.mat1, self._to_internal(x), tw,
                                     w1)
                C, B, t = mid.shape
                mids.append(self.mat2.dot(mid.reshape(C, B * t), w2))
            prod = fold_end2_mul_dma(mids[0], mids[1], self.mat2.R,
                                     chunk=min(self.fold_chunk, 256),
                                     interpret=self.interpret,
                                     signed=not self.unsigned)
        prod = prod.reshape(self.mat2.R, B, t)
        return self._from_internal(self.inverse_internal(prod, c))
