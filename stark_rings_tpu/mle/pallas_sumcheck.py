"""One-kernel sumcheck prover for products of Goldilocks MLE tables.

The XLA prover (mle/sumcheck.py) runs nv dependent halving rounds of
emulated-u64 elementwise passes; at nv = 20 that materializes every
round's tables/products in HBM and lands ~200x off the VPU envelope
(~15 proofs/s measured, PERF_NOTES).  This kernel streams the 2^nv
tables from HBM exactly ONCE: round 0 folds chunk-by-chunk into a
half-size VMEM scratch per table while accumulating the round messages,
every later round runs in place in scratch down to 2^10 entries, and
the last 10 tiny rounds finish at XLA level inside the same jit module
(mle/sumcheck.py rounds on <= 1024-entry tables).

Binding order: MSB-first ("msb" in mle/sumcheck.py terms) — the top
variable's cosets are contiguous row halves, so every round is pure
sublane slicing (the mle/pallas_fix.py layout rule).  msb-order proving
on T equals lsb-order proving on bit_reverse_table(T) message-for-
message, so the reference's x_0-first convention
(/root/reference/crates/poly/src/mle/dense.rs:171-199) is one free
transpose away; both identities are tested in test_sumcheck_lib.

Message accumulation: per evaluation point t in 0..k, chunk products
accumulate into a VMEM accumulator with canonical modular adds, then a
sublane halving tree reduces to one [1, 128] row per (round, t); the
final 128-lane modular sum happens at XLA level on the tiny output.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import GOLDILOCKS as _F
from ..ops.pallas_goldilocks import _add_q, _mul_q, _sub_q
from .sumcheck import sumcheck_prove_many_with_challenges

__all__ = ["sumcheck_prove_goldilocks_pallas",
           "sumcheck_prove_many_goldilocks_pallas",
           "sumcheck_prove_batch_goldilocks_pallas"]

_ANY = pl.BlockSpec(memory_space=pltpu.ANY)
_WHOLE = pl.BlockSpec(memory_space=pltpu.VMEM)
_LANES = 128
#: rows left to the XLA tail  (8 rows x 128 lanes = 2^10 entries)
_TAIL_ROWS = 8
#: VMEM scratch budget for the per-table half-size tables (bytes); the
#: rest of the ~16 MB Mosaic budget goes to stream buffers, accumulators
#: and chunk temporaries
_SCRATCH_BUDGET = 9 << 20


def _tree_sum(lo, hi):
    """[m, 128] canonical pairs -> [1, 128] modular sublane sum."""
    m = lo.shape[0]
    assert m & (m - 1) == 0
    while m > 1:
        m //= 2
        lo, hi = _add_q(lo[:m], hi[:m], lo[m:2 * m], hi[m:2 * m])
    return lo, hi


def _prod(pairs):
    """Elementwise modular product over a list of (lo, hi) pairs."""
    lo, hi = pairs[0]
    for l2, h2 in pairs[1:]:
        lo, hi = _mul_q(lo, hi, l2, h2)
    return lo, hi


def _fold1(t0lo, t0hi, dlo, dhi, rlo, rhi):
    """t0 + r*d on u32 pairs, r broadcast to the slice shape."""
    mlo, mhi = _mul_q(dlo, dhi, jnp.broadcast_to(rlo, dlo.shape),
                      jnp.broadcast_to(rhi, dhi.shape))
    return _add_q(t0lo, t0hi, mlo, mhi)


def _make_kernel(nv: int, k: int, chunk: int):
    rows = (1 << nv) // _LANES
    h0 = rows // 2
    nk = nv - 10                   # rounds bound inside the kernel

    def kern(*refs):
        ins = refs[:2 * k]                       # per-table (lo, hi) HBM
        plo, phi = refs[2 * k:2 * k + 2]         # [nk, 128] challenges
        msgs_lo, msgs_hi = refs[2 * k + 2:2 * k + 4]
        fins = refs[2 * k + 4:4 * k + 4]         # per-table [8,128] out
        (vin_lo, vin_hi, s_lo, s_hi,
         acc_lo, acc_hi, sem) = refs[4 * k + 4:]

        def acc_zero(ch):
            z = jnp.zeros((ch, _LANES), jnp.uint32)
            for t in range(k + 1):
                acc_lo[t, :ch] = z
                acc_hi[t, :ch] = z

        def acc_add(t, plo_, phi_):
            ch = plo_.shape[0]
            al, ah = _add_q(acc_lo[t, :ch], acc_hi[t, :ch], plo_, phi_)
            acc_lo[t, :ch] = al
            acc_hi[t, :ch] = ah

        def messages(t0s, ds, i, multi):
            """Evaluate p(t) for t = 0..k on one chunk's halves."""
            cur = t0s
            for t in range(k + 1):
                if t:
                    cur = [_add_q(*cur[j], *ds[j]) for j in range(k)]
                pl_, ph_ = _prod(cur)
                if multi:
                    acc_add(t, pl_, ph_)
                else:
                    tl, th = _tree_sum(pl_, ph_)
                    row = i * (k + 1) + t
                    msgs_lo[row:row + 1] = tl
                    msgs_hi[row:row + 1] = th

        def flush_acc(i, ch):
            for t in range(k + 1):
                tl, th = _tree_sum(acc_lo[t, :ch], acc_hi[t, :ch])
                row = i * (k + 1) + t
                msgs_lo[row:row + 1] = tl
                msgs_hi[row:row + 1] = th

        # ---- round 0: stream from HBM, fold into scratch --------------
        r0lo, r0hi = plo[0:1], phi[0:1]
        acc_zero(chunk)
        for c0 in range(0, h0, chunk):
            cps = []
            for j in range(k):
                tlo_h, thi_h = ins[2 * j], ins[2 * j + 1]
                for slot, (src, ofs) in enumerate(
                        ((tlo_h, 0), (thi_h, 0),
                         (tlo_h, h0), (thi_h, h0))):
                    sid = 4 * j + slot
                    cps.append(pltpu.make_async_copy(
                        src.at[pl.ds(jnp.int32(ofs + c0), chunk)],
                        (vin_lo if slot % 2 == 0 else vin_hi
                         ).at[jnp.int32(2 * j + slot // 2)],
                        sem.at[jnp.int32(sid)]))
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            t0s = [(vin_lo[jnp.int32(2 * j)], vin_hi[jnp.int32(2 * j)])
                   for j in range(k)]
            t1s = [(vin_lo[jnp.int32(2 * j + 1)],
                    vin_hi[jnp.int32(2 * j + 1)]) for j in range(k)]
            ds = [_sub_q(*t1s[j], *t0s[j]) for j in range(k)]
            messages(t0s, ds, 0, True)
            for j in range(k):
                flo, fhi = _fold1(*t0s[j], *ds[j], r0lo, r0hi)
                s_lo[j, c0:c0 + chunk] = flo
                s_hi[j, c0:c0 + chunk] = fhi
        flush_acc(0, chunk)

        # ---- rounds 1..nk-1: in place in scratch ----------------------
        S = h0
        for i in range(1, nk):
            h = S // 2
            ch = min(h, chunk)
            multi = h > ch
            rilo, rihi = plo[i:i + 1], phi[i:i + 1]
            if multi:
                acc_zero(ch)
            for c0 in range(0, h, ch):
                t0s = [(s_lo[j, c0:c0 + ch], s_hi[j, c0:c0 + ch])
                       for j in range(k)]
                t1s = [(s_lo[j, h + c0:h + c0 + ch],
                        s_hi[j, h + c0:h + c0 + ch]) for j in range(k)]
                ds = [_sub_q(*t1s[j], *t0s[j]) for j in range(k)]
                messages(t0s, ds, i, multi)
                for j in range(k):
                    flo, fhi = _fold1(*t0s[j], *ds[j], rilo, rihi)
                    s_lo[j, c0:c0 + ch] = flo
                    s_hi[j, c0:c0 + ch] = fhi
            if multi:
                flush_acc(i, ch)
            S = h

        # ---- remaining 2^10-entry tables out --------------------------
        assert S == _TAIL_ROWS
        for j in range(k):
            fins[2 * j][:] = s_lo[j, :_TAIL_ROWS]
            fins[2 * j + 1][:] = s_hi[j, :_TAIL_ROWS]

    return kern


def _to_planes(x, rows):
    v = jax.lax.bitcast_convert_type(x.reshape(rows, _LANES), jnp.uint32)
    return v[..., 0], v[..., 1]


def _from_planes(lo, hi):
    return jax.lax.bitcast_convert_type(
        jnp.stack([lo, hi], axis=-1), jnp.uint64)


def sumcheck_prove_many_goldilocks_pallas(tables, challenges,
                                          chunk: int = 256,
                                          interpret: bool = False):
    """k-ary product sumcheck prover, msb binding order, one kernel +
    an XLA tail.  ``tables``: k canonical u64 [2^nv] arrays;
    ``challenges``: nv scalars.  Returns (msgs [nv, k+1], finals [k]) —
    exactly ``sumcheck_prove_many_with_challenges(f, tables, challenges,
    order="msb")`` (tested), at one HBM read of the tables instead of
    ~2 reads + 2 writes per round."""
    f = _F
    k = len(tables)
    nv = len(challenges)
    n = 1 << nv
    assert all(T.shape == (n,) for T in tables)
    if nv < 12:
        return sumcheck_prove_many_with_challenges(f, tables, challenges,
                                                   order="msb")
    nk = nv - 10
    rows = n // _LANES
    h0 = rows // 2
    assert k * h0 * _LANES * 8 <= _SCRATCH_BUDGET, (
        f"k={k} tables at nv={nv} exceed the VMEM scratch budget")
    chunk = min(chunk, h0)
    while h0 % chunk:
        chunk //= 2

    planes = []
    for T in tables:
        lo, hi = _to_planes(jnp.asarray(T), rows)
        planes += [lo, hi]
    pts = jnp.stack([jnp.asarray(challenges[i], dtype=jnp.uint64)
                     for i in range(nk)])
    p32 = jax.lax.bitcast_convert_type(
        jnp.broadcast_to(pts[:, None], (nk, _LANES)), jnp.uint32)

    out_shape = ((jax.ShapeDtypeStruct((nk * (k + 1), _LANES), jnp.uint32),
                  jax.ShapeDtypeStruct((nk * (k + 1), _LANES), jnp.uint32))
                 + tuple(jax.ShapeDtypeStruct((_TAIL_ROWS, _LANES),
                                              jnp.uint32)
                         for _ in range(2 * k)))
    pcall = pl.pallas_call(
        _make_kernel(nv, k, chunk),
        in_specs=[_ANY] * (2 * k) + [_WHOLE, _WHOLE],
        out_specs=(_WHOLE,) * (2 + 2 * k),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2 * k, chunk, _LANES), jnp.uint32),   # vin_lo
            pltpu.VMEM((2 * k, chunk, _LANES), jnp.uint32),   # vin_hi
            pltpu.VMEM((k, h0, _LANES), jnp.uint32),          # s_lo
            pltpu.VMEM((k, h0, _LANES), jnp.uint32),          # s_hi
            pltpu.VMEM((k + 1, chunk, _LANES), jnp.uint32),   # acc_lo
            pltpu.VMEM((k + 1, chunk, _LANES), jnp.uint32),   # acc_hi
            pltpu.SemaphoreType.DMA((4 * k,)),
        ],
        interpret=interpret,
    )
    outs = pcall(*planes, p32[..., 0], p32[..., 1])
    msgs_lo, msgs_hi = outs[0], outs[1]
    part = _from_planes(msgs_lo, msgs_hi)          # [nk*(k+1), 128]
    head = f.sum(part, axis=1).reshape(nk, k + 1)
    tails = [_from_planes(outs[2 + 2 * j], outs[3 + 2 * j]).reshape(-1)
             for j in range(k)]
    msgs_tail, finals = sumcheck_prove_many_with_challenges(
        f, tails, list(challenges[nk:]), order="msb")
    return jnp.concatenate([head, msgs_tail], axis=0), finals


def sumcheck_prove_goldilocks_pallas(G, H, challenges, chunk: int = 256,
                                     interpret: bool = False):
    """Product-of-two prover (the sumcheck_prove_with_challenges shape,
    order="msb"): returns (msgs [nv, 3], g_final, h_final)."""
    msgs, finals = sumcheck_prove_many_goldilocks_pallas(
        [G, H], challenges, chunk=chunk, interpret=interpret)
    return msgs, finals[0], finals[1]


def sumcheck_prove_batch_goldilocks_pallas(tables, challenges,
                                           chunk: int = 256,
                                           interpret: bool = False):
    """W claims sharing one challenge vector (the shape protocol loops
    run: fold W witness sumchecks per step).  ``tables``: k stacked
    canonical u64 [W, 2^nv] arrays.  Returns (msgs [W, nv, k+1],
    finals [k] of [W]) — one kernel per claim inside the caller's jit
    module, so per-proof dispatch cost amortizes across the batch."""
    k = len(tables)
    W = tables[0].shape[0]
    assert all(T.shape == tables[0].shape for T in tables)
    msgs, fins = [], []
    for w in range(W):
        m, fs = sumcheck_prove_many_goldilocks_pallas(
            [T[w] for T in tables], challenges, chunk=chunk,
            interpret=interpret)
        msgs.append(m)
        fins.append(fs)
    return (jnp.stack(msgs),
            [jnp.stack([fins[w][j] for w in range(W)]) for j in range(k)])
