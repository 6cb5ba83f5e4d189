"""One-kernel sumcheck prover for products of MLE tables.

The XLA prover (mle/sumcheck.py) runs nv dependent halving rounds of
emulated elementwise passes; at nv = 20 that materializes every round's
tables/products in HBM and lands ~200x off the VPU envelope (~15
proofs/s measured, PERF_NOTES).  This kernel streams the 2^nv tables
from HBM exactly ONCE: round 0 folds chunk-by-chunk into a half-size
VMEM scratch per table while accumulating the round messages, every
later round runs in place in scratch down to 2^10 entries, and the last
10 tiny rounds finish at XLA level inside the same jit module
(mle/sumcheck.py rounds on <= 1024-entry tables).

Field-parametric like parallel/pallas_exchange.py: a field plugs in as
(storage u32 plane count, plane-tuple add/sub/mul on the STORAGE form).
Wired: goldilocks (2 planes, u32-pair canonical arithmetic), babybear
(1 plane, u32 Montgomery) and frog (2 planes, u64 Montgomery with an
in-kernel 64-bit REDC multiply) — every 64-bit base field; for all
Montgomery fields the in-kernel ops ARE the field's ops on its storage
form, so tables and challenges are used as-is.  The 8-limb stark_prime
keeps the XLA prover (a 64-u32-op CIOS per product in a VPU streaming
kernel would be slower than the emulated XLA path it replaces).

Binding order: MSB-first ("msb" in mle/sumcheck.py terms) — the top
variable's cosets are contiguous row halves, so every round is pure
sublane slicing (the mle/pallas_fix.py layout rule).  msb-order proving
on T equals lsb-order proving on bit_reverse_table(T) message-for-
message, so the reference's x_0-first convention
(/root/reference/crates/poly/src/mle/dense.rs:171-199) is one free
transpose away; both identities are tested in test_sumcheck_lib.

Message accumulation: per evaluation point t in 0..k, chunk products
accumulate into a VMEM accumulator with storage-form modular adds, then
a sublane halving tree reduces to one [1, 128] row per (round, t); the
final 128-lane modular sum happens at XLA level on the tiny output.

Measured (goldilocks, nv=20, 2-ary, real v5e): 2,204-3,046 proofs/s
day band vs 14.75/s for the XLA prover — 149-206x (PROTO_r05).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import get_field
from ..ops.pallas_goldilocks import _add_q, _mul_q, _sub_q
from .sumcheck import sumcheck_prove_many_with_challenges

__all__ = ["sumcheck_prove_goldilocks_pallas",
           "sumcheck_prove_many_goldilocks_pallas",
           "sumcheck_prove_batch_goldilocks_pallas",
           "sumcheck_prove_many_pallas", "SUMCHECK_FIELDS"]

_ANY = pl.BlockSpec(memory_space=pltpu.ANY)
_WHOLE = pl.BlockSpec(memory_space=pltpu.VMEM)
_LANES = 128
#: rows left to the XLA tail  (8 rows x 128 lanes = 2^10 entries)
_TAIL_ROWS = 8
#: VMEM scratch budget for the per-table half-size tables (bytes); the
#: rest of the ~16 MB Mosaic budget goes to stream buffers, accumulators
#: and chunk temporaries
_SCRATCH_BUDGET = 9 << 20


class _GlOps:
    """Canonical u64 as (lo, hi) u32 planes (ops/pallas_goldilocks)."""

    NP = 2

    @staticmethod
    def add(x, y):
        return _add_q(x[0], x[1], y[0], y[1])

    @staticmethod
    def sub(x, y):
        return _sub_q(x[0], x[1], y[0], y[1])

    @staticmethod
    def mul(x, y):
        return _mul_q(x[0], x[1], y[0], y[1])


class _BbOps:
    """BabyBear u32 Montgomery storage: one plane; the in-kernel ops ARE
    the field's add/sub/mul on that storage (ops/pallas_fold_bb)."""

    NP = 1
    _Q = np.uint32(15 * 2**27 + 1)

    @classmethod
    def add(cls, x, y):
        s = x[0] + y[0]                  # q < 2^31: no u32 wrap
        return (jnp.where(s >= cls._Q, s - cls._Q, s),)

    @classmethod
    def sub(cls, x, y):
        d = x[0] - y[0]
        return (jnp.where(x[0] < y[0], d + cls._Q, d),)

    @staticmethod
    def mul(x, y):
        from ..ops.pallas_fold_bb import _bb_mont_mul

        return (_bb_mont_mul(x[0], y[0]),)


class _FrogOps:
    """Frog u64 Montgomery storage (R = 2^64) as (lo, hi) u32 planes:
    generic mod-q pair add/sub plus a 64-bit Montgomery REDC multiply —
    the field's storage ops, so tables/challenges are used as-is."""

    NP = 2
    _Qi = 15912092521325583641
    _QLO = np.uint32(_Qi & 0xFFFFFFFF)
    _QHI = np.uint32(_Qi >> 32)
    _QPi = (-pow(_Qi, -1, 1 << 64)) % (1 << 64)     # q' : q q' = -1 mod R
    _QPLO = np.uint32(_QPi & 0xFFFFFFFF)
    _QPHI = np.uint32(_QPi >> 32)

    @classmethod
    def _cond_sub_q(cls, lo, hi, force):
        """value - q where force OR value >= q (value < 2q)."""
        from ..ops.pallas_goldilocks import _pair_sub

        ge = (hi > cls._QHI) | ((hi == cls._QHI) & (lo >= cls._QLO))
        red = force | ge
        slo, shi, _ = _pair_sub(lo, hi, cls._QLO, cls._QHI)
        return (jnp.where(red, slo, lo), jnp.where(red, shi, hi))

    @classmethod
    def add(cls, x, y):
        from ..ops.pallas_goldilocks import _pair_add

        lo, hi, carry = _pair_add(x[0], x[1], y[0], y[1])
        return cls._cond_sub_q(lo, hi, carry != 0)

    @classmethod
    def sub(cls, x, y):
        from ..ops.pallas_goldilocks import _pair_add, _pair_sub

        lo, hi, borrow = _pair_sub(x[0], x[1], y[0], y[1])
        alo, ahi, _ = _pair_add(lo, hi, cls._QLO, cls._QHI)
        neg = borrow != 0
        return (jnp.where(neg, alo, lo), jnp.where(neg, ahi, hi))

    @staticmethod
    def _low64_mul(alo, ahi, blo, bhi):
        """(a * b) mod 2^64 on u32 pairs."""
        from ..ops.pallas_goldilocks import _mul32

        ll_lo, ll_hi = _mul32(alo, blo)
        m1_lo, _ = _mul32(alo, bhi)
        m2_lo, _ = _mul32(ahi, blo)
        return ll_lo, ll_hi + m1_lo + m2_lo

    @classmethod
    def mul(cls, x, y):
        """REDC(a * b): Montgomery product on storage values < q."""
        from ..ops.pallas_goldilocks import _mul64_128, _pair_add

        lo0, lo1, hi0, hi1 = _mul64_128(x[0], x[1], y[0], y[1])
        mlo, mhi = cls._low64_mul(lo0, lo1, cls._QPLO, cls._QPHI)
        _, _, mq2, mq3 = _mul64_128(mlo, mhi, cls._QLO, cls._QHI)
        # u = hi64(t) + hi64(m*q) + carry(lo64(t) + lo64(m*q)); the low
        # halves sum to 0 mod 2^64 by construction, so the carry is
        # exactly (lo64(t) != 0)
        ulo, uhi, c1 = _pair_add(hi0, hi1, mq2, mq3)
        nz = ((lo0 | lo1) != np.uint32(0)).astype(jnp.uint32)
        ulo2 = ulo + nz
        c2 = (ulo2 < ulo).astype(jnp.uint32)
        uhi2 = uhi + c2
        c3 = (uhi2 < uhi).astype(jnp.uint32)
        # u < 2q (< 2^65): one conditional subtract canonicalizes
        return cls._cond_sub_q(ulo2, uhi2, (c1 | c3) != 0)


#: field name -> plane-tuple kernel ops on the field's storage form
SUMCHECK_FIELDS = {"goldilocks": _GlOps, "babybear": _BbOps,
                   "frog": _FrogOps}


def _tree_sum(ops, v):
    """[m, 128] storage planes -> [1, 128] modular sublane sum."""
    m = v[0].shape[0]
    assert m & (m - 1) == 0
    while m > 1:
        m //= 2
        v = ops.add(tuple(p[:m] for p in v), tuple(p[m:2 * m] for p in v))
    return v


def _prod(ops, vals):
    """Elementwise modular product over a list of plane tuples."""
    acc = vals[0]
    for v in vals[1:]:
        acc = ops.mul(acc, v)
    return acc


def _fold1(ops, t0, d, r):
    """t0 + r*d, r broadcast to the slice shape."""
    rb = tuple(jnp.broadcast_to(p, d[0].shape) for p in r)
    return ops.add(t0, ops.mul(d, rb))


def _make_kernel(nv: int, k: int, chunk: int, ops):
    rows = (1 << nv) // _LANES
    h0 = rows // 2
    nk = nv - 10                   # rounds bound inside the kernel
    NP = ops.NP

    def kern(*refs):
        ins = refs[:NP * k]                      # per-table plane HBM refs
        pls = refs[NP * k:NP * k + NP]           # [nk, 128] challenges
        msgs = refs[NP * k + NP:NP * k + 2 * NP]
        fins = refs[NP * k + 2 * NP:2 * NP * k + 2 * NP]
        rest = refs[2 * NP * k + 2 * NP:]
        vin = rest[:NP]                          # [2k, chunk, 128] each
        scr = rest[NP:2 * NP]                    # [k, h0, 128] each
        acc = rest[2 * NP:3 * NP]                # [k+1, chunk, 128] each
        sem = rest[3 * NP]

        def in_planes(j):
            return tuple(ins[NP * j + p] for p in range(NP))

        def vin_val(slot):
            return tuple(vin[p][jnp.int32(slot)] for p in range(NP))

        def scr_val(j, sl):
            return tuple(scr[p][j, sl] for p in range(NP))

        def scr_set(j, sl, v):
            for p in range(NP):
                scr[p][j, sl] = v[p]

        def chal(i):
            return tuple(pl_[i:i + 1] for pl_ in pls)

        def acc_zero(ch):
            z = jnp.zeros((ch, _LANES), jnp.uint32)
            for t in range(k + 1):
                for p in range(NP):
                    acc[p][t, :ch] = z

        def acc_add(t, v):
            ch = v[0].shape[0]
            s = ops.add(tuple(acc[p][t, :ch] for p in range(NP)), v)
            for p in range(NP):
                acc[p][t, :ch] = s[p]

        def write_msg(row, v):
            for p in range(NP):
                msgs[p][row:row + 1] = v[p]

        def messages(t0s, ds, i, multi):
            """Evaluate p(t) for t = 0..k on one chunk's halves."""
            cur = t0s
            for t in range(k + 1):
                if t:
                    cur = [ops.add(cur[j], ds[j]) for j in range(k)]
                pr = _prod(ops, cur)
                if multi:
                    acc_add(t, pr)
                else:
                    write_msg(i * (k + 1) + t, _tree_sum(ops, pr))

        def flush_acc(i, ch):
            for t in range(k + 1):
                v = tuple(acc[p][t, :ch] for p in range(NP))
                write_msg(i * (k + 1) + t, _tree_sum(ops, v))

        # ---- round 0: stream from HBM, fold into scratch --------------
        r0 = chal(0)
        acc_zero(chunk)
        for c0 in range(0, h0, chunk):
            cps = []
            for j in range(k):
                planes = in_planes(j)
                for half, ofs in ((0, 0), (1, h0)):
                    for p in range(NP):
                        sid = (2 * j + half) * NP + p
                        cps.append(pltpu.make_async_copy(
                            planes[p].at[pl.ds(jnp.int32(ofs + c0), chunk)],
                            vin[p].at[jnp.int32(2 * j + half)],
                            sem.at[jnp.int32(sid)]))
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            t0s = [vin_val(2 * j) for j in range(k)]
            t1s = [vin_val(2 * j + 1) for j in range(k)]
            ds = [ops.sub(t1s[j], t0s[j]) for j in range(k)]
            messages(t0s, ds, 0, True)
            for j in range(k):
                scr_set(j, slice(c0, c0 + chunk),
                        _fold1(ops, t0s[j], ds[j], r0))
        flush_acc(0, chunk)

        # ---- rounds 1..nk-1: in place in scratch ----------------------
        S = h0
        for i in range(1, nk):
            h = S // 2
            ch = min(h, chunk)
            multi = h > ch
            ri = chal(i)
            if multi:
                acc_zero(ch)
            for c0 in range(0, h, ch):
                t0s = [scr_val(j, slice(c0, c0 + ch)) for j in range(k)]
                t1s = [scr_val(j, slice(h + c0, h + c0 + ch))
                       for j in range(k)]
                ds = [ops.sub(t1s[j], t0s[j]) for j in range(k)]
                messages(t0s, ds, i, multi)
                for j in range(k):
                    scr_set(j, slice(c0, c0 + ch),
                            _fold1(ops, t0s[j], ds[j], ri))
            if multi:
                flush_acc(i, ch)
            S = h

        # ---- remaining 2^10-entry tables out --------------------------
        assert S == _TAIL_ROWS
        for j in range(k):
            for p in range(NP):
                fins[NP * j + p][:] = scr[p][j, :_TAIL_ROWS]

    return kern


def _to_planes(x, rows, NP):
    # one storage<->u32-plane codec for all plane-parametric kernels
    from ..parallel.pallas_exchange import _planes_of

    return list(_planes_of(x.reshape(rows, _LANES), NP))


def _from_planes(planes):
    from ..parallel.pallas_exchange import _from_planes as _join

    return _join(list(planes))


def sumcheck_prove_many_pallas(tables, challenges, chunk: int = 256,
                               interpret: bool = False,
                               field: str = "goldilocks"):
    """k-ary product sumcheck prover, msb binding order, one kernel +
    an XLA tail.  ``tables``: k storage [2^nv] arrays; ``challenges``:
    nv storage scalars.  Returns (msgs [nv, k+1], finals [k]) — exactly
    ``sumcheck_prove_many_with_challenges(f, tables, challenges,
    order="msb")`` on the field's storage (tested), at one HBM read of
    the tables instead of ~2 reads + 2 writes per round."""
    f = get_field(field)
    ops = SUMCHECK_FIELDS[field]
    NP = ops.NP
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
    assert k * h0 * _LANES * 4 * NP <= _SCRATCH_BUDGET, (
        f"k={k} tables at nv={nv} exceed the VMEM scratch budget")
    chunk = min(chunk, h0)
    while h0 % chunk:
        chunk //= 2

    planes = []
    for T in tables:
        planes += _to_planes(jnp.asarray(T), rows, NP)
    pts = jnp.stack([jnp.asarray(challenges[i], dtype=f.dtype)
                     for i in range(nk)])
    p_planes = _to_planes(jnp.broadcast_to(pts[:, None],
                                           (nk, _LANES)), nk, NP)

    out_shape = (tuple(jax.ShapeDtypeStruct((nk * (k + 1), _LANES),
                                            jnp.uint32)
                       for _ in range(NP))
                 + tuple(jax.ShapeDtypeStruct((_TAIL_ROWS, _LANES),
                                              jnp.uint32)
                         for _ in range(NP * k)))
    pcall = pl.pallas_call(
        _make_kernel(nv, k, chunk, ops),
        in_specs=[_ANY] * (NP * k) + [_WHOLE] * NP,
        out_specs=(_WHOLE,) * (NP + NP * k),
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((2 * k, chunk, _LANES), jnp.uint32)] * NP    # vin
            + [pltpu.VMEM((k, h0, _LANES), jnp.uint32)] * NP         # scr
            + [pltpu.VMEM((k + 1, chunk, _LANES), jnp.uint32)] * NP  # acc
            + [pltpu.SemaphoreType.DMA((2 * NP * k,))]),
        interpret=interpret,
    )
    outs = pcall(*planes, *p_planes)
    part = _from_planes(list(outs[:NP]))          # [nk*(k+1), 128]
    head = f.sum(part, axis=1).reshape(nk, k + 1)
    tails = [_from_planes([outs[NP + NP * j + p] for p in range(NP)]
                          ).reshape(-1) for j in range(k)]
    msgs_tail, finals = sumcheck_prove_many_with_challenges(
        f, tails, list(challenges[nk:]), order="msb")
    return jnp.concatenate([head, msgs_tail], axis=0), finals


def sumcheck_prove_many_goldilocks_pallas(tables, challenges,
                                          chunk: int = 256,
                                          interpret: bool = False):
    return sumcheck_prove_many_pallas(tables, challenges, chunk=chunk,
                                      interpret=interpret,
                                      field="goldilocks")


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
    module.  NOTE (e55/PROTO_r05): the single-proof in-module chain
    already amortizes dispatch; batching measured SLOWER (1.3-1.5k vs
    2.2-3.0k proofs/s) and its W*depth-kernel modules are the slowest
    remote compiles in the repo — prefer chaining single proofs."""
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
