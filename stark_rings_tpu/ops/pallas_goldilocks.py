"""Pallas u32-pair primitives for Goldilocks + the full-VMEM NTT kernel.

STATUS (round 2): the u32-pair modular primitives here (`_mul_q`,
`_reduce128`, `_add_q`, `_sub_q`, `_mul32`) are the building blocks of
the PRODUCTION fold/twiddle kernels (ops/pallas_fold.py — the bench
primary path), the BabyBear folds (ops/pallas_fold_bb.py) and the MLE
fix kernel (mle/pallas_fix.py).  The full `GoldilocksPallasNTT`
transform class below LOST to XLA's own u64 emulation end-to-end
(0.35x, PERF_NOTES "Findings") and is kept as tested substrate and a
second independent implementation for cross-checking — it is not on
any runtime path.

The original design notes (still true of the kernels themselves):

* keep field elements as two u32 planes (lo, hi) — native VPU words, no
  int64 emulation;
* run ALL log2(N) stages of a transform inside VMEM (one HBM read + one
  HBM write per transform), with the fused ring-multiply kernel doing
  fwd(a), fwd(b), pointwise, inv in a single kernel — zero intermediate
  HBM traffic;
* use the classic Goldilocks 128-bit reduction (2^64 = 2^32 - 1,
  2^96 = -1) in u32 pair arithmetic.

Twiddle layout matches the stage recursion of ops/ntt.py: one [N] table,
stage s (with m = 2^s blocks) reads entries [m, 2m) — bit-exact with the
jnp path (tests compare against NTTContext and the integer spec).
"""

from __future__ import annotations



import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ntt import NTTContext

__all__ = ["GoldilocksPallasNTT"]

_Q = 2**64 - 2**32 + 1
_Q_LO = np.uint32(1)
_Q_HI = np.uint32(0xFFFFFFFF)
_EPS = np.uint32(0xFFFFFFFF)  # 2^64 mod q = 2^32 - 1


# ---------------------------------------------------------------------------
# u32 pair arithmetic (values are (lo, hi) pairs of uint32 arrays)
# ---------------------------------------------------------------------------


def _u32(x):
    return jnp.uint32(x)


def _mul32(a, b):
    """32x32 -> 64 as (lo, hi) via 16-bit splits (VPU-native muls)."""
    m16 = _u32(0xFFFF)
    a0 = a & m16
    a1 = a >> 16
    b0 = b & m16
    b1 = b >> 16
    ll = a0 * b0
    m1 = a0 * b1
    m2 = a1 * b0
    hh = a1 * b1
    mid = m1 + m2
    carry_m = (mid < m1).astype(jnp.uint32)
    lo = ll + (mid << 16)
    carry_lo = (lo < ll).astype(jnp.uint32)
    hi = hh + (mid >> 16) + (carry_m << 16) + carry_lo
    return lo, hi


def _pair_add(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out."""
    lo = alo + blo
    c0 = (lo < alo).astype(jnp.uint32)
    hi = ahi + bhi
    c1 = (hi < ahi).astype(jnp.uint32)
    hi2 = hi + c0
    c2 = (hi2 < hi).astype(jnp.uint32)
    return lo, hi2, c1 | c2


def _pair_sub(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out."""
    lo = alo - blo
    b0 = (alo < blo).astype(jnp.uint32)
    hi = ahi - bhi
    b1 = (ahi < bhi).astype(jnp.uint32)
    hi2 = hi - b0
    b2 = (hi < b0).astype(jnp.uint32)
    return lo, hi2, b1 | b2


def _add_q(alo, ahi, blo, bhi):
    """(a + b) mod q, canonical inputs/outputs."""
    lo, hi, carry = _pair_add(alo, ahi, blo, bhi)
    ge = (hi > _Q_HI) | ((hi == _Q_HI) & (lo >= _Q_LO))
    red = (carry != 0) | ge
    slo, shi, _ = _pair_sub(lo, hi, _Q_LO, _Q_HI)
    return jnp.where(red, slo, lo), jnp.where(red, shi, hi)


def _sub_q(alo, ahi, blo, bhi):
    lo, hi, borrow = _pair_sub(alo, ahi, blo, bhi)
    alo2, ahi2, _ = _pair_add(lo, hi, _Q_LO, _Q_HI)
    neg = borrow != 0
    return jnp.where(neg, alo2, lo), jnp.where(neg, ahi2, hi)


def _reduce128(lo0, lo1, hi0, hi1):
    """(hi1*2^96 + hi0*2^64 + lo1*2^32 + lo0) mod q — Goldilocks fold."""
    # t = lo - hi1 (64-bit), wrap => subtract 2^32-1 once more
    tlo, thi, br = _pair_sub(lo0, lo1, hi1, _u32(0))
    t2lo, t2hi, _ = _pair_sub(tlo, thi, _EPS, _u32(0))
    tlo = jnp.where(br != 0, t2lo, tlo)
    thi = jnp.where(br != 0, t2hi, thi)
    # t1 = hi0 * (2^32 - 1) = (hi0 << 32) - hi0
    nz = (hi0 != 0).astype(jnp.uint32)
    t1lo = _u32(0) - hi0
    t1hi = hi0 - nz
    # t2 = t + t1, wrap => add 2^32-1
    slo, shi, carry = _pair_add(tlo, thi, t1lo, t1hi)
    s2lo, s2hi, _ = _pair_add(slo, shi, _EPS, _u32(0))
    slo = jnp.where(carry != 0, s2lo, slo)
    shi = jnp.where(carry != 0, s2hi, shi)
    # canonicalize
    ge = (shi > _Q_HI) | ((shi == _Q_HI) & (slo >= _Q_LO))
    clo, chi, _ = _pair_sub(slo, shi, _Q_LO, _Q_HI)
    return jnp.where(ge, clo, slo), jnp.where(ge, chi, shi)


def _mul64_128(alo, ahi, blo, bhi):
    """Full 64x64 -> 128 product of u32 pairs, as four u32 words
    (lo0, lo1, hi0, hi1) = bits [0:32), [32:64), [64:96), [96:128)."""
    ll_lo, ll_hi = _mul32(alo, blo)
    lh_lo, lh_hi = _mul32(alo, bhi)
    hl_lo, hl_hi = _mul32(ahi, blo)
    hh_lo, hh_hi = _mul32(ahi, bhi)
    # 128-bit accumulate
    s1 = ll_hi + lh_lo
    c1 = (s1 < ll_hi).astype(jnp.uint32)
    s2 = s1 + hl_lo
    c2 = (s2 < s1).astype(jnp.uint32)
    lo1 = s2
    carry_mid = c1 + c2
    t1 = lh_hi + hl_hi
    d1 = (t1 < lh_hi).astype(jnp.uint32)
    t2 = t1 + hh_lo
    d2 = (t2 < t1).astype(jnp.uint32)
    t3 = t2 + carry_mid
    d3 = (t3 < t2).astype(jnp.uint32)
    hi0 = t3
    hi1 = hh_hi + d1 + d2 + d3
    return ll_lo, lo1, hi0, hi1


def _mul_q(alo, ahi, blo, bhi):
    """(a * b) mod q on canonical pairs."""
    lo0, lo1, hi0, hi1 = _mul64_128(alo, ahi, blo, bhi)
    return _reduce128(lo0, lo1, hi0, hi1)


# ---------------------------------------------------------------------------
# in-kernel NTT stage loops
# ---------------------------------------------------------------------------


# The lane (last) dimension on TPU is 128 wide; Mosaic cannot reshape
# across it.  Stages with butterfly distance t >= _LANE run in the direct
# [rows, N] layout; the last 7 stages (t < _LANE) run in a transposed
# [rows, _LANE, C] layout (C = N/_LANE) where the splits touch only
# sublane axes.  Their twiddles come from per-stage [m_local, C] tables
# (host-precomputed: entry [i_local, c] = table[m + c*m_local + i_local]).
_LANE = 128


def _n_small(N, logN):
    return min(logN, _LANE.bit_length() - 1)  # 7 for N >= 128


def _butterfly_fwd(alo, ahi, blo, bhi, swlo, swhi):
    plo, phi = _mul_q(blo, bhi, jnp.broadcast_to(swlo, blo.shape),
                      jnp.broadcast_to(swhi, bhi.shape))
    y0lo, y0hi = _add_q(alo, ahi, plo, phi)
    y1lo, y1hi = _sub_q(alo, ahi, plo, phi)
    return y0lo, y0hi, y1lo, y1hi


def _butterfly_inv(alo, ahi, blo, bhi, swlo, swhi):
    y0lo, y0hi = _add_q(alo, ahi, blo, bhi)
    dlo, dhi = _sub_q(alo, ahi, blo, bhi)
    y1lo, y1hi = _mul_q(dlo, dhi, jnp.broadcast_to(swlo, dlo.shape),
                        jnp.broadcast_to(swhi, dhi.shape))
    return y0lo, y0hi, y1lo, y1hi


def _big_stage(xlo, xhi, wlo, whi, N, s, bf):
    rows = xlo.shape[0]
    m = 1 << s
    t = N >> (s + 1)
    vlo = xlo.reshape(rows, m, 2, t)
    vhi = xhi.reshape(rows, m, 2, t)
    swlo = jax.lax.slice_in_dim(wlo, m, 2 * m)[None, :, None]
    swhi = jax.lax.slice_in_dim(whi, m, 2 * m)[None, :, None]
    y0lo, y0hi, y1lo, y1hi = bf(vlo[:, :, 0], vhi[:, :, 0],
                                vlo[:, :, 1], vhi[:, :, 1], swlo, swhi)
    xlo = jnp.stack([y0lo, y1lo], axis=2).reshape(rows, N)
    xhi = jnp.stack([y0hi, y1hi], axis=2).reshape(rows, N)
    return xlo, xhi


# stages with butterfly distance below this use the roll path (degenerate
# tiny reshapes crash the Mosaic compiler)
_ROLL_T = 4


def _small_stage(tlo, thi, ws_lo, ws_hi, N, s, logN, bf):
    """One stage in transposed layout [rows, LANE, C]."""
    rows, _, C = tlo.shape
    t = N >> (s + 1)
    m_local = _LANE // (2 * t)
    vlo = tlo.reshape(rows, m_local, 2, t, C)
    vhi = thi.reshape(rows, m_local, 2, t, C)
    swlo = ws_lo[:m_local][None, :, None, :]
    swhi = ws_hi[:m_local][None, :, None, :]
    y0lo, y0hi, y1lo, y1hi = bf(vlo[:, :, 0], vhi[:, :, 0],
                                vlo[:, :, 1], vhi[:, :, 1], swlo, swhi)
    tlo = jnp.stack([y0lo, y1lo], axis=2).reshape(rows, _LANE, C)
    thi = jnp.stack([y0hi, y1hi], axis=2).reshape(rows, _LANE, C)
    return tlo, thi


def _roll_stage_fwd(tlo, thi, we_lo, we_hi, N, s):
    """t < _ROLL_T forward stage via sublane rolls + masked select.

    Partner of sublane p is p ^ t (pairs within aligned 2t blocks):
      first half:  y = x + w * partner
      second half: y = partner - w * x
    we_*: per-element twiddle [LANE, C] (constant within each block).
    """
    t = N >> (s + 1)
    rows, L, C = tlo.shape
    sub = jax.lax.broadcasted_iota(jnp.uint32, (1, L, 1), 1)
    first = (sub & jnp.uint32(t)) == 0
    pl_lo = jnp.concatenate([tlo[:, t:, :], tlo[:, :t, :]], axis=1)
    pl_hi = jnp.concatenate([thi[:, t:, :], thi[:, :t, :]], axis=1)
    pr_lo = jnp.concatenate([tlo[:, L - t:, :], tlo[:, :L - t, :]], axis=1)
    pr_hi = jnp.concatenate([thi[:, L - t:, :], thi[:, :L - t, :]], axis=1)
    part_lo = jnp.where(first, pl_lo, pr_lo)
    part_hi = jnp.where(first, pl_hi, pr_hi)
    op_lo = jnp.where(first, part_lo, tlo)
    op_hi = jnp.where(first, part_hi, thi)
    wb_lo, wb_hi = _mul_q(op_lo, op_hi,
                          jnp.broadcast_to(we_lo[None], op_lo.shape),
                          jnp.broadcast_to(we_hi[None], op_hi.shape))
    add_lo, add_hi = _add_q(tlo, thi, wb_lo, wb_hi)
    sub_lo, sub_hi = _sub_q(part_lo, part_hi, wb_lo, wb_hi)
    return (jnp.where(first, add_lo, sub_lo),
            jnp.where(first, add_hi, sub_hi))


def _roll_stage_inv(tlo, thi, we_lo, we_hi, N, s):
    """t < _ROLL_T inverse stage:
      first half:  y = x + partner
      second half: y = w^-1 * (partner - x)
    """
    t = N >> (s + 1)
    rows, L, C = tlo.shape
    sub = jax.lax.broadcasted_iota(jnp.uint32, (1, L, 1), 1)
    first = (sub & jnp.uint32(t)) == 0
    pl_lo = jnp.concatenate([tlo[:, t:, :], tlo[:, :t, :]], axis=1)
    pl_hi = jnp.concatenate([thi[:, t:, :], thi[:, :t, :]], axis=1)
    pr_lo = jnp.concatenate([tlo[:, L - t:, :], tlo[:, :L - t, :]], axis=1)
    pr_hi = jnp.concatenate([thi[:, L - t:, :], thi[:, :L - t, :]], axis=1)
    part_lo = jnp.where(first, pl_lo, pr_lo)
    part_hi = jnp.where(first, pl_hi, pr_hi)
    add_lo, add_hi = _add_q(tlo, thi, part_lo, part_hi)
    d_lo, d_hi = _sub_q(part_lo, part_hi, tlo, thi)
    m_lo, m_hi = _mul_q(d_lo, d_hi,
                        jnp.broadcast_to(we_lo[None], d_lo.shape),
                        jnp.broadcast_to(we_hi[None], d_hi.shape))
    return (jnp.where(first, add_lo, m_lo),
            jnp.where(first, add_hi, m_hi))


def _to_transposed(xlo, xhi, N):
    rows = xlo.shape[0]
    C = N // _LANE
    tlo = jnp.swapaxes(xlo.reshape(rows, C, _LANE), 1, 2)
    thi = jnp.swapaxes(xhi.reshape(rows, C, _LANE), 1, 2)
    return tlo, thi


def _from_transposed(tlo, thi, N):
    rows = tlo.shape[0]
    C = N // _LANE
    xlo = jnp.swapaxes(tlo, 1, 2).reshape(rows, N)
    xhi = jnp.swapaxes(thi, 1, 2).reshape(rows, N)
    return xlo, xhi


def _fwd_stages(xlo, xhi, wlo, whi, wsl, wsh, wrl, wrh, N, logN):
    """Full forward transform: big stages direct, small transposed,
    tiniest (t < _ROLL_T) via rolls.

    wsl/wsh: [n_small, 64, C] per-stage tables; wrl/wrh: [n_roll, LANE, C]
    expanded per-element tables for the roll stages."""
    ns = _n_small(N, logN)
    for s in range(logN - ns):
        xlo, xhi = _big_stage(xlo, xhi, wlo, whi, N, s, _butterfly_fwd)
    if ns == 0:
        return xlo, xhi
    tlo, thi = _to_transposed(xlo, xhi, N)
    r = 0
    for k, s in enumerate(range(logN - ns, logN)):
        t = N >> (s + 1)
        if t >= _ROLL_T:
            tlo, thi = _small_stage(tlo, thi, wsl[k], wsh[k], N, s, logN,
                                    _butterfly_fwd)
        else:
            tlo, thi = _roll_stage_fwd(tlo, thi, wrl[r], wrh[r], N, s)
            r += 1
    return _from_transposed(tlo, thi, N)


def _inv_stages(xlo, xhi, wlo, whi, wsl, wsh, wrl, wrh, N, logN,
                ninv_lo, ninv_hi):
    ns = _n_small(N, logN)
    if ns:
        tlo, thi = _to_transposed(xlo, xhi, N)
        n_roll = sum(1 for s in range(logN - ns, logN)
                     if (N >> (s + 1)) < _ROLL_T)
        r = n_roll - 1
        for k, s in zip(reversed(range(ns)),
                        reversed(range(logN - ns, logN))):
            t = N >> (s + 1)
            if t >= _ROLL_T:
                tlo, thi = _small_stage(tlo, thi, wsl[k], wsh[k], N, s,
                                        logN, _butterfly_inv)
            else:
                tlo, thi = _roll_stage_inv(tlo, thi, wrl[r], wrh[r], N, s)
                r -= 1
        xlo, xhi = _from_transposed(tlo, thi, N)
    for s in reversed(range(logN - ns)):
        xlo, xhi = _big_stage(xlo, xhi, wlo, whi, N, s, _butterfly_inv)
    nl = jnp.broadcast_to(ninv_lo, xlo.shape)
    nh = jnp.broadcast_to(ninv_hi, xhi.shape)
    return _mul_q(xlo, xhi, nl, nh)


# ---------------------------------------------------------------------------
# pallas wrappers
# ---------------------------------------------------------------------------


class GoldilocksPallasNTT:
    """Fused negacyclic NTT / ring-mul kernels, bit-exact with NTTContext."""

    def __init__(self, N: int, rows_per_block: int = 8,
                 interpret: bool = False):
        from ..fields import GOLDILOCKS

        self.N = N
        self.logN = N.bit_length() - 1
        self.rows = rows_per_block
        self.interpret = interpret
        self.ctx = NTTContext(GOLDILOCKS, N, negacyclic=True)
        fwd, inv, n_inv = self.ctx.tables()
        # stage tables -> one [N] array in the m+i layout
        wf = np.zeros(N, dtype=np.uint64)
        wi = np.zeros(N, dtype=np.uint64)
        for s, tab in enumerate(fwd):
            wf[(1 << s):(2 << s)] = np.asarray(tab)
        for s, tab in enumerate(inv):
            wi[(1 << s):(2 << s)] = np.asarray(tab)
        self.wf_lo = (wf & 0xFFFFFFFF).astype(np.uint32)
        self.wf_hi = (wf >> 32).astype(np.uint32)
        self.wi_lo = (wi & 0xFFFFFFFF).astype(np.uint32)
        self.wi_hi = (wi >> 32).astype(np.uint32)
        ninv = int(n_inv)
        self.ninv_lo = np.uint32(ninv & 0xFFFFFFFF)
        self.ninv_hi = np.uint32(ninv >> 32)
        # per-small-stage tables [ns, 64, C]: [k, i_local, c] =
        # table[m + c*m_local + i_local] for stage s = logN - ns + k
        ns = _n_small(N, self.logN)
        self.ns = ns
        C = max(N // _LANE, 1)
        self.C = C

        def small(tab64):
            out = np.zeros((max(ns, 1), 64, C), dtype=np.uint64)
            for k in range(ns):
                sg = self.logN - ns + k
                m = 1 << sg
                t = N >> (sg + 1)
                m_local = _LANE // (2 * t)
                sl = tab64[m:2 * m].reshape(C, m_local)
                out[k, :m_local, :] = sl.T
            return out

        sf = small(wf)
        si = small(wi)
        self.wsf_lo = (sf & 0xFFFFFFFF).astype(np.uint32)
        self.wsf_hi = (sf >> 32).astype(np.uint32)
        self.wsi_lo = (si & 0xFFFFFFFF).astype(np.uint32)
        self.wsi_hi = (si >> 32).astype(np.uint32)

        # roll stages (t < _ROLL_T): fully expanded [LANE, C] tables
        roll_stages = [sg for sg in range(self.logN - ns, self.logN)
                       if (N >> (sg + 1)) < _ROLL_T]
        self.n_roll = len(roll_stages)

        def expanded(tab64):
            out = np.zeros((max(self.n_roll, 1), _LANE, C), dtype=np.uint64)
            for r, sg in enumerate(roll_stages):
                m = 1 << sg
                t = N >> (sg + 1)
                m_local = _LANE // (2 * t)
                sl = tab64[m:2 * m].reshape(C, m_local)   # [c, i_local]
                out[r] = np.repeat(sl.T, 2 * t, axis=0)   # [LANE, C]
            return out

        rf = expanded(wf)
        ri = expanded(wi)
        self.wrf_lo = (rf & 0xFFFFFFFF).astype(np.uint32)
        self.wrf_hi = (rf >> 32).astype(np.uint32)
        self.wri_lo = (ri & 0xFFFFFFFF).astype(np.uint32)
        self.wri_hi = (ri >> 32).astype(np.uint32)

    # -- plane conversion (free bitcasts) -------------------------------
    @staticmethod
    def to_planes(x):
        v = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return v[..., 0], v[..., 1]

    @staticmethod
    def from_planes(lo, hi):
        v = jnp.stack([lo, hi], axis=-1)
        return jax.lax.bitcast_convert_type(v, jnp.uint64)

    @property
    def _fwd_tables(self):
        return (self.wf_lo, self.wf_hi, self.wsf_lo, self.wsf_hi,
                self.wrf_lo, self.wrf_hi)

    @property
    def _inv_tables(self):
        return (self.wi_lo, self.wi_hi, self.wsi_lo, self.wsi_hi,
                self.wri_lo, self.wri_hi)

    def _call(self, kernel, n_in, a_planes, w_args):
        # NOTE: gridded BlockSpecs around this kernel crash the Mosaic
        # compiler on current TPU toolchains; whole-array specs compile
        # fine, so batching is an unrolled chunk loop at the XLA level.
        # Only the tables a kernel actually uses are passed — unused VMEM
        # inputs still get allocated and blow the budget at large N.
        N, R = self.N, self.rows
        B = a_planes[0].shape[0]
        pad = (-B) % R
        if pad:
            a_planes = tuple(
                jnp.concatenate([p, jnp.zeros((pad, N), p.dtype)], axis=0)
                for p in a_planes)
        Bp = B + pad
        whole = pl.BlockSpec(memory_space=pltpu.VMEM)
        pcall = pl.pallas_call(
            kernel,
            in_specs=[whole] * (n_in + len(w_args)),
            out_specs=(whole, whole),
            out_shape=(jax.ShapeDtypeStruct((R, N), jnp.uint32),
                       jax.ShapeDtypeStruct((R, N), jnp.uint32)),
            interpret=self.interpret,
        )
        los, his = [], []
        for g in range(Bp // R):
            chunk = tuple(p[g * R:(g + 1) * R] for p in a_planes)
            lo, hi = pcall(*chunk, *w_args)
            los.append(lo)
            his.append(hi)
        lo = jnp.concatenate(los, axis=0) if len(los) > 1 else los[0]
        hi = jnp.concatenate(his, axis=0) if len(his) > 1 else his[0]
        if pad:
            lo, hi = lo[:B], hi[:B]
        return lo, hi

    # -- kernels ----------------------------------------------------------
    def _fwd_kernel(self, xlo_ref, xhi_ref, wfl, wfh,
                    sfl, sfh, rfl, rfh, olo_ref, ohi_ref):
        lo, hi = _fwd_stages(xlo_ref[:], xhi_ref[:], wfl[:], wfh[:],
                             sfl[:], sfh[:], rfl[:], rfh[:],
                             self.N, self.logN)
        olo_ref[:] = lo
        ohi_ref[:] = hi

    def _inv_kernel(self, xlo_ref, xhi_ref, wil, wih,
                    sil, sih, ril, rih, olo_ref, ohi_ref):
        lo, hi = _inv_stages(xlo_ref[:], xhi_ref[:], wil[:], wih[:],
                             sil[:], sih[:], ril[:], rih[:],
                             self.N, self.logN,
                             self.ninv_lo, self.ninv_hi)
        olo_ref[:] = lo
        ohi_ref[:] = hi

    def _mul_kernel(self, alo_ref, ahi_ref, blo_ref, bhi_ref,
                    wfl, wfh, wil, wih, sfl, sfh, sil, sih,
                    rfl, rfh, ril, rih, olo_ref, ohi_ref):
        falo, fahi = _fwd_stages(alo_ref[:], ahi_ref[:], wfl[:], wfh[:],
                                 sfl[:], sfh[:], rfl[:], rfh[:],
                                 self.N, self.logN)
        fblo, fbhi = _fwd_stages(blo_ref[:], bhi_ref[:], wfl[:], wfh[:],
                                 sfl[:], sfh[:], rfl[:], rfh[:],
                                 self.N, self.logN)
        plo, phi = _mul_q(falo, fahi, fblo, fbhi)
        lo, hi = _inv_stages(plo, phi, wil[:], wih[:], sil[:], sih[:],
                             ril[:], rih[:], self.N, self.logN,
                             self.ninv_lo, self.ninv_hi)
        olo_ref[:] = lo
        ohi_ref[:] = hi

    def _pointwise_kernel(self, alo_ref, ahi_ref, blo_ref, bhi_ref,
                          olo_ref, ohi_ref):
        lo, hi = _mul_q(alo_ref[:], ahi_ref[:], blo_ref[:], bhi_ref[:])
        olo_ref[:] = lo
        ohi_ref[:] = hi

    # -- public ops (u64 in / u64 out, batched [B, N]) --------------------
    def forward(self, x):
        lo, hi = self._call(self._fwd_kernel, 2, self.to_planes(x),
                            self._fwd_tables)
        return self.from_planes(lo, hi)

    def inverse(self, x):
        lo, hi = self._call(self._inv_kernel, 2, self.to_planes(x),
                            self._inv_tables)
        return self.from_planes(lo, hi)

    def mul(self, a, b):
        """Fused single-kernel ring multiply (VMEM-bound at large N)."""
        al, ah = self.to_planes(a)
        bl, bh = self.to_planes(b)
        lo, hi = self._call(self._mul_kernel, 4, (al, ah, bl, bh),
                            self._fwd_tables[:2] + self._inv_tables[:2]
                            + self._fwd_tables[2:4] + self._inv_tables[2:4]
                            + self._fwd_tables[4:6] + self._inv_tables[4:6])
        return self.from_planes(lo, hi)

    def pointwise(self, fa, fb):
        """Elementwise mulmod on u64 tensors."""
        al, ah = self.to_planes(fa)
        bl, bh = self.to_planes(fb)
        shape = al.shape
        out = pl.pallas_call(
            self._pointwise_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct(shape, jnp.uint32),
                       jax.ShapeDtypeStruct(shape, jnp.uint32)),
            interpret=self.interpret,
        )(al, ah, bl, bh)
        return self.from_planes(*out)

    def mul_composite(self, a, b):
        """fwd + fwd + pointwise + inv as separate kernels — fits VMEM at
        any N (each kernel holds one operand)."""
        return self.inverse(self.pointwise(self.forward(a),
                                           self.forward(b)))
