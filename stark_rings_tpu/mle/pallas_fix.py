"""Pallas full-table MLE evaluation for the Goldilocks base field.

DenseMLE.evaluate lowers to nv sequential halving lerps at XLA level;
for a 20-var table that is 20 dependent elementwise u64 passes whose
later levels are tiny — measured ~5 ms per evaluation (191/s), ~100x
over the arithmetic/HBM floor.  Here the table stays in HBM, ONE kernel
streams the first (largest) level through VMEM into a half-size
scratch, then runs every remaining level in place in that scratch down
to 128 entries; the last 7 lane-axis levels finish at XLA level (127
scalar lerps, free).

Binding order: binds the LAST variable first (top/bottom halves — pure
sublane slicing, no lane shuffles).  For a FULL evaluation the binding
order is irrelevant (each variable gets its own coordinate), so this
equals DenseMLE.evaluate(points) exactly (dense.rs:107-113).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import GOLDILOCKS
from ..ops.pallas_goldilocks import _add_q, _mul_q, _sub_q

__all__ = ["evaluate_goldilocks_pallas", "fix_last_goldilocks_pallas"]

_ANY = pl.BlockSpec(memory_space=pltpu.ANY)
_WHOLE = pl.BlockSpec(memory_space=pltpu.VMEM)
_LANES = 128


def _lerp(llo, lhi, ulo, uhi, rlo, rhi):
    """l + r*(u - l) on u32 pairs, r broadcast to the slice shape."""
    dlo, dhi = _sub_q(ulo, uhi, llo, lhi)
    tlo, thi = _mul_q(dlo, dhi,
                      jnp.broadcast_to(rlo, dlo.shape),
                      jnp.broadcast_to(rhi, dhi.shape))
    return _add_q(llo, lhi, tlo, thi)


def _make_eval_kernel(nv: int, chunk: int):
    rows = (1 << nv) // _LANES
    h0 = rows // 2

    def kern(elo_h, ehi_h, plo, phi, olo, ohi, vin, slo, shi, sem):
        # level 0 (binds var nv-1): stream both halves from HBM, lerp,
        # write into the half-size scratch
        r0lo = plo[0:1]
        r0hi = phi[0:1]
        for c0 in range(0, h0, chunk):
            cps = [pltpu.make_async_copy(
                src.at[pl.ds(jnp.int32(ofs + c0), chunk)],
                vin.at[jnp.int32(j)], sem.at[jnp.int32(j)])
                for j, (src, ofs) in enumerate(
                    ((elo_h, 0), (ehi_h, 0), (elo_h, h0), (ehi_h, h0)))]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            lo, hi = _lerp(vin[jnp.int32(0)], vin[jnp.int32(1)],
                           vin[jnp.int32(2)], vin[jnp.int32(3)],
                           r0lo, r0hi)
            slo[c0:c0 + chunk] = lo
            shi[c0:c0 + chunk] = hi
        # levels 1 .. nv-8 in place in scratch, row-chunked so per-level
        # temporaries stay bounded (whole-level temps blew the 16M VMEM
        # stack at nv=20)
        h = h0
        for idx in range(1, nv - 7):
            h //= 2
            ch = min(h, chunk)
            for c0 in range(0, h, ch):
                lo, hi = _lerp(slo[c0:c0 + ch], shi[c0:c0 + ch],
                               slo[h + c0:h + c0 + ch],
                               shi[h + c0:h + c0 + ch],
                               plo[idx:idx + 1], phi[idx:idx + 1])
                slo[c0:c0 + ch] = lo
                shi[c0:c0 + ch] = hi
        olo[:] = slo[:1]
        ohi[:] = shi[:1]

    return kern


def _make_fix_kernel(nv: int, k: int, chunk: int):
    """Bind the last k variables, emit the fixed 2^(nv-k) table."""
    rows = (1 << nv) // _LANES
    h0 = rows // 2
    out_rows = rows >> k

    def kern(elo_h, ehi_h, plo, phi, olo_h, ohi_h, vin, slo, shi, sem):
        r0lo = plo[0:1]
        r0hi = phi[0:1]
        for c0 in range(0, h0, chunk):
            cps = [pltpu.make_async_copy(
                src.at[pl.ds(jnp.int32(ofs + c0), chunk)],
                vin.at[jnp.int32(j)], sem.at[jnp.int32(j)])
                for j, (src, ofs) in enumerate(
                    ((elo_h, 0), (ehi_h, 0), (elo_h, h0), (ehi_h, h0)))]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            lo, hi = _lerp(vin[jnp.int32(0)], vin[jnp.int32(1)],
                           vin[jnp.int32(2)], vin[jnp.int32(3)],
                           r0lo, r0hi)
            slo[c0:c0 + chunk] = lo
            shi[c0:c0 + chunk] = hi
        h = h0
        for idx in range(1, k):
            h //= 2
            ch = min(h, chunk)
            for c0 in range(0, h, ch):
                lo, hi = _lerp(slo[c0:c0 + ch], shi[c0:c0 + ch],
                               slo[h + c0:h + c0 + ch],
                               shi[h + c0:h + c0 + ch],
                               plo[idx:idx + 1], phi[idx:idx + 1])
                slo[c0:c0 + ch] = lo
                shi[c0:c0 + ch] = hi
        cps = (pltpu.make_async_copy(
            slo.at[pl.ds(jnp.int32(0), out_rows)], olo_h,
            sem.at[jnp.int32(0)]),
            pltpu.make_async_copy(
                shi.at[pl.ds(jnp.int32(0), out_rows)], ohi_h,
                sem.at[jnp.int32(1)]))
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    return kern


def fix_last_goldilocks_pallas(evals, points, chunk: int = 512,
                               interpret: bool = False):
    """fix_last_variables (dense.py) in one kernel: binds the LAST
    len(points) variables (var nv-1 gets points[-1] first, matching
    DenseMLE.fix_last_variables) and returns the u64 [2^(nv-k)] table.

    Requires 1 <= k <= nv-7 and nv >= 9 (output keeps >= one VMEM row).
    """
    nv = (evals.shape[-1]).bit_length() - 1
    k = len(points)
    assert evals.shape[-1] == 1 << nv and nv >= 9 and 1 <= k <= nv - 7
    rows = (1 << nv) // _LANES
    h0 = rows // 2
    out_rows = rows >> k
    chunk = min(chunk, h0)
    while h0 % chunk:
        chunk //= 2
    ev32 = jax.lax.bitcast_convert_type(
        evals.reshape(rows, _LANES), jnp.uint32)
    # fix_last binds var nv-1 with points[-1] first, then nv-2 ...
    pts = jnp.stack([jnp.asarray(points[k - 1 - i], dtype=jnp.uint64)
                     for i in range(k)])
    p32 = jax.lax.bitcast_convert_type(
        jnp.broadcast_to(pts[:, None], (k, _LANES)), jnp.uint32)
    pcall = pl.pallas_call(
        _make_fix_kernel(nv, k, chunk),
        in_specs=[_ANY, _ANY, _WHOLE, _WHOLE],
        out_specs=(_ANY, _ANY),
        out_shape=(jax.ShapeDtypeStruct((out_rows, _LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((out_rows, _LANES), jnp.uint32)),
        scratch_shapes=[
            pltpu.VMEM((4, chunk, _LANES), jnp.uint32),
            pltpu.VMEM((h0, _LANES), jnp.uint32),
            pltpu.VMEM((h0, _LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )
    lo, hi = pcall(ev32[..., 0], ev32[..., 1], p32[..., 0], p32[..., 1])
    return jax.lax.bitcast_convert_type(
        jnp.stack([lo, hi], axis=-1), jnp.uint64).reshape(-1)


def evaluate_goldilocks_pallas(evals, points, chunk: int = 512,
                               interpret: bool = False):
    """Full multilinear evaluation: u64 [2^nv] x nv points -> u64 scalar.

    Canonical Goldilocks storage only (the field whose u32-pair modmul
    the kernel uses).  Requires nv >= 9 (the streamed first level needs
    at least one full chunk row block); callers fall back to
    DenseMLE.evaluate below that.
    """
    f = GOLDILOCKS
    nv = len(points)
    assert evals.shape[-1] == 1 << nv and nv >= 9
    rows = (1 << nv) // _LANES
    h0 = rows // 2
    chunk = min(chunk, h0)
    while h0 % chunk:
        chunk //= 2
    ev32 = jax.lax.bitcast_convert_type(
        evals.reshape(rows, _LANES), jnp.uint32)
    # kernel binds vars nv-1 .. 7 (descending), then XLA binds 6 .. 0
    pts = jnp.stack([jnp.asarray(points[j], dtype=jnp.uint64)
                     for j in range(nv - 1, 6, -1)])
    p32 = jax.lax.bitcast_convert_type(
        jnp.broadcast_to(pts[:, None], (nv - 7, _LANES)), jnp.uint32)
    pcall = pl.pallas_call(
        _make_eval_kernel(nv, chunk),
        in_specs=[_ANY, _ANY, _WHOLE, _WHOLE],
        out_specs=(_WHOLE, _WHOLE),
        out_shape=(jax.ShapeDtypeStruct((1, _LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((1, _LANES), jnp.uint32)),
        scratch_shapes=[
            pltpu.VMEM((4, chunk, _LANES), jnp.uint32),
            pltpu.VMEM((h0, _LANES), jnp.uint32),
            pltpu.VMEM((h0, _LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )
    lo, hi = pcall(ev32[..., 0], ev32[..., 1], p32[..., 0], p32[..., 1])
    x = jax.lax.bitcast_convert_type(
        jnp.stack([lo[0], hi[0]], axis=-1), jnp.uint64)
    for j in range(6, -1, -1):
        h = x.shape[0] // 2
        r = jnp.asarray(points[j], dtype=jnp.uint64)
        x = f.add(x[:h], f.mul(r, f.sub(x[h:], x[:h])))
    return x[0]
