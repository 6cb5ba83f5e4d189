"""Pallas remote-copy exchange for the sharded four-step NTT.

The four-step transform's transpose is ONE all_to_all; XLA schedules it
as a monolithic collective AFTER the whole twiddle pass.  This kernel
implements the SNIPPETS.md remote-DMA pattern instead: the mid-twiddle
modmul is fused INTO the send loop, so block (s) is twiddled on the VPU
while block (s-1) is already in flight on ICI — compute/communication
overlap at the kernel level, the thing XLA's collective scheduler cannot
express for this dataflow (the twiddle feeds the exchange elementwise).

Both directions, plane-count generic: a field plugs in as (number of
u32 storage planes, plane-tuple modmul).  Wired up:

  * goldilocks — 2 planes (u64 canonical as lo/hi u32), `_mul_q`;
  * babybear   — 1 plane (u32 Montgomery storage; `_bb_mont_mul` IS the
    field's `mul` on that storage, so the twiddle table is used as-is).

frog has no sharded power-of-two path at all (2-adicity of q-1 is 3),
and the 8-limb stark_prime keeps the XLA collective: its exchange is
already 8 u32 planes of traffic and its twiddle is a CIOS multiply that
the limbed four-step applies through the MXU digit path — fusing it
into a VPU send loop would re-implement the slowest formulation of its
most expensive op (PERF_NOTES "Multi-chip" records the assessment).

`ShardedNTT(..., exchange="pallas")` routes the forward, inverse and
(through them) the cached-operand paths through this kernel.  Validated
for bit-exactness against the XLA path on the CPU mesh via the
distributed interpret mode (`pltpu.InterpretParams`); the overlap
itself only materializes on real ICI.

Dataflow per device (P devices, R1 = N1/P, C = N2/P, batch B):

    in   x  [B*N1, C]   u32 plane(s)   (post column-NTT)
    in   tw [N1,  C]    u32 plane(s)   (omega^(k1_leaf * n2), local cols)
    out  y  [B*R1, N2]  u32 plane(s)   (post twiddle + transpose)

    for s in 0..P:  d = (my + s) % P               # destination device
      for b in 0..B:
        DMA x block (rows b*N1 + d*R1 .. +R1) HBM -> VMEM
        twiddle it (field modmul with tw rows d*R1 .. +R1)
        remote-copy VMEM -> device d's y at (rows b*R1.., cols my*C..)
    wait all sends + all P*B incoming blocks (per-step recv semaphores)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_goldilocks import _mul_q

__all__ = ["twiddle_exchange_fwd", "twiddle_exchange_inv",
           "EXCHANGE_FIELDS"]

_ANY = pl.BlockSpec(memory_space=pl.ANY)
_VMEM = pl.BlockSpec(memory_space=pltpu.VMEM)


def _i32(x):
    return jnp.int32(x) if isinstance(x, int) else x


def _mul_gl(a, b):
    return _mul_q(a[0], a[1], b[0], b[1])


def _mul_bb(a, b):
    from ..ops.pallas_fold_bb import _bb_mont_mul

    return (_bb_mont_mul(a[0], b[0]),)


#: field name -> (u32 planes per element, plane-tuple modmul on the
#: field's STORAGE form)
EXCHANGE_FIELDS = {
    "goldilocks": (2, _mul_gl),
    "babybear": (1, _mul_bb),
}


def _make_kernel(P, B, N1, C, axis, NP, mulfn, forward=True):
    """Twiddle-fused transpose-exchange kernel, either direction.

    forward: x [B*N1, C] -> out [B*R1, N2] (split rows, concat cols)
    inverse: y [B*R1, N2] -> out [B*N1, C] (split cols, concat rows)
    Block shape is [R1, C] both ways; only the slice maps differ."""
    R1 = N1 // P

    def kern(*refs):
        xs = refs[:NP]                       # input planes (HBM)
        tws = refs[NP:2 * NP]                # twiddle planes (VMEM)
        outs = refs[2 * NP:3 * NP]           # output planes (HBM)
        vin, vout, in_sem, send_sem, recv_sem = refs[3 * NP:]
        my = lax.axis_index(axis).astype(jnp.int32)

        # full barrier: every device must have entered (and thus have its
        # output buffer live) before anyone writes into it remotely
        bar = pltpu.get_barrier_semaphore()
        for d in range(P):
            pltpu.semaphore_signal(bar, 1, device_id=(_i32(d),),
                                   device_id_type=pltpu.DeviceIdType.MESH)
        pltpu.semaphore_wait(bar, P)

        def out_slices(b, for_src):
            """(rows, cols) of the block landing in the RECEIVER's output
            when the sender's mesh index is ``for_src``."""
            if forward:
                return (pl.ds(_i32(b * R1), R1),
                        pl.ds(for_src * jnp.int32(C), C))
            return (pl.ds(_i32(b) * jnp.int32(N1) + for_src * jnp.int32(R1),
                          R1), pl.ds(_i32(0), C))

        def send_descs(s, b, slot):
            """remote copies of vout[slot] -> device d's output block."""
            d = lax.rem(my + jnp.int32(s), jnp.int32(P))
            rows, cols = out_slices(b, my)
            return tuple(
                pltpu.make_async_remote_copy(
                    src_ref=vout.at[slot, _i32(p)],
                    dst_ref=outs[p].at[rows, cols],
                    send_sem=send_sem.at[slot, _i32(p)],
                    recv_sem=recv_sem.at[_i32(s), _i32(p)],
                    device_id=(d,),
                    device_id_type=pltpu.DeviceIdType.MESH)
                for p in range(NP))

        def in_copies(s, b, slot):
            d = lax.rem(my + jnp.int32(s), jnp.int32(P))
            if forward:
                srcs = [xp.at[pl.ds(_i32(b) * jnp.int32(N1)
                                    + d * jnp.int32(R1), R1)]
                        for xp in xs]
            else:
                rows = pl.ds(_i32(b * R1), R1)
                cols = pl.ds(d * jnp.int32(C), C)
                srcs = [xp.at[rows, cols] for xp in xs]
            return tuple(
                pltpu.make_async_copy(srcs[p], vin.at[slot, _i32(p)],
                                      in_sem.at[slot, _i32(p)])
                for p in range(NP))

        steps = [(s, b) for s in range(P) for b in range(B)]
        for cp in in_copies(*steps[0], 0):
            cp.start()
        for it, (s, b) in enumerate(steps):
            slot = it % 2
            if it + 1 < len(steps):
                for cp in in_copies(*steps[it + 1], (it + 1) % 2):
                    cp.start()
            for cp in in_copies(s, b, slot):
                cp.wait()
            if it >= 2:
                # the send that used this slot two iterations ago
                for cp in send_descs(*steps[it - 2], slot):
                    cp.wait_send()
            d = lax.rem(my + jnp.int32(s), jnp.int32(P))
            if forward:
                trow = pl.ds(d * jnp.int32(R1), R1)
                tps = tuple(tp[trow] for tp in tws)
            else:
                tcol = pl.ds(d * jnp.int32(C), C)
                tps = tuple(tp[:, tcol] for tp in tws)
            prod = mulfn(tuple(vin[slot, _i32(p)] for p in range(NP)),
                         tps)
            for p in range(NP):
                vout[slot, _i32(p)] = prod[p]
            for cp in send_descs(s, b, slot):
                cp.start()
        for it in range(max(0, len(steps) - 2), len(steps)):
            for cp in send_descs(*steps[it], it % 2):
                cp.wait_send()

        # wait for every incoming block: at step s the block arriving
        # came from src = (my - s) % P; the descriptor is reconstructed
        # to consume recv_sem[s] bytes
        for s in range(P):
            src = lax.rem(my - jnp.int32(s) + jnp.int32(P), jnp.int32(P))
            for b in range(B):
                rows, cols = out_slices(b, src)
                for p in range(NP):
                    pltpu.make_async_remote_copy(
                        src_ref=vout.at[_i32(0), _i32(p)],
                        dst_ref=outs[p].at[rows, cols],
                        send_sem=send_sem.at[_i32(0), _i32(p)],
                        recv_sem=recv_sem.at[_i32(s), _i32(p)],
                        device_id=(my,),
                        device_id_type=pltpu.DeviceIdType.MESH).wait_recv()

    return kern


def _planes_of(x, NP):
    """storage tensor -> list of NP u32 plane arrays (free bitcasts)."""
    if NP == 1:
        assert x.dtype == jnp.uint32
        return [x]
    v = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return [v[..., p] for p in range(NP)]


def _from_planes(planes):
    if len(planes) == 1:
        return planes[0]
    return jax.lax.bitcast_convert_type(
        jnp.stack(planes, axis=-1), jnp.uint64)


def _exchange(x2, tw, P, axis, interpret, collective_id, field,
              forward, R1, C, N1, N2, B, out_rows, out_cols):
    NP, mulfn = EXCHANGE_FIELDS[field]
    xp = _planes_of(x2, NP)
    tp = _planes_of(tw, NP)
    kern = _make_kernel(P, B, N1, C, axis, NP, mulfn, forward=forward)
    out_shape = tuple(jax.ShapeDtypeStruct((out_rows, out_cols),
                                           jnp.uint32)
                      for _ in range(NP))
    pcall = pl.pallas_call(
        kern,
        in_specs=[_ANY] * NP + [_VMEM] * NP,
        out_specs=(_ANY,) * NP,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, NP, R1, C), jnp.uint32),   # vin slots
            pltpu.VMEM((2, NP, R1, C), jnp.uint32),   # vout slots
            pltpu.SemaphoreType.DMA((2, NP)),          # in
            pltpu.SemaphoreType.DMA((2, NP)),          # send
            pltpu.SemaphoreType.DMA((P, NP)),          # recv (per step)
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=pltpu.CompilerParams(collective_id=collective_id),
    )
    outs = pcall(*xp, *tp)
    return _from_planes(list(outs) if NP > 1 else [outs[0]])


def twiddle_exchange_fwd(x, tw, P, axis="x", interpret=False,
                         collective_id=7, field="goldilocks"):
    """Fused (mid-twiddle * x) + transpose-exchange, forward direction.

    x:  storage [B, N1, C] (or [N1, C]) — this device's column shard
        after the column NTT stage.
    tw: storage [N1, C] — omega^(k1_leaf * n2) for this device's
        columns (the field's storage form: the in-kernel modmul IS the
        field's `mul` on that form).
    Returns storage [B, N1/P, N2] (batch axis preserved), i.e. exactly
    ``all_to_all(f.mul(x, tw), split rows, concat cols)``.

    Must be called INSIDE shard_map over a 1-D mesh axis of size P.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    B, N1, C = x.shape
    R1 = N1 // P
    N2 = C * P
    y = _exchange(x.reshape(B * N1, C), tw, P, axis, interpret,
                  collective_id, field, True, R1, C, N1, N2, B,
                  B * R1, N2)
    y = y.reshape(B, R1, N2)
    return y[0] if squeeze else y


def twiddle_exchange_inv(y, tw, P, axis="x", interpret=False,
                         collective_id=8, field="goldilocks"):
    """Fused (y * inverse-twiddle) + transpose-exchange, inverse
    direction of the four-step transform.

    y:  storage [B, R1, N2] (or [R1, N2]) — this device's row shard
        after the inverse row NTT (R1 = N1/P).
    tw: storage [R1, N2] — omega^(-k1_local * n2) for this device's rows.
    Returns storage [B, N1, C] (batch preserved), i.e. exactly
    ``all_to_all(f.mul(y, tw), split cols, concat rows)``.

    Must be called INSIDE shard_map over a 1-D mesh axis of size P.
    """
    squeeze = y.ndim == 2
    if squeeze:
        y = y[None]
    B, R1, N2 = y.shape
    N1 = R1 * P
    C = N2 // P
    out = _exchange(y.reshape(B * R1, N2), tw, P, axis, interpret,
                    collective_id, field, False, R1, C, N1, N2, B,
                    B * N1, C)
    out = out.reshape(B, N1, C)
    return out[0] if squeeze else out
