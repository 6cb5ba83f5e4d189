"""Pallas remote-copy exchange for the sharded four-step NTT.

The four-step transform's transpose is ONE all_to_all; XLA schedules it
as a monolithic collective AFTER the whole twiddle pass.  This kernel
implements the SNIPPETS.md remote-DMA pattern instead: the mid-twiddle
modmul is fused INTO the send loop, so block (s) is twiddled on the VPU
while block (s-1) is already in flight on ICI — compute/communication
overlap at the kernel level, the thing XLA's collective scheduler cannot
express for this dataflow (the twiddle feeds the exchange elementwise).

Both directions, Goldilocks only (the fused twiddle is the u32-pair
modmul; fields whose modmul has no u32-pair kernel keep the XLA
collective) — `ShardedNTT(..., exchange="pallas")` routes the forward,
inverse and (through them) the cached-operand paths through it.
Validated for bit-exactness against the XLA path on the CPU mesh via
the distributed interpret mode (`pltpu.InterpretParams`); the overlap
itself only materializes on real ICI.

Dataflow per device (P devices, R1 = N1/P, C = N2/P, batch B):

    in   x  [B*N1, C]   u32 lo/hi planes   (post column-NTT)
    in   tw [N1,  C]    u32 lo/hi planes   (omega^(k1_leaf * n2), local cols)
    out  y  [B*R1, N2]  u32 lo/hi planes   (post twiddle + transpose)

    for s in 0..P:  d = (my + s) % P               # destination device
      for b in 0..B:
        DMA x block (rows b*N1 + d*R1 .. +R1) HBM -> VMEM
        twiddle it (mul_q with tw rows d*R1 .. +R1)
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

__all__ = ["twiddle_exchange_fwd", "twiddle_exchange_inv"]

_ANY = pl.BlockSpec(memory_space=pl.ANY)
_VMEM = pl.BlockSpec(memory_space=pltpu.VMEM)


def _i32(x):
    return jnp.int32(x) if isinstance(x, int) else x


def _make_kernel(P, B, N1, C, axis, forward=True):
    """Twiddle-fused transpose-exchange kernel, either direction.

    forward: x [B*N1, C] -> out [B*R1, N2] (split rows, concat cols)
    inverse: y [B*R1, N2] -> out [B*N1, C] (split cols, concat rows)
    Block shape is [R1, C] both ways; only the slice maps differ."""
    R1 = N1 // P

    def kern(xlo, xhi, twlo, twhi, olo, ohi,
             vin, vout, in_sem, send_sem, recv_sem):
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
            return (
                pltpu.make_async_remote_copy(
                    src_ref=vout.at[slot, _i32(0)],
                    dst_ref=olo.at[rows, cols],
                    send_sem=send_sem.at[slot, _i32(0)],
                    recv_sem=recv_sem.at[_i32(s), _i32(0)],
                    device_id=(d,),
                    device_id_type=pltpu.DeviceIdType.MESH),
                pltpu.make_async_remote_copy(
                    src_ref=vout.at[slot, _i32(1)],
                    dst_ref=ohi.at[rows, cols],
                    send_sem=send_sem.at[slot, _i32(1)],
                    recv_sem=recv_sem.at[_i32(s), _i32(1)],
                    device_id=(d,),
                    device_id_type=pltpu.DeviceIdType.MESH),
            )

        def in_copies(s, b, slot):
            d = lax.rem(my + jnp.int32(s), jnp.int32(P))
            if forward:
                src0 = xlo.at[pl.ds(_i32(b) * jnp.int32(N1)
                                    + d * jnp.int32(R1), R1)]
                src1 = xhi.at[pl.ds(_i32(b) * jnp.int32(N1)
                                    + d * jnp.int32(R1), R1)]
            else:
                rows = pl.ds(_i32(b * R1), R1)
                cols = pl.ds(d * jnp.int32(C), C)
                src0 = xlo.at[rows, cols]
                src1 = xhi.at[rows, cols]
            return (
                pltpu.make_async_copy(src0, vin.at[slot, _i32(0)],
                                      in_sem.at[slot, _i32(0)]),
                pltpu.make_async_copy(src1, vin.at[slot, _i32(1)],
                                      in_sem.at[slot, _i32(1)]),
            )

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
                tlo, thi = twlo[trow], twhi[trow]
            else:
                tcol = pl.ds(d * jnp.int32(C), C)
                tlo, thi = twlo[:, tcol], twhi[:, tcol]
            plo, phi = _mul_q(vin[slot, _i32(0)], vin[slot, _i32(1)],
                              tlo, thi)
            vout[slot, _i32(0)] = plo
            vout[slot, _i32(1)] = phi
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
                pltpu.make_async_remote_copy(
                    src_ref=vout.at[_i32(0), _i32(0)],
                    dst_ref=olo.at[rows, cols],
                    send_sem=send_sem.at[_i32(0), _i32(0)],
                    recv_sem=recv_sem.at[_i32(s), _i32(0)],
                    device_id=(my,),
                    device_id_type=pltpu.DeviceIdType.MESH).wait_recv()
                pltpu.make_async_remote_copy(
                    src_ref=vout.at[_i32(0), _i32(1)],
                    dst_ref=ohi.at[rows, cols],
                    send_sem=send_sem.at[_i32(0), _i32(1)],
                    recv_sem=recv_sem.at[_i32(s), _i32(1)],
                    device_id=(my,),
                    device_id_type=pltpu.DeviceIdType.MESH).wait_recv()

    return kern


def twiddle_exchange_fwd(x, tw, P, axis="x", interpret=False,
                         collective_id=7):
    """Fused (mid-twiddle * x) + transpose-exchange, forward direction.

    x:  u64 [B, N1, C] (or [N1, C]) — this device's column shard after
        the column NTT stage.
    tw: u64 [N1, C] — omega^(k1_leaf * n2) for this device's columns.
    Returns u64 [B, N1/P, N2] (batch axis preserved), i.e. exactly
    ``all_to_all(f.mul(x, tw), split rows, concat cols)``.

    Must be called INSIDE shard_map over a 1-D mesh axis of size P.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    B, N1, C = x.shape
    R1 = N1 // P
    N2 = C * P
    xv = jax.lax.bitcast_convert_type(x.reshape(B * N1, C), jnp.uint32)
    tv = jax.lax.bitcast_convert_type(tw, jnp.uint32)
    kern = _make_kernel(P, B, N1, C, axis)
    out_shape = (jax.ShapeDtypeStruct((B * R1, N2), jnp.uint32),
                 jax.ShapeDtypeStruct((B * R1, N2), jnp.uint32))
    pcall = pl.pallas_call(
        kern,
        in_specs=[_ANY, _ANY, _VMEM, _VMEM],
        out_specs=(_ANY, _ANY),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 2, R1, C), jnp.uint32),   # vin slots (lo, hi)
            pltpu.VMEM((2, 2, R1, C), jnp.uint32),   # vout slots
            pltpu.SemaphoreType.DMA((2, 2)),          # in
            pltpu.SemaphoreType.DMA((2, 2)),          # send
            pltpu.SemaphoreType.DMA((P, 2)),          # recv (per step)
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=pltpu.CompilerParams(collective_id=collective_id),
    )
    lo, hi = pcall(xv[..., 0], xv[..., 1], tv[..., 0], tv[..., 1])
    y = jax.lax.bitcast_convert_type(
        jnp.stack([lo, hi], axis=-1), jnp.uint64)
    y = y.reshape(B, R1, N2)
    return y[0] if squeeze else y


def twiddle_exchange_inv(y, tw, P, axis="x", interpret=False,
                         collective_id=8):
    """Fused (y * inverse-twiddle) + transpose-exchange, inverse
    direction of the four-step transform.

    y:  u64 [B, R1, N2] (or [R1, N2]) — this device's row shard after
        the inverse row NTT (R1 = N1/P).
    tw: u64 [R1, N2] — omega^(-k1_local * n2) for this device's rows.
    Returns u64 [B, N1, C] (batch preserved), i.e. exactly
    ``all_to_all(f.mul(y, tw), split cols, concat rows)``.

    Must be called INSIDE shard_map over a 1-D mesh axis of size P.
    """
    squeeze = y.ndim == 2
    if squeeze:
        y = y[None]
    B, R1, N2 = y.shape
    N1 = R1 * P
    C = N2 // P
    yv = jax.lax.bitcast_convert_type(y.reshape(B * R1, N2), jnp.uint32)
    tv = jax.lax.bitcast_convert_type(tw, jnp.uint32)
    kern = _make_kernel(P, B, N1, C, axis, forward=False)
    out_shape = (jax.ShapeDtypeStruct((B * N1, C), jnp.uint32),
                 jax.ShapeDtypeStruct((B * N1, C), jnp.uint32))
    pcall = pl.pallas_call(
        kern,
        in_specs=[_ANY, _ANY, _VMEM, _VMEM],
        out_specs=(_ANY, _ANY),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 2, R1, C), jnp.uint32),   # vin slots (lo, hi)
            pltpu.VMEM((2, 2, R1, C), jnp.uint32),   # vout slots
            pltpu.SemaphoreType.DMA((2, 2)),          # in
            pltpu.SemaphoreType.DMA((2, 2)),          # send
            pltpu.SemaphoreType.DMA((P, 2)),          # recv (per step)
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
        compiler_params=pltpu.CompilerParams(collective_id=collective_id),
    )
    lo, hi = pcall(yv[..., 0], yv[..., 1], tv[..., 0], tv[..., 1])
    out = jax.lax.bitcast_convert_type(
        jnp.stack([lo, hi], axis=-1), jnp.uint64)
    out = out.reshape(B, N1, C)
    return out[0] if squeeze else out
