"""e15: timing shoot-out of fold implementations (one jit module each).

a) chunked whole-array fold (16 pallas calls inside one jit)
b) streaming one-call fold, serial DMA, BLK=512
c) streaming one-call fold, BLK=1024 / 2048
All on the B=32 shape int32 [9*256, 8192]; checksum-forced timing of a
4-deep dependent chain (xor-perturb between steps so no dispatch
repeats its args).
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from stark_rings_tpu.ops.mxu2 import K_BUCKETS  # noqa: E402
from stark_rings_tpu.ops.pallas_fold import (  # noqa: E402
    _fold_rows, _pack_u64, fold_end)


def log(**kw):
    print(json.dumps(kw), flush=True)
    with open("/root/repo/experiments/e15_out.jsonl", "a") as fh:
        fh.write(json.dumps(kw) + "\n")


R = 256
COLS = 32 * 256


def make_stream(blk):
    def kern(v_hbm, olo_hbm, ohi_hbm, vin, vlo, vhi, sin, slo, shi):
        for i in range(v_hbm.shape[1] // blk):
            off = i * blk
            cin = pltpu.make_async_copy(
                v_hbm.at[:, pl.ds(off, blk)], vin, sin)
            cin.start()
            cin.wait()
            lo, hi = _fold_rows(vin[:], R)
            vlo[:] = lo
            vhi[:] = hi
            clo = pltpu.make_async_copy(
                vlo, olo_hbm.at[:, pl.ds(off, blk)], slo)
            chi = pltpu.make_async_copy(
                vhi, ohi_hbm.at[:, pl.ds(off, blk)], shi)
            clo.start()
            chi.start()
            clo.wait()
            chi.wait()

    def fold(V):
        lo, hi = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                       pl.BlockSpec(memory_space=pltpu.ANY)),
            out_shape=(jax.ShapeDtypeStruct((R, COLS), jnp.uint32),
                       jax.ShapeDtypeStruct((R, COLS), jnp.uint32)),
            scratch_shapes=[
                pltpu.VMEM((K_BUCKETS * R, blk), jnp.int32),
                pltpu.VMEM((R, blk), jnp.uint32),
                pltpu.VMEM((R, blk), jnp.uint32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=14 * 1024 * 1024),
        )(V)
        return _pack_u64(lo, hi)

    return fold


def timeit(name, fn, V):
    """checksum-forced chained timing; the chain perturbs V between
    steps so no dispatch repeats its arguments."""
    try:
        out = fn(V)
        csum = jax.jit(lambda x: jnp.bitwise_xor.reduce(
            x.reshape(-1, x.shape[-1])).max())
        # dependency hook: fold a bit of the output back into the input
        perturb = jax.jit(lambda v, o: v ^ (
            jax.lax.bitcast_convert_type(o[0, 0], jnp.uint32)[0]
            & jnp.uint32(1)).astype(jnp.int32))
        _ = int(jax.device_get(csum(out)))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            x = V
            for i in range(4):
                o = fn(x)
                x = perturb(x, o)
            _ = int(jax.device_get(csum(o)))
            dt = (time.perf_counter() - t0) / 4
            best = dt if best is None else min(best, dt)
        log(exp=name, ms=round(best * 1e3, 3))
    except Exception as exc:
        log(exp=name, err=f"{type(exc).__name__}: {exc}"[:300])


def main():
    log(exp="start", dev=str(jax.devices()[0]))
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.integers(-(1 << 20), 1 << 20,
                                 size=(K_BUCKETS * R, COLS),
                                 dtype=np.int32))
    timeit("chunked_16call", jax.jit(lambda v: fold_end(v, R)), V)
    for blk in (512, 1024, 2048):
        timeit(f"stream_blk{blk}", jax.jit(make_stream(blk)), V)


if __name__ == "__main__":
    main()
