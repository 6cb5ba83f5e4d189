"""e14: ONE-Pallas-call fold via manual HBM->VMEM DMA streaming.

Gridded BlockSpecs crash the remote compiler (e13), so stream column
blocks manually inside a single kernel: inputs stay in ANY/HBM, a
fori_loop DMAs each [K*R, BLK] block into VMEM scratch, folds, and DMAs
the [R, BLK] results back out.  If this compiles, every fold of the MXU
v2 pipeline becomes ONE Pallas call and the full multiply can live in a
single jit module (the staged path pays ~1.4 ms per dispatch).
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
    with open("/root/repo/experiments/e14_out.jsonl", "a") as fh:
        fh.write(json.dumps(kw) + "\n")


R = 256
BLK = 512


def _stream_kernel(v_hbm, olo_hbm, ohi_hbm, vin, vlo, vhi, sin, slo, shi):
    nblk = v_hbm.shape[1] // BLK

    for i in range(nblk):           # static unroll: Mosaic's fori_loop
        off = i * BLK               # lowering recursed on this body
        cin = pltpu.make_async_copy(
            v_hbm.at[:, pl.ds(off, BLK)], vin, sin)
        cin.start()
        cin.wait()
        lo, hi = _fold_rows(vin[:], R)
        vlo[:] = lo
        vhi[:] = hi
        clo = pltpu.make_async_copy(
            vlo, olo_hbm.at[:, pl.ds(off, BLK)], slo)
        chi = pltpu.make_async_copy(
            vhi, ohi_hbm.at[:, pl.ds(off, BLK)], shi)
        clo.start()
        chi.start()
        clo.wait()
        chi.wait()


def stream_fold(V):
    cols = V.shape[1]
    lo, hi = pl.pallas_call(
        _stream_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)),
        out_shape=(jax.ShapeDtypeStruct((R, cols), jnp.uint32),
                   jax.ShapeDtypeStruct((R, cols), jnp.uint32)),
        scratch_shapes=[
            pltpu.VMEM((K_BUCKETS * R, BLK), jnp.int32),
            pltpu.VMEM((R, BLK), jnp.uint32),
            pltpu.VMEM((R, BLK), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(V)
    return _pack_u64(lo, hi)


def main():
    log(exp="start", dev=str(jax.devices()[0]))
    rng = np.random.default_rng(0)
    for B in (32, 128):
        cols = B * 256
        V = jnp.asarray(rng.integers(-(1 << 20), 1 << 20,
                                     size=(K_BUCKETS * R, cols),
                                     dtype=np.int32))
        t0 = time.perf_counter()
        try:
            fn = jax.jit(stream_fold)
            out = np.asarray(jax.device_get(fn(V)))
        except Exception as exc:
            log(exp="stream_fold", B=B, ok=False,
                err=f"{type(exc).__name__}: {exc}"[:300])
            return
        compile_s = time.perf_counter() - t0
        want = np.asarray(jax.jit(lambda v: fold_end(v, R))(V))
        ok = bool(np.array_equal(out, want))
        csum = jax.jit(lambda x: jnp.bitwise_xor.reduce(x.reshape(-1)).max())
        t0 = time.perf_counter()
        o = fn(V)
        _ = int(jax.device_get(csum(o)))
        dt = time.perf_counter() - t0
        log(exp="stream_fold", B=B, ok=ok, compile_s=round(compile_s, 1),
            run_ms=round(dt * 1e3, 2))


if __name__ == "__main__":
    main()
