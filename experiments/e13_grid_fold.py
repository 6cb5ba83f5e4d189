"""e13: can the remote compiler handle a GRIDDED fold kernel now?

Round-1 finding (CLAUDE.md): gridded BlockSpecs around large kernels
crashed the remote compile service.  Retest on the exact fold shapes the
MXU v2 path needs: int32 [K*R, cols] -> u64 [R, cols], 1-D grid over
column blocks.  If this works, every fold becomes ONE Pallas call and
the whole multiply can live in one jit module (the dispatch-bound
staged path pays ~1.4 ms per dispatch through the tunnel).
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
from stark_rings_tpu.ops.mxu2 import Mxu2NTT, K_BUCKETS  # noqa: E402
from stark_rings_tpu.ops.pallas_fold import (  # noqa: E402
    _fold_rows, _pack_u64)


def log(**kw):
    print(json.dumps(kw), flush=True)
    with open("/root/repo/experiments/e13_out.jsonl", "a") as fh:
        fh.write(json.dumps(kw) + "\n")


R = 256
COLS = 32 * 256        # B=32 shape
BLK = 512


def kern(v_ref, olo_ref, ohi_ref):
    lo, hi = _fold_rows(v_ref[:], R)
    olo_ref[:] = lo
    ohi_ref[:] = hi


def gridded_fold(V):
    cols = V.shape[1]
    grid = cols // BLK
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((K_BUCKETS * R, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((R, BLK), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((R, BLK), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((R, cols), jnp.uint32),
                   jax.ShapeDtypeStruct((R, cols), jnp.uint32)),
    )(V)


def main():
    log(exp="start", dev=str(jax.devices()[0]))
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.integers(-(1 << 20), 1 << 20,
                                 size=(K_BUCKETS * R, COLS), dtype=np.int32))
    t0 = time.perf_counter()
    try:
        fn = jax.jit(lambda v: _pack_u64(*gridded_fold(v)))
        out = np.asarray(jax.device_get(fn(V)))
    except Exception as exc:
        log(exp="grid_fold", ok=False, err=f"{type(exc).__name__}: {exc}"[:300])
        return
    compile_s = time.perf_counter() - t0
    # CPU oracle via interpret-mode whole-array fold
    from stark_rings_tpu.ops.pallas_fold import fold_end
    want_dev = jax.jit(lambda v: fold_end(v, R))(V)
    ok = bool(np.array_equal(out, np.asarray(want_dev)))
    t0 = time.perf_counter()
    for _ in range(3):
        out2 = fn(out.view(np.int32)[:, :COLS] if False else V)
    jax.block_until_ready(out2)
    dt = (time.perf_counter() - t0) / 3
    log(exp="grid_fold", ok=ok, compile_s=round(compile_s, 1),
        run_ms=round(dt * 1e3, 2))


if __name__ == "__main__":
    main()
