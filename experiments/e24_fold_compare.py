"""e24: marginal per-fold cost, chunked vs DMA-looped, in-module.

k independent folds (distinct inputs) inside ONE jit module, XOR-combined
at the end; depth-diff k=1 vs k=3 cancels the tunnel round trip.  The
core executes ops serially, so the marginal cost per fold is clean.
"""
import json
import sys
import time

import numpy as np

OUT = open("experiments/e24_out.jsonl", "a", buffering=1)


def log(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr)


def main():
    import jax
    import jax.numpy as jnp

    from stark_rings_tpu.ops.pallas_fold import fold_end, fold_end_dma
    from stark_rings_tpu.ops.mxu2 import K_BUCKETS

    R = 256
    COLS = 16384            # = B=64 x t=256 fold shape
    KR = K_BUCKETS * R
    rng = np.random.default_rng(0)
    log(exp="start", dev=str(jax.devices()[0]), shape=[KR, COLS])

    Vs = jax.device_put(rng.integers(-2**25, 2**25, size=(3, KR, COLS),
                                     dtype=np.int32))

    def measure(tag, fold1):
        def build(k):
            def fn(vs):
                acc = None
                for i in range(k):
                    y = fold1(vs[i])
                    y32 = jax.lax.bitcast_convert_type(y, jnp.uint32)
                    acc = y32 if acc is None else acc ^ y32
                return acc
            return jax.jit(fn)

        try:
            res = {}
            for k in (1, 3):
                fn = build(k)
                cs = jax.jit(lambda x: jnp.bitwise_xor.reduce(
                    x.reshape(-1, 128)).max())
                t0 = time.time()
                o = fn(Vs)
                _ = jax.device_get(cs(o))
                compile_s = time.time() - t0
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    o = fn(Vs)
                    _ = jax.device_get(cs(o))
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                res[k] = (compile_s, best)
            per = (res[3][1] - res[1][1]) / 2
            log(exp=tag, per_fold_ms=round(per * 1e3, 2),
                us_per_elem=round(per / 64 * 1e6, 2),
                eff_gbps=round((KR * 4 + 2 * R * 4) * COLS / per / 1e9, 1),
                raw={k: [round(v[0], 1), round(v[1] * 1e3, 1)]
                     for k, v in res.items()})
        except Exception as exc:  # noqa
            log(exp=tag, err=f"{type(exc).__name__}: {exc}"[:300])

    measure("chunked_512", lambda v: fold_end(v, R, chunk=512))
    measure("chunked_1024", lambda v: fold_end(v, R, chunk=1024))
    measure("dma_512", lambda v: fold_end_dma(v, R, chunk=512))
    measure("dma_512_unroll",
            lambda v: fold_end_dma(v, R, chunk=512, unroll=True))
    measure("dma_256", lambda v: fold_end_dma(v, R, chunk=256))
    measure("dma_1024", lambda v: fold_end_dma(v, R, chunk=1024))
    log(exp="done")


if __name__ == "__main__":
    main()
