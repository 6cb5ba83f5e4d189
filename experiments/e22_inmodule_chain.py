"""e22: latency-cancelled timing — chain k muls INSIDE one jit module.

e21 showed every single-dispatch measurement saturates at the tunnel
round trip (~29 ms today), so per-op costs are invisible.  Here one
module runs a dependent chain of k multiplies; the difference between
k=hi and k=lo dispatches cancels the round trip exactly:
  per-mul = (t_hi - t_lo) / (hi - lo).
"""
import json
import sys
import time

import numpy as np

OUT = open("experiments/e22_out.jsonl", "a", buffering=1)


def log(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr)


def time_chain(tp, B, depth, reps=3):
    import jax
    import jax.numpy as jnp

    q = 2**64 - 2**32 + 1
    rng = np.random.default_rng(1)
    N = tp.N
    c = jax.device_put(tp.consts())

    def chain(cc, a, bs):
        x = a
        for i in range(depth):
            x = tp.mul(x, bs[i], cc)
        return x

    fn = jax.jit(chain)
    a = jax.device_put(rng.integers(0, q, size=(B, N), dtype=np.uint64))
    bs = [jax.device_put(rng.integers(0, q, size=(B, N), dtype=np.uint64))
          for _ in range(depth)]
    cs = jax.jit(lambda x: jnp.bitwise_xor.reduce(
        x.reshape(-1, x.shape[-1])).max())
    t0 = time.time()
    out = fn(c, a, bs)
    _ = int(jax.device_get(cs(out)))
    compile_s = time.time() - t0
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(c, a, bs)
        _ = int(jax.device_get(cs(out)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return compile_s, best


def main():
    import jax

    from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT

    N = 1 << 16
    log(exp="start", dev=str(jax.devices()[0]))

    for tag, kw in (
        ("dma", dict(dma_folds=True, pointwise_pallas=True)),
        ("dma_nofuse", dict(dma_folds=True, pointwise_pallas=True,
                            fuse_transpose=False)),
    ):
        try:
            tp = Mxu2PallasNTT(N, **kw)
            B = 128
            lo_k, hi_k = 2, 6
            cs1, t_lo = time_chain(tp, B, lo_k)
            cs2, t_hi = time_chain(tp, B, hi_k)
            per_mul = (t_hi - t_lo) / (hi_k - lo_k)
            log(exp=tag, B=B, compile_lo_s=round(cs1, 1),
                compile_hi_s=round(cs2, 1),
                t_lo_ms=round(t_lo * 1e3, 1), t_hi_ms=round(t_hi * 1e3, 1),
                per_mul_ms=round(per_mul * 1e3, 2),
                us_per_elem=round(per_mul / B * 1e6, 1),
                mults_per_s=round(B / per_mul, 1))
        except Exception as exc:  # noqa
            log(exp=tag, err=f"{type(exc).__name__}: {exc}"[:300])

    log(exp="done")


if __name__ == "__main__":
    main()
