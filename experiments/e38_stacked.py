"""e38: stacked forward transforms — one dot/fold pair at 2x columns
for both operands instead of two (fewer kernel launches, wider dots,
fold2 kernel reads each operand's half via DMA column offsets).

Measures the in-module depth-differenced chain rate (bench.py
methodology) for the current fused path vs the stacked variant at a few
batch sizes.  Oracle-gated before any rate is recorded.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT  # noqa: E402
from stark_rings_tpu.native.host import HostGoldilocks  # noqa: E402

N = 1 << 16
Q = 2**64 - 2**32 + 1
OUT = open("/root/repo/experiments/e38_out.jsonl", "a")


def log(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def chain_rate(tp, B, lo=2, hi=6, reps=3):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    c = jax.device_put(tp.consts())
    cs = jax.jit(lambda x: jnp.bitwise_xor.reduce(
        x.reshape(-1, x.shape[-1])).max())
    t_at = {}
    for k in (lo, hi):
        a = jax.device_put(rng.integers(0, Q, size=(B, N), dtype=np.uint64))
        bs = [jax.device_put(rng.integers(0, Q, size=(B, N),
                                          dtype=np.uint64))
              for _ in range(k)]

        def fn(cc, x, bs):
            for i in range(k):
                x = tp.mul(x, bs[i], cc)
            return x
        f = jax.jit(fn)
        out = f(c, a, bs)
        _ = int(jax.device_get(cs(out)))
        best = None
        for _r in range(reps):
            t0 = time.perf_counter()
            out = f(c, a, bs)
            _ = int(jax.device_get(cs(out)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        t_at[k] = best
    per = (t_at[hi] - t_at[lo]) / (hi - lo)
    if per <= 0:
        per = t_at[hi] / hi
    return B / per, t_at


def main():
    hg = HostGoldilocks(N)
    rng = np.random.default_rng(7)
    a = rng.integers(0, Q, size=(2, N), dtype=np.uint64)
    b = rng.integers(0, Q, size=(2, N), dtype=np.uint64)
    want = hg.mul(a, b)

    for stack in (False, True):
        tp = Mxu2PallasNTT(N, dma_folds=True, pointwise_pallas=True,
                           fuse_pointwise=True, stack_forward=stack)
        c = jax.device_put(tp.consts())
        got = np.asarray(jax.jit(
            lambda cc, x, y: tp.mul(x, y, cc))(c, a, b))
        assert np.array_equal(got, want), f"oracle mismatch stack={stack}"
        log(gate=f"stack={stack}", ok=True)
        for B in (48, 64, 96, 128):
            rate, t_at = chain_rate(tp, B)
            log(stack=stack, B=B, rate=round(rate, 1),
                us_per_elem=round(1e6 / rate, 1),
                t_at={str(k): round(v, 4) for k, v in t_at.items()})


if __name__ == "__main__":
    main()
