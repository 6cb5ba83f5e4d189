#!/usr/bin/env python
"""Fully-unique-operand chains: every dispatch in every rep sees args
never used before.  If rates collapse vs e8, the runtime memoizes
(executable, args) pairs and all repeated-args measurements are bogus."""

import json
import time

import numpy as np

import jax


def rep(**kw):
    print(json.dumps(kw), flush=True)


def main():
    rep(exp="device", dev=str(jax.devices()[0]))
    from stark_rings_tpu.fields import GOLDILOCKS as f
    from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT

    N = 1 << 16
    rng = np.random.default_rng(0)
    DEPTH, REPS = 8, 3

    for B in (32, 64):
        tp = Mxu2PallasNTT(N, pointwise_pallas=True)
        mul = tp.staged_mul()
        a0 = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
        warm = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
        jax.block_until_ready(mul(a0, warm))
        times = []
        for r in range(REPS):
            bs = [jax.device_put(
                rng.integers(0, f.q, (B, N), dtype=np.uint64))
                for _ in range(DEPTH)]
            a = jax.device_put(rng.integers(0, f.q, (B, N),
                                            dtype=np.uint64))
            jax.block_until_ready(bs)
            t0 = time.perf_counter()
            x = a
            for i in range(DEPTH):
                x = mul(x, bs[i])
            jax.block_until_ready(x)
            times.append((time.perf_counter() - t0) / DEPTH)
        dt = sorted(times)[len(times) // 2]
        rep(exp="unique_chain", B=B,
            all_us_per_elem=[round(t * 1e6 / B, 2) for t in times],
            median_us_per_elem=round(dt * 1e6 / B, 2),
            mults_per_s=round(B / dt, 1))

    rep(exp="done")


if __name__ == "__main__":
    main()
