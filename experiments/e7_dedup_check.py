#!/usr/bin/env python
"""Settle the timing question: chain with a REPEATED second operand vs
all-distinct operands (dedup of identical sub-dispatches would make the
repeated variant look faster than physics allows)."""

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
    B = 32
    tp = Mxu2PallasNTT(N)
    mul = tp.staged_mul()
    rng = np.random.default_rng(0)
    a = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
    bs = [jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
          for _ in range(8)]

    jax.block_until_ready(mul(a, bs[0]))

    DEPTH, REPS = 4, 3
    # repeated-b chain (bench.py's previous methodology)
    t0 = time.perf_counter()
    for _ in range(REPS):
        x = a
        for _ in range(DEPTH):
            x = mul(x, bs[0])
        jax.block_until_ready(x)
    same = (time.perf_counter() - t0) / (REPS * DEPTH)
    rep(exp="chain_same_b", us_per_elem=round(same * 1e6 / B, 2),
        mults_per_s=round(B / same, 1))

    # all-distinct chain: no dispatch ever repeats (honest)
    t0 = time.perf_counter()
    k = 0
    for _ in range(REPS):
        x = a
        for _ in range(DEPTH):
            x = mul(x, bs[k % 8])
            k += 1
        jax.block_until_ready(x)
    dist = (time.perf_counter() - t0) / (REPS * DEPTH)
    rep(exp="chain_distinct_b", us_per_elem=round(dist * 1e6 / B, 2),
        mults_per_s=round(B / dist, 1))

    # forward-only all-distinct (isolates transform cost)
    fwd = mul.forward
    jax.block_until_ready(fwd(a))
    t0 = time.perf_counter()
    outs = [fwd(bs[i]) for i in range(8)]
    jax.block_until_ready(outs)
    fdt = (time.perf_counter() - t0) / 8
    rep(exp="fwd_distinct", us_per_elem=round(fdt * 1e6 / B, 2))

    rep(exp="done")


if __name__ == "__main__":
    main()
