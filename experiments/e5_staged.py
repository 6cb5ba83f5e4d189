#!/usr/bin/env python
"""Staged (per-stage jit) MXU2 mul with Pallas folds: chained timing."""

import json
import time

import numpy as np

import jax


def rep(**kw):
    print(json.dumps(kw), flush=True)


def chained_time(mul, a, b, depth=4, reps=3):
    x = mul(a, b)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = a
        for _ in range(depth):
            x = mul(x, b)
        jax.block_until_ready(x)
    return (time.perf_counter() - t0) / (reps * depth)


def main():
    rep(exp="device", dev=str(jax.devices()[0]))
    from stark_rings_tpu.fields import GOLDILOCKS as f
    from stark_rings_tpu.ops.mxu2 import Mxu2NTT
    from stark_rings_tpu.ops.ntt import get_ntt
    from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT

    N = 1 << 16
    tp = Mxu2PallasNTT(N)
    rng = np.random.default_rng(0)

    for B in (32, 64, 128):
        a = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
        b = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
        try:
            mul = tp.staged_mul()
            dt = chained_time(mul, a, b)
            rep(exp="staged_pallas_mul", B=B,
                us_per_elem=round(dt * 1e6 / B, 2),
                mults_per_s=round(B / dt, 1))
            if B == 32:
                out = mul(a, b)
                from stark_rings_tpu.native.host import HostGoldilocks
                hg = HostGoldilocks(N)
                want = hg.mul(np.asarray(a[:2]), np.asarray(b[:2]))
                rep(exp="staged_pallas_exact",
                    ok=bool(np.array_equal(np.asarray(out[:2]), want)))
        except Exception as e:  # noqa
            rep(exp="staged_pallas_mul", B=B,
                error=f"{type(e).__name__}: {e}"[:300])

    # control: radix-4 chained at B=128 (round-1 bench operating point)
    try:
        ctx = get_ntt("goldilocks", N, negacyclic=True)
        B = 128
        a = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
        b = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
        mulj = jax.jit(ctx.mul)
        dt = chained_time(mulj, a, b)
        rep(exp="radix4_chained", B=B, us_per_elem=round(dt * 1e6 / B, 2),
            mults_per_s=round(B / dt, 1))
    except Exception as e:  # noqa
        rep(exp="radix4_chained", error=f"{type(e).__name__}: {e}"[:300])

    # staged XLA-fold variant at B=64 (isolate the Pallas fold gain)
    try:
        tx = Mxu2NTT(N)
        B = 64
        a = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
        b = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
        mulx = tx.staged_mul()
        dt = chained_time(mulx, a, b)
        rep(exp="staged_xla_mul", B=B, us_per_elem=round(dt * 1e6 / B, 2),
            mults_per_s=round(B / dt, 1))
    except Exception as e:  # noqa
        rep(exp="staged_xla_mul", error=f"{type(e).__name__}: {e}"[:300])

    rep(exp="done")


if __name__ == "__main__":
    main()
