#!/usr/bin/env python
"""Transform-granularity modules (3 dispatches/mul) vs stage granularity
(~12), checksum-forced, plus the radix-4 control at B=128."""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def rep(**kw):
    print(json.dumps(kw), flush=True)


def timed(mulfn, B, N, depth, rng, f):
    bs = [jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
          for _ in range(depth)]
    a = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
    jax.block_until_ready(bs)
    csum = jax.jit(lambda x: jnp.bitwise_xor.reduce(
        jnp.bitwise_xor.reduce(x, axis=0), axis=0))
    t0 = time.perf_counter()
    x = a
    for b in bs:
        x = mulfn(x, b)
    _ = int(jax.device_get(csum(x)))
    return (time.perf_counter() - t0) / depth


def main():
    rep(exp="device", dev=str(jax.devices()[0]))
    from stark_rings_tpu.fields import GOLDILOCKS as f
    from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT

    N = 1 << 16
    rng = np.random.default_rng(0)

    tp = Mxu2PallasNTT(N, pointwise_pallas=True)
    for B in (64, 128, 256):
        try:
            mul = tp.staged_mul(granularity="transform")
            w = jax.device_put(rng.integers(0, f.q, (B, N),
                                            dtype=np.uint64))
            t0 = time.perf_counter()
            jax.block_until_ready(mul(w, w))
            rep(exp="compile", B=B, sec=round(time.perf_counter() - t0, 1))
            for depth in (8,):
                dt = timed(mul, B, N, depth, rng, f)
                rep(exp="transform_gran", B=B, depth=depth,
                    us_per_elem=round(dt * 1e6 / B, 2),
                    mults_per_s=round(B / dt, 1))
        except Exception as e:  # noqa
            rep(exp="transform_gran", B=B,
                error=f"{type(e).__name__}: {e}"[:250])

    # radix-4 checksum control at B=128
    try:
        from stark_rings_tpu.ops.ntt import get_ntt

        ctx = get_ntt("goldilocks", N, negacyclic=True)
        mulj = jax.jit(ctx.mul)
        B = 128
        w = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
        jax.block_until_ready(mulj(w, w))
        for depth in (8,):
            dt = timed(mulj, B, N, depth, rng, f)
            rep(exp="radix4", B=B, depth=depth,
                us_per_elem=round(dt * 1e6 / B, 2),
                mults_per_s=round(B / dt, 1))
    except Exception as e:  # noqa
        rep(exp="radix4", error=f"{type(e).__name__}: {e}"[:250])

    rep(exp="done")


if __name__ == "__main__":
    main()
