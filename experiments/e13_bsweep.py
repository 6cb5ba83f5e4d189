#!/usr/bin/env python
"""Stage-granularity staged_mul: checksum-forced B sweep + radix4 control."""

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
    mul = tp.staged_mul()
    for B in (64, 128, 256):
        try:
            w = jax.device_put(rng.integers(0, f.q, (B, N),
                                            dtype=np.uint64))
            t0 = time.perf_counter()
            jax.block_until_ready(mul(w, w))
            rep(exp="compile", B=B, sec=round(time.perf_counter() - t0, 1))
            dt = timed(mul, B, N, 8, rng, f)
            rep(exp="staged_checksum", B=B,
                us_per_elem=round(dt * 1e6 / B, 2),
                mults_per_s=round(B / dt, 1))
        except Exception as e:  # noqa
            rep(exp="staged_checksum", B=B,
                error=f"{type(e).__name__}: {e}"[:250])

    try:
        from stark_rings_tpu.ops.ntt import get_ntt

        ctx = get_ntt("goldilocks", N, negacyclic=True)
        mulj = jax.jit(ctx.mul)
        for B in (128,):
            w = jax.device_put(rng.integers(0, f.q, (B, N),
                                            dtype=np.uint64))
            jax.block_until_ready(mulj(w, w))
            dt = timed(mulj, B, N, 8, rng, f)
            rep(exp="radix4_checksum", B=B,
                us_per_elem=round(dt * 1e6 / B, 2),
                mults_per_s=round(B / dt, 1))
    except Exception as e:  # noqa
        rep(exp="radix4_checksum", error=f"{type(e).__name__}: {e}"[:250])

    rep(exp="done")


if __name__ == "__main__":
    main()
