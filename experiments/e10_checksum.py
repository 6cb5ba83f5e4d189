#!/usr/bin/env python
"""Bulletproof timing: the measured region ends with device_get of a
checksum that depends on every output byte — the host cannot observe the
value before the device finishes.  Also checks linear scaling in chain
depth."""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def rep(**kw):
    print(json.dumps(kw), flush=True)


def main():
    rep(exp="device", dev=str(jax.devices()[0]))
    from stark_rings_tpu.fields import GOLDILOCKS as f
    from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT
    from stark_rings_tpu.ops.ntt import get_ntt

    N = 1 << 16
    rng = np.random.default_rng(0)
    B = 64
    tp = Mxu2PallasNTT(N, pointwise_pallas=True)
    mul = tp.staged_mul()
    csum = jax.jit(lambda x: jnp.bitwise_xor.reduce(
        jnp.bitwise_xor.reduce(x, axis=0), axis=0))

    a0 = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
    w = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
    jax.block_until_ready(mul(a0, w))
    _ = jax.device_get(csum(mul(a0, w)))

    for depth in (4, 8, 16):
        bs = [jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
              for _ in range(depth)]
        a = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
        jax.block_until_ready(bs)
        t0 = time.perf_counter()
        x = a
        for i in range(depth):
            x = mul(x, bs[i])
        val = int(jax.device_get(csum(x)))
        dt = (time.perf_counter() - t0) / depth
        rep(exp="checksum_chain", B=B, depth=depth, checksum=val & 0xFFFF,
            us_per_elem=round(dt * 1e6 / B, 2),
            mults_per_s=round(B / dt, 1))

    # control: radix-4 single-dispatch chain with checksum
    ctx = get_ntt("goldilocks", N, negacyclic=True)
    mulj = jax.jit(ctx.mul)
    jax.block_until_ready(mulj(a0, w))
    bs = [jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
          for _ in range(4)]
    a = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
    jax.block_until_ready(bs)
    t0 = time.perf_counter()
    x = a
    for i in range(4):
        x = mulj(x, bs[i])
    val = int(jax.device_get(csum(x)))
    dt = (time.perf_counter() - t0) / 4
    rep(exp="radix4_checksum", B=B, checksum=val & 0xFFFF,
        us_per_elem=round(dt * 1e6 / B, 2),
        mults_per_s=round(B / dt, 1))

    rep(exp="done")


if __name__ == "__main__":
    main()
