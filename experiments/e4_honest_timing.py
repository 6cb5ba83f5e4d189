#!/usr/bin/env python
"""Honest timing: distinct inputs per call + dependency-chained variants,
to rule out result caching / dedup in the axon tunnel runtime."""

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
    from stark_rings_tpu.ops.mxu2 import Mxu2NTT
    from stark_rings_tpu.ops.ntt import get_ntt

    N = 1 << 16
    rng = np.random.default_rng(0)

    # -- control: the round-1 jnp radix-4 path, same-input vs distinct ----
    ctx = get_ntt("goldilocks", N, negacyclic=True)
    B = 32
    pairs = [(jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64)),
              jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64)))
             for _ in range(6)]
    mulj = jax.jit(ctx.mul)
    jax.block_until_ready(mulj(*pairs[0]))
    t0 = time.perf_counter()
    for _ in range(6):
        out = mulj(*pairs[0])
    jax.block_until_ready(out)
    same = (time.perf_counter() - t0) / 6
    t0 = time.perf_counter()
    outs = [mulj(*p) for p in pairs]
    jax.block_until_ready(outs)
    distinct = (time.perf_counter() - t0) / 6
    rep(exp="radix4_control", B=B, same_us_per_elem=round(same * 1e6 / B, 2),
        distinct_us_per_elem=round(distinct * 1e6 / B, 2))

    # -- mxu2 XLA path: distinct inputs + chained ------------------------
    t = Mxu2NTT(N)
    c = t.consts()
    mulx = jax.jit(lambda cc, a, b: t.mul(a, b, cc))
    jax.block_until_ready(mulx(c, *pairs[0]))
    t0 = time.perf_counter()
    outs = [mulx(c, *p) for p in pairs]
    jax.block_until_ready(outs)
    distinct = (time.perf_counter() - t0) / 6
    rep(exp="mxu2_xla_distinct", B=B,
        us_per_elem=round(distinct * 1e6 / B, 2),
        mults_per_s=round(6 * B / (6 * distinct), 1))

    CH = 4

    def chain(cc, a, b):
        x = a
        for _ in range(CH):
            x = t.mul(x, b, cc)
        return x

    chj = jax.jit(chain)
    jax.block_until_ready(chj(c, *pairs[0]))
    t0 = time.perf_counter()
    outs = [chj(c, *p) for p in pairs[:3]]
    jax.block_until_ready(outs)
    per = (time.perf_counter() - t0) / (3 * CH)
    rep(exp="mxu2_xla_chained", B=B, us_per_elem=round(per * 1e6 / B, 2),
        mults_per_s=round(B / per, 1))

    rep(exp="done")


if __name__ == "__main__":
    main()
