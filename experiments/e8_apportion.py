#!/usr/bin/env python
"""Apportion the staged-mul budget: pointwise impl choice, fold chunk
sizes, B sweep with distinct-operand chains."""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def rep(**kw):
    print(json.dumps(kw), flush=True)


def chain(mul, a, bs, depth, reps=3):
    x = mul(a, bs[0])
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = a
        for i in range(depth):
            x = mul(x, bs[i % len(bs)])
        jax.block_until_ready(x)
    return (time.perf_counter() - t0) / (reps * depth)


def main():
    rep(exp="device", dev=str(jax.devices()[0]))
    from stark_rings_tpu.fields import GOLDILOCKS as f
    from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT

    N = 1 << 16
    rng = np.random.default_rng(0)

    for B in (32, 64):
        a = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
        bs = [jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
              for _ in range(4)]
        for pw in (False, True):
            try:
                tp = Mxu2PallasNTT(N, pointwise_pallas=pw)
                mul = tp.staged_mul()
                dt = chain(mul, a, bs, 4)
                rep(exp="staged", B=B, pointwise_pallas=pw,
                    us_per_elem=round(dt * 1e6 / B, 2),
                    mults_per_s=round(B / dt, 1))
            except Exception as e:  # noqa
                rep(exp="staged", B=B, pointwise_pallas=pw,
                    error=f"{type(e).__name__}: {e}"[:200])

    rep(exp="done")


if __name__ == "__main__":
    main()
