#!/usr/bin/env python
"""Round-2 perf probes on the real chip (run in background; JSON lines).

E-A: effective int8 matmul TOPS at the shapes the 2-level MXU NTT needs.
E-B: can Mosaic handle uint64 arithmetic inside a Pallas kernel?
E-C: Pallas u32 multiply-chain rate (VPU envelope from inside a kernel).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def rep(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def e_a():
    rng = np.random.default_rng(0)
    for (R, K, C) in [(2048, 2048, 256), (2048, 2048, 512),
                      (2048, 2048, 2048), (2048, 2048, 8192),
                      (2432, 1280, 512), (512, 512, 8192)]:
        try:
            w = jnp.asarray(rng.integers(-127, 128, size=(R, K),
                                         dtype=np.int8))
            x = jnp.asarray(rng.integers(-127, 128, size=(K, C),
                                         dtype=np.int8))
            f = jax.jit(lambda a, b: jax.lax.dot(
                a, b, preferred_element_type=jnp.int32))
            dt = timeit(f, w, x)
            tops = 2 * R * K * C / dt / 1e12
            rep(exp="int8_dot_xla", shape=[R, K, C], us=round(dt * 1e6, 1),
                tops=round(tops, 1))
        except Exception as e:  # noqa
            rep(exp="int8_dot_xla", shape=[R, K, C],
                error=f"{type(e).__name__}: {e}"[:200])


def e_a_pallas():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    for (R, K, C) in [(2048, 2048, 256), (2048, 2048, 512)]:
        try:
            w = jnp.asarray(rng.integers(-127, 128, size=(R, K),
                                         dtype=np.int8))
            x = jnp.asarray(rng.integers(-127, 128, size=(K, C),
                                         dtype=np.int8))

            def kern(wr, xr, outr):
                outr[:] = jax.lax.dot(
                    wr[:], xr[:], preferred_element_type=jnp.int32)

            whole = pl.BlockSpec(memory_space=pltpu.VMEM)
            f = jax.jit(lambda a, b: pl.pallas_call(
                kern,
                in_specs=[whole, whole], out_specs=whole,
                out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32))(a, b))
            dt = timeit(f, w, x)
            tops = 2 * R * K * C / dt / 1e12
            rep(exp="int8_dot_pallas", shape=[R, K, C],
                us=round(dt * 1e6, 1), tops=round(tops, 1))
        except Exception as e:  # noqa
            rep(exp="int8_dot_pallas", shape=[R, K, C],
                error=f"{type(e).__name__}: {e}"[:200])


def e_b():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 63, size=(256, 512),
                                 dtype=np.uint64))
    b = jnp.asarray(rng.integers(0, 1 << 63, size=(256, 512),
                                 dtype=np.uint64))

    def kern(ar, br, outr):
        x = ar[:]
        y = br[:]
        outr[:] = x * y + (x >> jnp.uint64(32))

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    try:
        f = jax.jit(lambda p, q: pl.pallas_call(
            kern, in_specs=[whole, whole], out_specs=whole,
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint64))(p, q))
        out = f(a, b)
        jax.block_until_ready(out)
        ref = (np.asarray(a, dtype=np.uint64) * np.asarray(b)
               + (np.asarray(a) >> np.uint64(32)))
        ok = bool(np.array_equal(np.asarray(out), ref))
        rep(exp="pallas_u64", ok=ok)
    except Exception as e:  # noqa
        rep(exp="pallas_u64", error=f"{type(e).__name__}: {e}"[:300])


def e_c():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    SH = (512, 512)
    a = jnp.asarray(rng.integers(0, 1 << 32, size=SH, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 32, size=SH, dtype=np.uint32))
    CH = 64

    def kern(ar, br, outr):
        x = ar[:]
        y = br[:]
        for _ in range(CH):
            x = x * y + jnp.uint32(1)
        outr[:] = x

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    try:
        f = jax.jit(lambda p, q: pl.pallas_call(
            kern, in_specs=[whole, whole], out_specs=whole,
            out_shape=jax.ShapeDtypeStruct(SH, jnp.uint32))(p, q))
        dt = timeit(f, a, b)
        rate = SH[0] * SH[1] * CH / dt
        rep(exp="pallas_u32_mulchain", us=round(dt * 1e6, 1),
            mul_adds_per_s=f"{rate:.3e}")
    except Exception as e:  # noqa
        rep(exp="pallas_u32_mulchain", error=f"{type(e).__name__}: {e}"[:300])


def main():
    rep(exp="device", dev=str(jax.devices()[0]))
    e_a()
    e_b()
    e_c()
    e_a_pallas()
    rep(exp="done")


if __name__ == "__main__":
    main()
