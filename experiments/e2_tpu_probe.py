#!/usr/bin/env python
"""Probe round 2: can Mosaic pipeline int8 matmuls (gridded)?  Is the
Mosaic dot slow only for int8 (bf16 control)?  Does XLA fuse a digitize
producer into an int8 dot?"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


rng = np.random.default_rng(0)


def p_grid_int8():
    R, K, C, T = 2048, 2048, 8192, 512
    w = jnp.asarray(rng.integers(-127, 128, (R, K), dtype=np.int8))
    x = jnp.asarray(rng.integers(-127, 128, (K, C), dtype=np.int8))

    def kern(wr, xr, outr):
        outr[:] = jax.lax.dot(wr[:], xr[:],
                              preferred_element_type=jnp.int32)

    try:
        f = jax.jit(lambda a, b: pl.pallas_call(
            kern,
            grid=(C // T,),
            in_specs=[pl.BlockSpec((R, K), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((K, T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32))(a, b))
        dt = timeit(f, w, x)
        rep(exp="int8_dot_pallas_grid", shape=[R, K, C], tile=T,
            us=round(dt * 1e6, 1), tops=round(2 * R * K * C / dt / 1e12, 1))
    except Exception as e:  # noqa
        rep(exp="int8_dot_pallas_grid", error=f"{type(e).__name__}: {e}"[:300])


def p_bf16():
    R, K, C = 2048, 2048, 512
    w = jnp.asarray(rng.integers(-127, 128, (R, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.integers(-127, 128, (K, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def kern(wr, xr, outr):
        outr[:] = jax.lax.dot(wr[:], xr[:],
                              preferred_element_type=jnp.float32)

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    try:
        f = jax.jit(lambda a, b: pl.pallas_call(
            kern, in_specs=[whole, whole], out_specs=whole,
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32))(a, b))
        dt = timeit(f, w, x)
        rep(exp="bf16_dot_pallas", shape=[R, K, C], us=round(dt * 1e6, 1),
            tflops=round(2 * R * K * C / dt / 1e12, 1))
    except Exception as e:  # noqa
        rep(exp="bf16_dot_pallas", error=f"{type(e).__name__}: {e}"[:300])


def x_digitize_fusion():
    """XLA: u64 [256, C] -> 8 int8 planes -> [2048, C] dot vs plain dot."""
    K, R, C = 2048, 2048, 8192
    w = jnp.asarray(rng.integers(-127, 128, (R, K), dtype=np.int8))
    u = jnp.asarray(rng.integers(0, 1 << 63, (256, C), dtype=np.uint64))
    x8 = jnp.asarray(rng.integers(-127, 128, (K, C), dtype=np.int8))

    def digitize(v):
        planes = []
        for k in range(8):
            d = ((v >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(jnp.int32)
            planes.append((d - 128).astype(jnp.int8))  # placeholder math
        return jnp.concatenate(planes, axis=0)

    f_plain = jax.jit(lambda a, b: jax.lax.dot(
        a, b, preferred_element_type=jnp.int32))
    f_fused = jax.jit(lambda a, v: jax.lax.dot(
        a, digitize(v), preferred_element_type=jnp.int32))
    dt0 = timeit(f_plain, w, x8)
    dt1 = timeit(f_fused, w, u)
    rep(exp="xla_digitize_fusion", plain_us=round(dt0 * 1e6, 1),
        fused_us=round(dt1 * 1e6, 1),
        tops_fused=round(2 * R * K * C / dt1 / 1e12, 1))


def x_level_proto():
    """Whole level at XLA: digitize -> dot -> fold (u64 ops), timing."""
    from stark_rings_tpu.fields import GOLDILOCKS as f

    R, K, C = 2048, 2048, 8192
    w = jnp.asarray(rng.integers(-127, 128, (R, K), dtype=np.int8))
    u = jnp.asarray(rng.integers(0, f.q, (256, C), dtype=np.uint64))

    def digitize(v):
        planes = []
        borrow = jnp.zeros_like(v)
        for k in range(8):
            d = ((v >> np.uint64(8 * k)) & np.uint64(0xFF)) + borrow
            hi = d > np.uint64(127)
            d = jnp.where(hi, d - np.uint64(256), d)
            borrow = hi.astype(jnp.uint64)
            planes.append(d.astype(jnp.int8))
        return jnp.concatenate(planes, axis=0)

    def fold(P):  # [2048, C] int32, 8 buckets of 256 rows
        # value = sum_k V_k 2^(8k), V_k signed |V_k| < 2^26
        acc = None
        for k in range(8):
            v = P[k * 256:(k + 1) * 256].astype(jnp.int64)
            t = (v << np.int64(8 * k))
            acc = t if acc is None else acc + t
        # acc is signed ~2^62 magnitude: lift to [0, 2^63) then mod q
        off = np.uint64((1 << 63) // f.q * f.q)  # multiple of q > 2^62
        a = (acc.astype(jnp.uint64) + off)
        return f._reduce128(jnp.zeros_like(a), a)  # not exact; timing only

    def level(v):
        return fold(jax.lax.dot(w, digitize(v),
                                preferred_element_type=jnp.int32))

    g = jax.jit(level)
    dt = timeit(g, u)
    rep(exp="xla_level_proto", us=round(dt * 1e6, 1),
        us_per_elem=round(dt * 1e6 / (C / 256), 2))


def main():
    rep(exp="device", dev=str(jax.devices()[0]))
    x_digitize_fusion()
    x_level_proto()
    p_bf16()
    p_grid_int8()
    rep(exp="done")


if __name__ == "__main__":
    main()
