"""e34: does the v5e MXU lower unsigned-8-bit dots at int8 rates?

If u8 x u8 -> int32 dots run at the s8 rate, the mxu2 construction can
use K=8 unsigned weight digits (no sign bucket) and P=8 unsigned 8-bit
data planes: 64 int8 MACs per 64-bit modular MAC instead of 90, and the
fold loses the per-bucket bias adds (all buckets nonnegative).

Probe: time [2304, 2560] @ [2560, 32768] dots for dtype combos
(s8,s8), (u8,s8), (u8,u8), plus the reduced-size (2048, 2048) u8 combo,
with in-module chains (depth-differenced) to cancel dispatch cost.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

OUT = "experiments/e34_out.jsonl"


def log(rec):
    rec = dict(rec)
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def chain_time(w, x, depth_lo=2, depth_hi=8, reps=3):
    """Dependent in-module chain: y = W @ g(W @ g(...)), g maps int32
    back to the data dtype cheaply (mask to 8 bits)."""
    dt_x = x.dtype

    def step(v):
        y = jax.lax.dot(w, v, preferred_element_type=jnp.int32)
        # cheap int32 -> 8-bit squeeze that depends on every element
        return (y & 0x7F).astype(dt_x)

    def chain(d):
        @jax.jit
        def fn(w, x):
            v = x
            for _ in range(d):
                v = step(v)
            return jnp.sum(v.astype(jnp.int32))
        return fn

    f_lo, f_hi = chain(depth_lo), chain(depth_hi)
    # warm
    int(jax.device_get(f_lo(w, x)))
    int(jax.device_get(f_hi(w, x)))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        int(jax.device_get(f_lo(w, x)))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(jax.device_get(f_hi(w, x)))
        t_hi = time.perf_counter() - t0
        dt = (t_hi - t_lo) / (depth_hi - depth_lo)
        best = dt if best is None else min(best, dt)
    return best


def main():
    rng = np.random.default_rng(0)
    M, K, N = 2560, 2560, 32768
    combos = [
        ("s8s8", jnp.int8, jnp.int8),
        ("u8s8_w_u8", jnp.uint8, jnp.int8),
        ("s8u8_x_u8", jnp.int8, jnp.uint8),
        ("u8u8", jnp.uint8, jnp.uint8),
    ]
    for name, wdt, xdt in combos:
        w = jnp.asarray(rng.integers(0, 128, (M, K)), dtype=wdt)
        x = jnp.asarray(rng.integers(0, 128, (K, N)), dtype=xdt)
        try:
            dt = chain_time(w, x)
            macs = M * K * N
            log({"exp": "e34", "combo": name, "M": M, "K": K, "N": N,
                 "us": dt * 1e6, "tops": macs / dt / 1e12})
        except Exception as e:  # noqa: BLE001
            log({"exp": "e34", "combo": name, "error": repr(e)[:300]})


if __name__ == "__main__":
    main()
