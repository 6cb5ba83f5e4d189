"""e39: XLA u8 dot efficiency vs weight-matrix size on the v5e.

The goldilocks fused path's [2048, 2560] u8 dots run ~245 TOPS
effective; the babybear path's [256, 256] dots measured ~8.5 TOPS
(e31, signed era).  This probe times bare `jax.lax.dot(w_u8, x_u8)
-> int32` for square-ish weight sizes at a fixed large column count,
in-module depth-differenced (the output feeds the next dot through a
u8 truncation so nothing is elided).

If small-M/K dots are intrinsically slow, the bb lever is NOT tiling —
it's a bigger formulation (or accepting the floor).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

OUT = open("/root/repo/experiments/e39_out.jsonl", "a")


def log(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def rate(M, K, cols, lo=2, hi=10, reps=3):
    rng = np.random.default_rng(0)
    w = jax.device_put(rng.integers(0, 256, size=(M, K), dtype=np.uint8))
    x0 = jax.device_put(rng.integers(0, 256, size=(K, cols),
                                     dtype=np.uint8))
    cs = jax.jit(lambda v: jnp.bitwise_xor.reduce(v.reshape(-1, 128)).max())

    def build(depth):
        def fn(w, x):
            for _ in range(depth):
                v = jax.lax.dot(w, x, preferred_element_type=jnp.int32)
                # feed back as u8: cheap elementwise, forces dependency
                u = (v & 255).astype(jnp.uint8)
                if M < K:
                    u = jnp.tile(u, (-(-K // M), 1))
                x = u[:K]
            return x
        return jax.jit(fn)

    t_at = {}
    for k in (lo, hi):
        f = build(k)
        out = f(w, x0)
        _ = int(jax.device_get(cs(out)))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(w, x0)
            _ = int(jax.device_get(cs(out)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        t_at[k] = best
    per = (t_at[hi] - t_at[lo]) / (hi - lo)
    if per <= 0:
        per = t_at[hi] / hi
    macs = M * K * cols
    return macs / per / 1e12, per


def main():
    cols = 1 << 18
    for M, K in ((256, 256), (512, 512), (1024, 1024), (2048, 2048),
                 (2048, 2560), (256, 1024), (1024, 256)):
        tops, per = rate(M, K, cols)
        log(M=M, K=K, cols=cols, tops=round(tops, 1),
            us_per_dot=round(per * 1e6, 1))


if __name__ == "__main__":
    main()
