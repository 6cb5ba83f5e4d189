"""e31: BabyBear deg-2^12 (BASELINE config 2) stage budget.

In-module depth-differenced costs for: the full multiply, one level
apply (dot + fold), and the dot alone — to see whether Pallas fold
kernels (the gl win) would pay here too.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stark_rings_tpu.rings import get_power_ring  # noqa: E402
from bench import chain_rate  # noqa: E402

OUT = open("/root/repo/experiments/e31_out.jsonl", "a")


def put(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def main():
    N, B = 1 << 12, 4096
    ring = get_power_ring("babybear", 12)
    tx = ring.mxu_ctx()
    q = ring.field.q
    rng = np.random.default_rng(2)
    cols = B * tx.N2               # level apply width

    def ru32(shape):
        return jax.device_put(rng.integers(0, q, size=shape,
                                           dtype=np.uint32))

    def build_mul(depth):
        a = ru32((B, N))
        bs = [ru32((B, N)) for _ in range(depth)]

        def fn(x, bs):
            for i in range(depth):
                x = tx.mul(x, bs[i])
            return x
        return jax.jit(fn), (a, bs)

    def build_apply(depth):
        x = ru32((tx.N1, cols))

        def fn(x):
            for _ in range(depth):
                x = tx.mat1.apply(x)
            return x
        return jax.jit(fn), (x,)

    def build_dot(depth):
        x = ru32((tx.N1, cols))

        def fn(x):
            for _ in range(depth):
                v = tx.mat1.dot(x)
                x = v[:tx.N1].astype(jnp.uint32)   # cheap dependency
            return x
        return jax.jit(fn), (x,)

    for label, build, lo, hi in (("mul", build_mul, 1, 5),
                                 ("level_apply", build_apply, 2, 26),
                                 ("level_dot", build_dot, 2, 26)):
        t0 = time.time()
        rate, tt = chain_rate(build, B, lo=lo, hi=hi, reps=3)
        us_per_step = B / rate * 1e6 if rate else None
        put(bench="bb_stage", stage=label, rate=round(rate, 1),
            us_per_step=round(us_per_step, 1) if us_per_step else None,
            B=B, t=tt, wall=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
