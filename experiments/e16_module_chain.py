"""e16: does folding the dependency chain INSIDE one jit module beat
per-dispatch chaining when the tunnel serializes dispatches (~25 ms)?

Candidates (deg-2^16 goldilocks):
  radix4_chainN   — N muls inside one module, one dispatch per chain
  mxu2_chainN     — same for the mxu2 XLA-fold path
Risk: the remote compiler on N x graph size.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("experiments/e16_out.jsonl", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def csum_fetch(x):
    cs = jax.jit(lambda v: jnp.bitwise_xor.reduce(
        v.reshape(-1, v.shape[-1])).max())
    return int(jax.device_get(cs(x)))


def timed(fn, a, bs, reps=3):
    x = fn(a, *bs)
    _ = csum_fetch(x)
    best = None
    for r in range(reps):
        t0 = time.perf_counter()
        x = fn(a, *bs)
        _ = csum_fetch(x)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    from stark_rings_tpu.fields import get_field
    from stark_rings_tpu.ops.mxu2 import Mxu2NTT
    from stark_rings_tpu.ops.ntt import get_ntt

    f = get_field("goldilocks")
    N = 1 << 16
    emit(exp="start", dev=str(jax.devices()[0]))
    rng = np.random.default_rng(0)

    for B, depth in ((128, 4), (256, 4)):
        a = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
        bs = [jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
              for _ in range(depth)]

        ctx = get_ntt("goldilocks", N, negacyclic=True)

        def chain_r4(x, *ops):
            for o in ops:
                x = ctx.mul(x, o)
            return x

        try:
            t0 = time.perf_counter()
            fn = jax.jit(chain_r4)
            dt = timed(fn, a, bs)
            emit(exp="radix4_chain", B=B, depth=depth,
                 compile_s=round(time.perf_counter() - t0, 1),
                 mults_per_s=round(B * depth / dt, 1))
        except Exception as exc:  # noqa
            emit(exp="radix4_chain", B=B, depth=depth,
                 err=f"{type(exc).__name__}: {exc}"[:200])

        try:
            tx = Mxu2NTT(N)
            c = jax.device_put(tx.consts())

            def chain_mxu(cc, x, *ops):
                # tables as ARGS: MB-scale constants choke the compiler
                for o in ops:
                    x = tx.mul(x, o, cc)
                return x

            t0 = time.perf_counter()
            jfn = jax.jit(chain_mxu)
            fn = lambda x, *ops: jfn(c, x, *ops)  # noqa: E731
            dt = timed(fn, a, bs)
            emit(exp="mxu2_chain", B=B, depth=depth,
                 compile_s=round(time.perf_counter() - t0, 1),
                 mults_per_s=round(B * depth / dt, 1))
        except Exception as exc:  # noqa
            emit(exp="mxu2_chain", B=B, depth=depth,
                 err=f"{type(exc).__name__}: {exc}"[:200])

    emit(exp="done")


if __name__ == "__main__":
    main()
