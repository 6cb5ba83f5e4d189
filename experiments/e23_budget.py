"""e23: per-stage budget of the single-module mul via in-module chains.

Chains of: (a) dots only, (b) forward transform, (c) mxu2 XLA-fold mul,
(d) pointwise only — each depth-differenced to cancel the tunnel RT.
Solves where the 102 us/elem of e22 goes.
"""
import json
import sys
import time

import numpy as np

OUT = open("experiments/e23_out.jsonl", "a", buffering=1)


def log(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr)


def diff_time(build_chain, lo=2, hi=6, reps=3):
    """build_chain(depth) -> (fn, args); returns per-iter seconds."""
    import jax
    import jax.numpy as jnp

    out = {}
    for k in (lo, hi):
        fn, args = build_chain(k)
        cs = jax.jit(lambda x: jnp.bitwise_xor.reduce(
            x.reshape(-1, x.shape[-1]).astype(jnp.uint32)).max())
        t0 = time.time()
        o = fn(*args)
        _ = jax.device_get(cs(o))
        compile_s = time.time() - t0
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            o = fn(*args)
            _ = jax.device_get(cs(o))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[k] = (compile_s, best)
    per = (out[hi][1] - out[lo][1]) / (hi - lo)
    return per, out


def main():
    import jax
    import jax.numpy as jnp

    from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT
    from stark_rings_tpu.ops.mxu2 import Mxu2NTT

    N = 1 << 16
    B = 128
    q = 2**64 - 2**32 + 1
    rng = np.random.default_rng(2)
    log(exp="start", dev=str(jax.devices()[0]), B=B)

    tp = Mxu2PallasNTT(N, dma_folds=True, pointwise_pallas=True)
    c = jax.device_put(tp.consts())
    a0 = jax.device_put(rng.integers(0, q, size=(B, N), dtype=np.uint64))

    # (a) dots only: chain V = dot(planes(x)); re-enter via bitcast slice
    def dots_chain(depth):
        mat = tp.mat1

        def fn(w, x):
            for _ in range(depth):
                V = jax.lax.dot(w, mat.planes(x),
                                preferred_element_type=jnp.int32)
                # feed int32 planes back as u64 (values irrelevant):
                x = jax.lax.bitcast_convert_type(
                    V[:512].reshape(256, -1, 2), jnp.uint64)[:, :x.shape[1]]
            return x
        xi = a0.reshape(256, -1)
        return jax.jit(fn), (jax.device_put(mat.big), xi)

    # (b) forward transform chain (2 dots + tw-fold-transpose + end-fold)
    def fwd_chain(depth):
        def fn(cc, x):
            for _ in range(depth):
                x = tp.forward(x, cc)
            return x
        return jax.jit(fn), (c, a0)

    # (c) XLA-fold mul chain (no Pallas at all)
    tx = Mxu2NTT(N)
    cx = jax.device_put(tx.consts())

    def xla_mul_chain(depth):
        bs = [jax.device_put(rng.integers(0, q, size=(B, N),
                                          dtype=np.uint64))
              for _ in range(depth)]

        def fn(cc, x, bs):
            for i in range(depth):
                x = tx.mul(x, bs[i], cc)
            return x
        return jax.jit(fn), (cx, a0, bs)

    # (d) pointwise DMA kernel chain
    def pw_chain(depth):
        b1 = jax.device_put(rng.integers(0, q, size=(B, N),
                                         dtype=np.uint64))

        def fn(x, y):
            for _ in range(depth):
                x = tp.pointwise(x, y)
            return x
        return jax.jit(fn), (a0, b1)

    for tag, bc, per_what in (("dots", dots_chain, 1),
                              ("forward", fwd_chain, 1),
                              ("xla_mul", xla_mul_chain, 1),
                              ("pointwise", pw_chain, 1)):
        try:
            per, raw = diff_time(bc)
            log(exp=tag, per_iter_ms=round(per * 1e3, 2),
                us_per_elem=round(per / B * 1e6, 2),
                raw={k: [round(v[0], 1), round(v[1] * 1e3, 1)]
                     for k, v in raw.items()})
        except Exception as exc:  # noqa
            log(exp=tag, err=f"{type(exc).__name__}: {exc}"[:300])

    log(exp="done")


if __name__ == "__main__":
    main()
