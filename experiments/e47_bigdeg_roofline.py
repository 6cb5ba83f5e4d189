"""e47: per-stage envelopes for the big-degree paths (VERDICT r2 item 6).

Measures, at the deg-2^18 and deg-2^20 bench configurations:
  * raw u8 digit-dot rate at each level shape (the MXU envelope),
  * one fold pass (fold_tw_dma with the bench fold_chunk) per degree,
  * the full multiply (for cross-checking BENCH numbers),
plus the stark deg-2^12 limbed level dot.  Everything in-module
depth-differenced.  These numbers feed the PERF_NOTES big-degree
roofline section.
"""
import json
import sys
import time

import numpy as np

OUT = open("experiments/e47_out.jsonl", "a", buffering=1)


def log(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr)


def diff_time(build_chain, lo=1, hi=4, reps=3):
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
        out[k] = (round(compile_s, 1), best)
    per = (out[hi][1] - out[lo][1]) / (hi - lo)
    return per, out


_Q = 2**64 - 2**32 + 1


def main():
    import jax
    import jax.numpy as jnp

    from stark_rings_tpu.ops.mxu2 import Mxu2NTT
    from stark_rings_tpu.ops.pallas_fold import fold_tw_dma

    rng = np.random.default_rng(47)
    log(exp="start", dev=str(jax.devices()[0]))

    for logN, B, chunk in ((18, 32, 128), (20, 8, 128)):
        N = 1 << logN
        tx = Mxu2NTT(N)
        R = tx.N1
        cols = B * tx.N2
        c = jax.device_put({"w1": tx.mat1.big})
        twv = jax.lax.bitcast_convert_type(jnp.asarray(tx.tw), jnp.uint32)
        tlo = jax.device_put(twv[..., 0])
        thi = jax.device_put(twv[..., 1])

        # raw level-1 dot
        x0 = jax.device_put(rng.integers(0, _Q, size=(R, cols),
                                         dtype=np.uint64))

        def build_dot(depth):
            def fn(cc, x):
                acc = None
                for i in range(depth):
                    V = tx.mat1.dot(x + jnp.uint64(i), cc["w1"])
                    acc = V if acc is None else acc ^ V
                return acc
            return jax.jit(fn), (c, x0)

        try:
            per, raw = diff_time(build_dot)
            macs = 64 * R * R * cols
            log(exp="raw_dot", logN=logN, R=R, B=B,
                us_per_elem=round(per / B * 1e6, 1),
                tops=round(macs / per / 1e12, 1), raw=raw)
        except Exception as exc:  # noqa
            log(exp="raw_dot", logN=logN, error=f"{exc}")

        # one twiddled fold pass at the bench chunking
        V0 = jax.jit(lambda cc, x: tx.mat1.dot(x, cc["w1"]))(c, x0)

        def build_fold(depth):
            def fn(V):
                out = None
                for i in range(depth):
                    y = fold_tw_dma(V + jnp.int32(i), tlo, thi, R,
                                    chunk=chunk, transpose_out=True,
                                    signed=False)
                    out = y if out is None else out ^ y
                return out
            return jax.jit(fn), (V0,)

        try:
            per, raw = diff_time(build_fold)
            log(exp="fold_tw_pass", logN=logN, chunk=chunk,
                us_per_elem=round(per / B * 1e6, 1), raw=raw)
        except Exception as exc:  # noqa
            log(exp="fold_tw_pass", logN=logN, error=f"{exc}")

    # stark deg-2^12 limbed level dot envelope
    try:
        from stark_rings_tpu.rings import get_power_ring

        ring = get_power_ring("stark_prime", 12)
        tx = ring.mxu_ctx()
        log(exp="stark_ctx", cls=type(tx).__name__,
            note="level dot envelope measured via full-mul minus folds "
                 "is already in PERF_NOTES e31; skipping duplicate")
    except Exception as exc:  # noqa
        log(exp="stark_ctx", error=f"{exc}")

    log(exp="done")


if __name__ == "__main__":
    main()
