"""e46: reconcile PERF_NOTES (stacked 17.8k @ B=48) vs BENCH_r02
(stacked 13.96k @ B=48 < single 15.5k @ B=96) — VERDICT r2 item 2.

Re-sweeps batch for BOTH candidates with the argument-passed weight
tables (the current production plumbing), in-module depth-differenced.
Whichever truly wins becomes bench.py's headline configuration.
"""
import json
import sys
import time

import numpy as np

OUT = open("experiments/e46_out.jsonl", "a", buffering=1)


def log(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import chain_rate
    from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT

    N = 1 << 16
    q = 2**64 - 2**32 + 1
    rng = np.random.default_rng(46)
    log(exp="start", dev=str(jax.devices()[0]))

    variants = {
        "single": dict(stack_forward=False),
        "stacked": dict(stack_forward=True),
    }
    tps = {}
    for name, kw in variants.items():
        tp = Mxu2PallasNTT(N, dma_folds=True, pointwise_pallas=True,
                           fuse_pointwise=True, **kw)
        tps[name] = (tp, jax.device_put(tp.consts()))

    sweeps = {"single": (64, 80, 96, 112), "stacked": (40, 48, 56, 64)}
    for name, bs in sweeps.items():
        tp, c = tps[name]
        for B in bs:
            def build(depth, B=B, tp=tp, c=c):
                a = jax.device_put(rng.integers(0, q, size=(B, N),
                                                dtype=np.uint64))
                bs_ = [jax.device_put(rng.integers(0, q, size=(B, N),
                                                   dtype=np.uint64))
                       for _ in range(depth)]

                def fn(cc, x, bs_):
                    for i in range(depth):
                        x = tp.mul(x, bs_[i], cc)
                    return x
                return jax.jit(fn), (c, a, bs_)

            try:
                rate, raw = chain_rate(build, B, lo=2, hi=6, reps=3)
                log(exp="sweep", variant=name, B=B,
                    mults_per_s=round(rate, 1),
                    us_per_elem=round(1e6 / rate, 1),
                    raw={k: round(v, 4) for k, v in raw.items()})
            except Exception as exc:  # noqa
                log(exp="sweep", variant=name, B=B,
                    error=f"{type(exc).__name__}: {exc}")
    log(exp="done")


if __name__ == "__main__":
    main()
