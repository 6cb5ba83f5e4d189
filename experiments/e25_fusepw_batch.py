"""e25: fold_end2_mul fusion (pointwise into the forward end-folds) and
batch-size sweep for the single-module mul, in-module depth-differenced.
"""
import json
import sys
import time

import numpy as np

OUT = open("experiments/e25_out.jsonl", "a", buffering=1)


def log(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr)


def main():
    import jax

    sys.path.insert(0, ".")
    from bench import chain_rate
    from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT
    from stark_rings_tpu.native.host import HostGoldilocks

    N = 1 << 16
    q = 2**64 - 2**32 + 1
    rng = np.random.default_rng(0)
    log(exp="start", dev=str(jax.devices()[0]))
    hg = HostGoldilocks(N)

    for tag, B, kw in (
        ("fusepw_B128", 128, dict(dma_folds=True, pointwise_pallas=True,
                                  fuse_pointwise=True)),
        ("base_B256", 256, dict(dma_folds=True, pointwise_pallas=True)),
        ("fusepw_B256", 256, dict(dma_folds=True, pointwise_pallas=True,
                                  fuse_pointwise=True)),
    ):
        try:
            tp = Mxu2PallasNTT(N, **kw)
            c = jax.device_put(tp.consts())

            def build(depth):
                a = jax.device_put(rng.integers(0, q, size=(B, N),
                                                dtype=np.uint64))
                bs = [jax.device_put(rng.integers(0, q, size=(B, N),
                                                  dtype=np.uint64))
                      for _ in range(depth)]

                def fn(cc, x, bs):
                    for i in range(depth):
                        x = tp.mul(x, bs[i], cc)
                    return x
                return jax.jit(fn), (c, a, bs)

            t0 = time.time()
            rate, t_at = chain_rate(build, B, lo=2, hi=6, reps=3)
            # exactness spot check
            a = jax.device_put(rng.integers(0, q, size=(2, N),
                                            dtype=np.uint64))
            b = jax.device_put(rng.integers(0, q, size=(2, N),
                                            dtype=np.uint64))
            got = np.asarray(jax.jit(
                lambda cc, x, y: tp.mul(x, y, cc))(c, a, b))
            ok = bool(np.array_equal(got, hg.mul(np.asarray(a),
                                                 np.asarray(b))))
            log(exp=tag, B=B, wall_s=round(time.time() - t0, 1), exact=ok,
                mults_per_s=round(rate, 1),
                us_per_elem=round(1e6 / rate, 1) if rate else None,
                t_at={k: round(v * 1e3, 1) for k, v in t_at.items()})
        except Exception as exc:  # noqa
            log(exp=tag, B=B, err=f"{type(exc).__name__}: {exc}"[:300])

    log(exp="done")


if __name__ == "__main__":
    main()
