"""e49: asymmetric four-step split for the deg-2^16 headline.

e47 measured R=512 level dots at 365 TOPS vs ~200 for the production
R=256 — if a 512x128 split's small level holds a decent rate, the
+25% MAC count could still win.  Sweep n1 in {128, 256, 512} (x
fold_chunk where VMEM-relevant), exactness-gated vs the host oracle.
"""
import json
import sys
import time

import numpy as np

OUT = open("experiments/e49_out.jsonl", "a", buffering=1)


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
    B = 80
    q = 2**64 - 2**32 + 1
    rng = np.random.default_rng(49)
    hg = HostGoldilocks(N)
    log(exp="start", dev=str(jax.devices()[0]), B=B)

    for n1, chunk in ((256, 512), (512, 256), (512, 128), (128, 512)):
        try:
            tp = Mxu2PallasNTT(N, n1=n1, dma_folds=True,
                               pointwise_pallas=True, fuse_pointwise=True,
                               fold_chunk=chunk)
            c = jax.device_put(tp.consts())
            a = rng.integers(0, q, size=(1, N), dtype=np.uint64)
            b = rng.integers(0, q, size=(1, N), dtype=np.uint64)
            got = np.asarray(jax.jit(
                lambda cc, x, y: tp.mul(x, y, cc))(
                c, jax.device_put(a), jax.device_put(b)))
            assert np.array_equal(got, hg.mul(a, b)), "oracle mismatch"

            def build(depth, tp=tp, c=c):
                x = jax.device_put(rng.integers(0, q, size=(B, N),
                                                dtype=np.uint64))
                bs = [jax.device_put(rng.integers(0, q, size=(B, N),
                                                  dtype=np.uint64))
                      for _ in range(depth)]

                def fn(cc, x, bs):
                    for i in range(depth):
                        x = tp.mul(x, bs[i], cc)
                    return x
                return jax.jit(fn), (c, x, bs)

            rate, raw = chain_rate(build, B, lo=2, hi=6, reps=3)
            log(exp="sweep", n1=n1, chunk=chunk,
                mults_per_s=round(rate, 1),
                us_per_elem=round(1e6 / rate, 1),
                raw={k: round(v, 4) for k, v in raw.items()})
        except Exception as exc:  # noqa
            log(exp="sweep", n1=n1, chunk=chunk,
                error=f"{type(exc).__name__}: {str(exc)[:200]}")
    log(exp="done")


if __name__ == "__main__":
    main()
