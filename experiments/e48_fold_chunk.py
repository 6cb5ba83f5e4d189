"""e48: fold_chunk sweep for the big-degree paths.

e47 showed deg-2^18 is fold-dominated (one fold_tw pass 58.6 us/elem vs
23.5 for a dot at 365 TOPS) and the sub-t chunking (chunk=128 < t=512)
costs ~70% more per coefficient than the deg-2^16 whole-tile folds.
Sweep fold_chunk at the bench configs; VMEM bound: vin = 2*K*R*chunk*4B
(deg-2^18: 4 MB @128, 8 MB @256; 512 exceeds the 16 MB budget).
"""
import json
import sys
import time

import numpy as np

OUT = open("experiments/e48_out.jsonl", "a", buffering=1)


def log(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr)


def main():
    import jax

    sys.path.insert(0, ".")
    from bench import chain_rate
    from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT
    from stark_rings_tpu.native.host import HostGoldilocks

    q = 2**64 - 2**32 + 1
    rng = np.random.default_rng(48)
    log(exp="start", dev=str(jax.devices()[0]))

    for logN, B, chunks, fusepw in ((18, 32, (128, 256), True),
                                    (20, 8, (128, 256), False)):
        N = 1 << logN
        hg = HostGoldilocks(N)
        for chunk in chunks:
            try:
                tp = Mxu2PallasNTT(N, dma_folds=True,
                                   pointwise_pallas=True,
                                   fuse_pointwise=fusepw,
                                   fold_chunk=chunk)
                c = jax.device_put(tp.consts())
                # exactness gate
                a = rng.integers(0, q, size=(1, N), dtype=np.uint64)
                b = rng.integers(0, q, size=(1, N), dtype=np.uint64)
                got = np.asarray(jax.jit(
                    lambda cc, x, y: tp.mul(x, y, cc))(
                    c, jax.device_put(a), jax.device_put(b)))
                assert np.array_equal(got, hg.mul(a, b)), "mismatch"

                def build(depth, tp=tp, c=c, B=B, N=N):
                    x = jax.device_put(rng.integers(
                        0, q, size=(B, N), dtype=np.uint64))
                    bs = [jax.device_put(rng.integers(
                        0, q, size=(B, N), dtype=np.uint64))
                        for _ in range(depth)]

                    def fn(cc, x, bs):
                        for i in range(depth):
                            x = tp.mul(x, bs[i], cc)
                        return x
                    return jax.jit(fn), (c, x, bs)

                rate, raw = chain_rate(build, B, lo=1, hi=3, reps=2)
                log(exp="sweep", logN=logN, chunk=chunk, B=B,
                    mults_per_s=round(rate, 1),
                    us_per_elem=round(1e6 / rate, 1),
                    raw={k: round(v, 4) for k, v in raw.items()})
            except Exception as exc:  # noqa
                log(exp="sweep", logN=logN, chunk=chunk,
                    error=f"{type(exc).__name__}: {str(exc)[:200]}")
    log(exp="done")


if __name__ == "__main__":
    main()
