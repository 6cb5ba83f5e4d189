"""e26: deg-2^18 / 2^20 Goldilocks ring mult via the single-module MXU
path (sub-t fold chunking).  Beyond-reference scale on ONE chip.
"""
import json
import sys
import time

import numpy as np

OUT = open("experiments/e26_out.jsonl", "a", buffering=1)


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
    rng = np.random.default_rng(0)
    log(exp="start", dev=str(jax.devices()[0]))

    for logN, B, chunk, fusepw in ((18, 32, 128, True),
                                   (20, 8, 64, True),
                                   (20, 8, 128, False)):
        tag = f"deg2^{logN}_B{B}_ch{chunk}_f{int(fusepw)}"
        try:
            N = 1 << logN
            t0 = time.time()
            tp = Mxu2PallasNTT(N, dma_folds=True, pointwise_pallas=True,
                               fuse_pointwise=fusepw, fold_chunk=chunk)
            build_s = time.time() - t0
            t0 = time.time()
            c = jax.device_put(tp.consts())
            jax.block_until_ready(c)
            upload_s = time.time() - t0

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
            rate, t_at = chain_rate(build, B, lo=1, hi=3, reps=3)
            wall = time.time() - t0
            # exactness vs the native host oracle
            hg = HostGoldilocks(N)
            a = jax.device_put(rng.integers(0, q, size=(1, N),
                                            dtype=np.uint64))
            b = jax.device_put(rng.integers(0, q, size=(1, N),
                                            dtype=np.uint64))
            got = np.asarray(jax.jit(
                lambda cc, x, y: tp.mul(x, y, cc))(c, a, b))
            ok = bool(np.array_equal(got, hg.mul(np.asarray(a),
                                                 np.asarray(b))))
            log(exp=tag, build_s=round(build_s, 1),
                upload_s=round(upload_s, 1), wall_s=round(wall, 1),
                exact=ok, mults_per_s=round(rate, 1),
                us_per_elem=round(1e6 / rate, 1),
                t_at={k: round(v * 1e3, 1) for k, v in t_at.items()})
        except Exception as exc:  # noqa
            log(exp=tag, err=f"{type(exc).__name__}: {exc}"[:300])

    log(exp="done")


if __name__ == "__main__":
    main()
