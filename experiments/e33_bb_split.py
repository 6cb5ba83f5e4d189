"""e33: BabyBear deg-2^12 four-step split sweep.

e31 showed the [320, 320] level dots at ~8.5 TOPS effective; a more
asymmetric split (n1 = 256 -> [1280, 1280] weight matrices) may use the
MXU better at the cost of more MACs ((N1+N2) grows 128 -> 272).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from stark_rings_tpu.ops.mxu_bb import MxuBBNTT, _Q  # noqa: E402
from stark_rings_tpu.ops.pallas_fold_bb import MxuBBPallasNTT  # noqa: E402
from bench import chain_rate  # noqa: E402

OUT = open("/root/repo/experiments/e33_out.jsonl", "a")


def put(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def main():
    N, B = 1 << 12, 4096
    rng = np.random.default_rng(2)
    ref = MxuBBNTT(N)
    a = jax.device_put(rng.integers(0, _Q, size=(2, N), dtype=np.uint32))
    b = jax.device_put(rng.integers(0, _Q, size=(2, N), dtype=np.uint32))
    want = np.asarray(jax.jit(ref.mul)(a, b))

    for n1, chunk, fusepw in ((64, 2048, True), (256, 512, False),
                              (16, 2048, False), (256, 256, True)):
        label = f"n1={n1},chunk={chunk},fusepw={fusepw}"
        try:
            tx = MxuBBPallasNTT(N, n1=n1, fold_chunk=chunk,
                                fuse_pointwise=fusepw)
            got = np.asarray(jax.jit(tx.mul)(a, b))
            assert (got == want).all(), label
            put(check=label, exact=True)

            def build(depth, tx=tx):
                x = jax.device_put(rng.integers(0, _Q, size=(B, N),
                                                dtype=np.uint32))
                bs = [jax.device_put(rng.integers(0, _Q, size=(B, N),
                                                  dtype=np.uint32))
                      for _ in range(depth)]

                def fn(x, bs):
                    for i in range(depth):
                        x = tx.mul(x, bs[i])
                    return x
                return jax.jit(fn), (x, bs)

            t0 = time.time()
            rate, tt = chain_rate(build, B, lo=1, hi=5, reps=3)
            put(bench="bb_split", config=label, rate=round(rate, 1),
                B=B, t=tt, wall=round(time.time() - t0, 1))
        except Exception as exc:  # noqa
            put(bench="bb_split", config=label,
                error=f"{type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
