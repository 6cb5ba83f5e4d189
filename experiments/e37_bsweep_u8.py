"""e37: batch sweep for the UNSIGNED fused deg-2^16 multiply.

The signed scheme's sweep picked B=128 (B=256 lost to HBM pressure).
The u8 scheme moves 8/10 of the plane bytes and 8/9 of the bucket
bytes, so the optimum may shift.  Also tries fold_chunk=256 at B=128
(smaller VMEM slots -> more overlap?).
"""
import json
import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")
from bench import chain_rate  # noqa: E402
from stark_rings_tpu.fields import GOLDILOCKS as F  # noqa: E402
from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT  # noqa: E402

OUT = "experiments/e37_out.jsonl"
N = 1 << 16


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    rng = np.random.default_rng(0)

    for B, chunk in ((48, 512), (64, 512), (80, 512)):
        t0 = time.time()
        tp = Mxu2PallasNTT(N, dma_folds=True, pointwise_pallas=True,
                           fuse_pointwise=True, fold_chunk=chunk)
        c = jax.device_put(tp.consts())

        def build(depth):
            aa = jax.device_put(
                rng.integers(0, F.q, size=(B, N), dtype=np.uint64))
            bs = [jax.device_put(
                rng.integers(0, F.q, size=(B, N), dtype=np.uint64))
                for _ in range(depth)]

            def fn(cc, x, bs):
                for i in range(depth):
                    x = tp.mul(x, bs[i], cc)
                return x
            return jax.jit(fn), (c, aa, bs)

        try:
            rate, t_at = chain_rate(build, B, lo=2, hi=6, reps=2)
            log({"exp": "e37", "B": B, "fold_chunk": chunk,
                 "mults_per_s": rate, "us_per_elem": 1e6 * B / rate / B,
                 "setup_s": round(time.time() - t0, 1)})
        except Exception as e:  # noqa: BLE001
            log({"exp": "e37", "B": B, "fold_chunk": chunk,
                 "error": repr(e)[:200]})


if __name__ == "__main__":
    main()
