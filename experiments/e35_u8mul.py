"""e35: deg-2^16 fused multiply, signed (s8, K=9/P=10) vs unsigned
(u8, K=8/P=8) digit scheme, on chip, in-module depth-differenced.

Expectation from e34 + the stage budget: dots 37 -> ~27us (64/90 MACs
at 94% of the s8 rate), folds lose the bias add/subtract (~15 of 84
ops/coeff).  Exactness is gated against the native host oracle first.
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
from stark_rings_tpu.native.host import HostGoldilocks  # noqa: E402

OUT = "experiments/e35_out.jsonl"
N = 1 << 16
B = 128


def log(rec):
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    rng = np.random.default_rng(0)
    hg = HostGoldilocks(N)

    def operands(nb, depth=0):
        aa = jax.device_put(
            rng.integers(0, F.q, size=(nb, N), dtype=np.uint64))
        if not depth:
            bb = jax.device_put(
                rng.integers(0, F.q, size=(nb, N), dtype=np.uint64))
            return aa, bb
        bs = [jax.device_put(
            rng.integers(0, F.q, size=(nb, N), dtype=np.uint64))
            for _ in range(depth)]
        return aa, bs

    for unsigned in (True, False):
        t0 = time.time()
        tp = Mxu2PallasNTT(N, dma_folds=True, pointwise_pallas=True,
                           fuse_pointwise=True, unsigned=unsigned)
        c = jax.device_put(tp.consts())
        a, b = operands(2)
        got = np.asarray(jax.jit(lambda cc, x, y: tp.mul(x, y, cc))(c, a, b))
        exact = bool(np.array_equal(got, hg.mul(np.asarray(a),
                                                np.asarray(b))))
        log({"exp": "e35", "unsigned": unsigned, "exact": exact,
             "setup_s": round(time.time() - t0, 1)})
        if not exact:
            continue

        def build(depth):
            aa, bs = operands(B, depth)

            def fn(cc, x, bs):
                for i in range(depth):
                    x = tp.mul(x, bs[i], cc)
                return x
            return jax.jit(fn), (c, aa, bs)

        rate, t_at = chain_rate(build, B)
        log({"exp": "e35", "unsigned": unsigned, "mults_per_s": rate,
             "us_per_elem": 1e6 / (rate / B) / B, "t_at": t_at})


if __name__ == "__main__":
    main()
