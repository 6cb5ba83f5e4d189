"""e32: BabyBear deg-2^12 multiply — Pallas DMA folds vs XLA folds on
the real chip (BASELINE config 2), in-module chains; exactness gated
vs the XLA-fold path first."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stark_rings_tpu.ops.mxu_bb import MxuBBNTT, _Q  # noqa: E402
from stark_rings_tpu.ops.pallas_fold_bb import MxuBBPallasNTT  # noqa: E402
from bench import chain_rate  # noqa: E402

OUT = open("/root/repo/experiments/e32_out.jsonl", "a")


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

    variants = [("xla_folds", ref)]
    for label, kw in (("pallas_folds", dict(fuse_pointwise=False)),
                      ("pallas_folds_fusedpw", dict(fuse_pointwise=True))):
        try:
            tp = MxuBBPallasNTT(N, **kw)
            got = np.asarray(jax.jit(tp.mul)(a, b))
            assert (got == want).all(), label
            put(check=label, exact=True)
            variants.append((label, tp))
        except Exception as exc:  # noqa
            put(check=label, error=f"{type(exc).__name__}: {exc}")

    for label, tx in variants:
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

        try:
            t0 = time.time()
            rate, tt = chain_rate(build, B, lo=1, hi=5, reps=3)
            put(bench="bb_deg12_mul", path=label, rate=round(rate, 1),
                B=B, t=tt, wall=round(time.time() - t0, 1))
        except Exception as exc:  # noqa
            put(bench="bb_deg12_mul", path=label,
                error=f"{type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
