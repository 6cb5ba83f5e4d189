#!/usr/bin/env python
"""Big-ring folding combine with a cached challenge — the deg-2^16
fixed-operand pattern (e50/e51) through the public surface.

A folding prover repeatedly computes  w' = c * w + v  where c is ONE
challenge ring element fixed for the whole round.  With `precompute`,
c's forward transform is built once; every combine then costs one
forward + fused fold2-product + one inverse (18.8k deg-2^16 combines/s
on chip vs 14.3k for the general multiply, PERF_NOTES "Fixed-operand").

Run:  python examples/bigring_fold.py          (TPU; CPU uses a smaller
                                                degree in interpret mode)
"""

import os
import sys

import numpy as np

import jax

if os.environ.get("SRT_PLATFORM"):  # smoke tests force "cpu" in-process
    jax.config.update("jax_platforms", os.environ["SRT_PLATFORM"])

sys.path.insert(0, ".")

from stark_rings_tpu.fields import GOLDILOCKS as F  # noqa: E402
from stark_rings_tpu.ops.ntt import NTTContext  # noqa: E402
from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT  # noqa: E402


def main():
    on_tpu = jax.default_backend() not in ("cpu",)
    logN, B = (16, 16) if on_tpu else (10, 4)
    N = 1 << logN
    print(f"deg-2^{logN} goldilocks ring, batch {B}, "
          f"backend {jax.default_backend()}")

    tp = Mxu2PallasNTT(N, dma_folds=True, pointwise_pallas=True,
                       fuse_pointwise=True, interpret=not on_tpu)
    c_tab = jax.device_put(tp.consts())

    rng = np.random.default_rng(0)
    w = jax.device_put(rng.integers(0, F.q, (B, N), dtype=np.uint64))
    v = jax.device_put(rng.integers(0, F.q, (B, N), dtype=np.uint64))
    ch = jax.device_put(rng.integers(0, F.q, (1, N), dtype=np.uint64))

    # challenge transform cached ONCE per folding round
    vc = jax.jit(lambda cc, y: tp.precompute(y, cc))(c_tab, ch)

    @jax.jit
    def combine(cc, w, v, vc):
        return F.add(tp.mul_cached(w, vc, cc), v)

    w1 = combine(c_tab, w, v, vc)

    # check against the independent radix NTT path (general multiply)
    ctx = NTTContext(F, N, negacyclic=True)
    want = F.add(ctx.mul(w, np.broadcast_to(np.asarray(ch), w.shape)), v)
    assert np.array_equal(np.asarray(w1), np.asarray(want)), "mismatch"
    print("combine w' = c*w + v exact vs the radix oracle")

    # squaring (folding cross terms) through the same fused kernels
    sq = jax.jit(lambda cc, x: tp.square(x, cc))(c_tab, w)
    assert np.array_equal(np.asarray(sq), np.asarray(ctx.mul(w, w)))
    print("square exact vs the radix oracle")


if __name__ == "__main__":
    main()
