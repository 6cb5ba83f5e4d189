"""e50: fixed-operand (cached-transform) multiply rate on the real chip.

Hypothesis: caching the fixed operand's forward transform (raw level-2
bucket planes feeding fold_end2_mul_dma) removes one of the three
transforms -> ~3/2 the full-mul rate at the same batch.

Measures, in-module depth-differenced (bench.chain_rate):
  * full fused mul (control, should reproduce ~15.3k at B=80)
  * mul_cached with one fixed operand
  * square (fa reused as both fold2 operands)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

from bench import chain_rate, tunnel_roundtrip_ms  # noqa: E402
from stark_rings_tpu.fields import get_field  # noqa: E402
from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT  # noqa: E402

N, B = 1 << 16, 80
f = get_field("goldilocks")
rng = np.random.default_rng(0)


def operands(nb):
    return (jax.device_put(rng.integers(0, f.q, (nb, N), dtype=np.uint64)),
            jax.device_put(rng.integers(0, f.q, (nb, N), dtype=np.uint64)))


tp = Mxu2PallasNTT(N, dma_folds=True, pointwise_pallas=True,
                   fuse_pointwise=True)
c = jax.device_put(tp.consts())

# correctness gate vs host oracle
from stark_rings_tpu.native.host import HostGoldilocks  # noqa: E402

hg = HostGoldilocks(N)
a0, b0 = operands(4)
vb = jax.block_until_ready(jax.jit(lambda cc, y: tp.precompute(y, cc))(c, b0))
got = np.asarray(jax.jit(lambda cc, x, v: tp.mul_cached(x, v, cc))(c, a0, vb))
want = hg.mul(np.asarray(a0), np.asarray(b0))
assert np.array_equal(got, want), "mul_cached mismatch vs host oracle"
gots = np.asarray(jax.jit(lambda cc, x: tp.square(x, cc))(c, a0))
wants = hg.mul(np.asarray(a0), np.asarray(a0))
assert np.array_equal(gots, wants), "square mismatch vs host oracle"
print("oracle gate passed", file=sys.stderr)

a, b = operands(B)
vbB = jax.block_until_ready(
    jax.jit(lambda cc, y: tp.precompute(y, cc))(c, b))
print(f"cached state: {vbB.shape} {vbB.dtype} "
      f"{vbB.size * vbB.dtype.itemsize / 1e6:.0f} MB", file=sys.stderr)


def build_full(depth):
    aa, _ = operands(B)
    bs = [operands(B)[1] for _ in range(depth)]

    def fn(cc, x, bs):
        for i in range(depth):
            x = tp.mul(x, bs[i], cc)
        return x
    return jax.jit(fn), (c, aa, bs)


def build_cached(depth):
    aa, _ = operands(B)

    def fn(cc, x, v):
        for _ in range(depth):
            x = tp.mul_cached(x, v, cc)
        return x
    return jax.jit(fn), (c, aa, vbB)


def build_square(depth):
    aa, _ = operands(B)

    def fn(cc, x):
        for _ in range(depth):
            x = tp.square(x, cc)
        return x
    return jax.jit(fn), (c, aa)


out = {"rt_ms": round(tunnel_roundtrip_ms(), 1)}
for name, build in (("full", build_full), ("cached", build_cached),
                    ("square", build_square)):
    t0 = time.time()
    rate, t_at = chain_rate(build, B, lo=2, hi=8, reps=4)
    out[name] = round(rate, 1)
    out[name + "_us_per_el"] = round(1e6 * B / rate / B, 1)
    print(f"{name}: {rate:,.1f} mults/s  "
          f"({1e6 / (rate / B):.1f} us/batch-el; wall {time.time()-t0:.0f}s)",
          file=sys.stderr)
print(json.dumps(out))
