"""e51: challenge multiply — ONE fixed cached operand times a batch.

vs e50's per-element cached operand (168 MB bucket re-read per chain
step), the batch-1 cached state is 2.1 MB broadcast across the live
batch inside the module; hypothesis: approaches square's rate (the
forward saving without the big HBM re-read).
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
    return jax.device_put(rng.integers(0, f.q, (nb, N), dtype=np.uint64))


tp = Mxu2PallasNTT(N, dma_folds=True, pointwise_pallas=True,
                   fuse_pointwise=True)
c = jax.device_put(tp.consts())

from stark_rings_tpu.native.host import HostGoldilocks  # noqa: E402

hg = HostGoldilocks(N)
a0 = operands(4)
ch = operands(1)
v1 = jax.block_until_ready(jax.jit(lambda cc, y: tp.precompute(y, cc))(c, ch))
got = np.asarray(jax.jit(lambda cc, x, v: tp.mul_cached(x, v, cc))(c, a0, v1))
want = hg.mul(np.asarray(a0), np.broadcast_to(np.asarray(ch), a0.shape))
assert np.array_equal(got, want), "challenge mul mismatch vs host oracle"
print("oracle gate passed; cached state "
      f"{v1.size * 4 / 1e6:.1f} MB", file=sys.stderr)

a = operands(B)


def build(depth):
    aa = operands(B)

    def fn(cc, x, v):
        for _ in range(depth):
            x = tp.mul_cached(x, v, cc)
        return x
    return jax.jit(fn), (c, aa, v1)


out = {"rt_ms": round(tunnel_roundtrip_ms(), 1)}
t0 = time.time()
rate, _ = chain_rate(build, B, lo=2, hi=8, reps=4)
out["challenge_mul"] = round(rate, 1)
print(f"challenge_mul: {rate:,.1f} mults/s (wall {time.time()-t0:.0f}s)",
      file=sys.stderr)
print(json.dumps(out))
