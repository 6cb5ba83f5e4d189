"""e38c: stacked forward for the BabyBear deg-2^12 fused multiply."""
import json, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from stark_rings_tpu.ops.mxu_bb import MxuBBNTT, _Q
from stark_rings_tpu.ops.pallas_fold_bb import MxuBBPallasNTT

N = 1 << 12
OUT = open("/root/repo/experiments/e38_out.jsonl", "a")

def log(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n"); OUT.flush()

def chain_rate(tp, B, lo=1, hi=5, reps=3):
    rng = np.random.default_rng(0)
    c = jax.device_put(tp.consts())
    cs = jax.jit(lambda x: jnp.bitwise_xor.reduce(
        x.reshape(-1, x.shape[-1])).max())
    t_at = {}
    for k in (lo, hi):
        a = jax.device_put(rng.integers(0, _Q, size=(B, N), dtype=np.uint32))
        bs = [jax.device_put(rng.integers(0, _Q, size=(B, N), dtype=np.uint32))
              for _ in range(k)]
        def fn(cc, x, bs):
            for i in range(k):
                x = tp.mul(x, bs[i], cc)
            return x
        f = jax.jit(fn)
        out = f(c, a, bs); _ = int(jax.device_get(cs(out)))
        best = None
        for _r in range(reps):
            t0 = time.perf_counter()
            out = f(c, a, bs); _ = int(jax.device_get(cs(out)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        t_at[k] = best
    per = (t_at[hi] - t_at[lo]) / (hi - lo)
    if per <= 0:
        per = t_at[hi] / hi
    return B / per, t_at

rng = np.random.default_rng(7)
a = rng.integers(0, _Q, size=(2, N), dtype=np.uint32)
b = rng.integers(0, _Q, size=(2, N), dtype=np.uint32)
want = np.asarray(jax.jit(MxuBBNTT(N).mul)(a, b))
for stack in (False, True):
    tp = MxuBBPallasNTT(N, stack_forward=stack)
    c = jax.device_put(tp.consts())
    got = np.asarray(jax.jit(lambda cc, x, y: tp.mul(x, y, cc))(c, a, b))
    assert np.array_equal(got, want), f"bb oracle mismatch stack={stack}"
    log(gate=f"bb stack={stack}", ok=True)
    for B in ((4096, 2048, 8192) if not stack else (2048, 4096, 1024)):
        rate, t_at = chain_rate(tp, B)
        log(bb=True, stack=stack, B=B, rate=round(rate, 1),
            t_at={str(k): round(v, 4) for k, v in t_at.items()})
