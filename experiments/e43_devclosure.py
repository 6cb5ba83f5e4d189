"""e43: bb chain — numpy closure vs DEVICE-array closure vs argument.

If a closed-over jax.Array behaves like an argument (lifted, not
inlined as an HLO literal), the library fix is just device_put-once
inside the cores, and every caller (ring.crt included) gets the fast
version without API changes."""
import json, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from stark_rings_tpu.rings import get_power_ring

ring = get_power_ring("babybear", 12)
tx = ring.mxu_ctx()
q = ring.field.q
N, B = 1 << 12, 4096
OUT = open("/root/repo/experiments/e40_out.jsonl", "a")

def log(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n"); OUT.flush()

def chain(mode, lo=1, hi=5, reps=3):
    rng = np.random.default_rng(2)
    cnp = tx.consts()
    cdev = jax.device_put(cnp)
    cs = jax.jit(lambda x: jnp.bitwise_xor.reduce(
        x.reshape(-1, x.shape[-1])).max())
    t_at = {}
    for k in (lo, hi):
        a = jax.device_put(rng.integers(0, q, size=(B, N), dtype=np.uint32))
        bs = [jax.device_put(rng.integers(0, q, size=(B, N), dtype=np.uint32))
              for _ in range(k)]
        if mode == "arg":
            def fn(cc, x, bs):
                for i in range(k):
                    x = tx.mul(x, bs[i], cc)
                return x
            f = jax.jit(fn); args = (cdev, a, bs)
        else:
            cc = cnp if mode == "np_closure" else cdev
            def fn(x, bs):
                for i in range(k):
                    x = tx.mul(x, bs[i], cc)
                return x
            f = jax.jit(fn); args = (a, bs)
        out = f(*args); _ = int(jax.device_get(cs(out)))
        best = None
        for _r in range(reps):
            t0 = time.perf_counter()
            out = f(*args); _ = int(jax.device_get(cs(out)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        t_at[k] = best
    per = (t_at[hi] - t_at[lo]) / (hi - lo)
    if per <= 0:
        per = t_at[hi] / hi
    return B / per, t_at

for mode in ("np_closure", "dev_closure", "arg"):
    rate, t_at = chain(mode)
    log(e43_mode=mode, rate=round(rate, 1),
        t_at={str(k): round(v, 4) for k, v in t_at.items()})
