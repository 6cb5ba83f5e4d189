"""e42b: stark model chain with consts-as-args (tm.mul / tm.mul_t) vs
the closure ring pipeline; frog args re-measure (e42's died on a
transient remote-compile error)."""
import json, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from stark_rings_tpu.ops.model_mul import TModelMul
from stark_rings_tpu.rings import get_ring

OUT = open("/root/repo/experiments/e40_out.jsonl", "a")

def log(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n"); OUT.flush()

def measure(build, B, lo, hi, reps=3):
    cs = jax.jit(lambda x: jnp.bitwise_xor.reduce(
        x.reshape(-1, x.shape[-1]).astype(jnp.uint32)).max())
    t_at = {}
    for k in (lo, hi):
        f, args = build(k)
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

def rand_for(ring, rng, nb):
    f = ring.field
    if f.limbed:
        limbs = rng.integers(0, 1 << 32, size=(nb, ring.D, 8),
                             dtype=np.uint64)
        limbs[..., 7] &= (1 << 26) - 1
        return f.from_canon(jax.device_put(limbs.astype(np.uint32)))
    dt_ = np.uint32 if f.dtype == np.uint32 else np.uint64
    return f.from_canon(jax.device_put(
        rng.integers(0, f.q, size=(nb, ring.D), dtype=dt_)))

# ---- stark ----
ring = get_ring("stark_prime")
tm = TModelMul(ring)
cm = jax.device_put(tm.consts())
rng = np.random.default_rng(1)
B, lo, hi = 4096, 2, 26

def b_pipeline(depth):
    a = rand_for(ring, rng, B)
    bs = [rand_for(ring, rng, B) for _ in range(depth)]
    def fn(x, bs):
        for i in range(depth):
            x = ring.icrt(ring.ntt_mul(ring.crt(x), ring.crt(bs[i])))
        return x
    return jax.jit(fn), (a, bs)

def b_tm_bl(depth):
    a = rand_for(ring, rng, B)
    bs = [rand_for(ring, rng, B) for _ in range(depth)]
    def fn(cc, x, bs):
        for i in range(depth):
            x = tm.mul(x, bs[i], cc)
        return x
    return jax.jit(fn), (cm, a, bs)

def b_tm_t(depth):
    a = jax.device_put(tm.to_t(rand_for(ring, rng, B)))
    bs = [jax.device_put(tm.to_t(rand_for(ring, rng, B)))
          for _ in range(depth)]
    def fn(cc, x, bs):
        for i in range(depth):
            x = tm.mul_t(x, bs[i], cc)
        return x
    return jax.jit(fn), (cm, a, bs)

for name, b in (("stark_pipeline_closure", b_pipeline),
                ("stark_tm_batchleading_args", b_tm_bl),
                ("stark_tm_trailing_args", b_tm_t)):
    try:
        rate, t_at = measure(b, B, lo, hi)
        log(e42b=name, rate_M=round(rate / 1e6, 1),
            t_at={str(k): round(v, 4) for k, v in t_at.items()})
    except Exception as exc:
        log(e42b=name, error=f"{type(exc).__name__}: {exc}"[:200])

# ---- frog args re-measure ----
ring = get_ring("frog")
tm = TModelMul(ring)
cm = jax.device_put(tm.consts())
B, lo, hi = 65536, 2, 34

def b_frog(depth):
    a = jax.device_put(tm.to_t(rand_for(ring, rng, B)))
    bs = [jax.device_put(tm.to_t(rand_for(ring, rng, B)))
          for _ in range(depth)]
    def fn(cc, x, bs):
        for i in range(depth):
            x = tm.mul_t(x, bs[i], cc)
        return x
    return jax.jit(fn), (cm, a, bs)

try:
    rate, t_at = measure(b_frog, B, lo, hi)
    log(e42b="frog_tm_trailing_args", rate_M=round(rate / 1e6, 1),
        t_at={str(k): round(v, 4) for k, v in t_at.items()})
except Exception as exc:
    log(e42b="frog", error=f"{type(exc).__name__}: {exc}"[:200])
