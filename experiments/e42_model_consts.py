"""e42: model-CRT rates with digit tables passed as jit arguments
(tracer-injected into the cores) vs closure constants."""
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

def run(name, B, lo, hi, use_args):
    ring = get_ring(name)
    f = ring.field
    rng = np.random.default_rng(1)
    tm = TModelMul(ring)
    crt_core, icrt_core = tm._crt, tm._icrt
    big_c = np.asarray(crt_core.big)
    big_i = np.asarray(icrt_core.big)
    dt_ = np.uint32 if f.dtype == np.uint32 else np.uint64

    def rand(nb):
        return f.from_canon(jax.device_put(
            rng.integers(0, f.q, size=(nb, ring.D), dtype=dt_)))

    cs = jax.jit(lambda x: jnp.bitwise_xor.reduce(
        x.reshape(-1, x.shape[-1])).max())
    t_at = {}
    args_dev = (jax.device_put(big_c), jax.device_put(big_i))
    for k in (lo, hi):
        a = tm.to_t(rand(B)); bs = [tm.to_t(rand(B)) for _ in range(k)]
        if use_args:
            def fn(bc, bi, x, bs):
                crt_core.big, icrt_core.big = bc, bi
                try:
                    for i in range(k):
                        x = tm.mul_t(x, bs[i])
                finally:
                    crt_core.big, icrt_core.big = big_c, big_i
                return x
            fjit = jax.jit(fn)
            args = args_dev + (a, bs)
        else:
            def fn(x, bs):
                for i in range(k):
                    x = tm.mul_t(x, bs[i])
                return x
            fjit = jax.jit(fn)
            args = (a, bs)
        out = fjit(*args); _ = int(jax.device_get(cs(out)))
        best = None
        for _r in range(3):
            t0 = time.perf_counter()
            out = fjit(*args); _ = int(jax.device_get(cs(out)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        t_at[k] = best
    per = (t_at[hi] - t_at[lo]) / (hi - lo)
    if per <= 0:
        per = t_at[hi] / hi
    return B / per, t_at

for name, B, lo, hi in (("goldilocks", 65536, 2, 34),
                        ("babybear", 16384, 2, 34),
                        ("frog", 65536, 2, 34)):
    for use_args in (False, True):
        rate, t_at = run(name, B, lo, hi, use_args)
        log(e42_model=name, use_args=use_args, rate_M=round(rate/1e6, 1),
            t_at={str(k): round(v, 4) for k, v in t_at.items()})
