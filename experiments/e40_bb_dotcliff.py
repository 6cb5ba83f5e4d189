"""e40: is the bb [256,256] u8 dot the bottleneck, and does block-diag
packing to [512,512] fix the e39 small-dot cliff?

e39 measured bare [256,256] u8 dots at 7.1 TOPS vs [512,512] at 183 —
but the full bb mul's wall time is inconsistent with 6 dots that slow,
so the probe may be poisoned.  Here every chain runs the REAL level
shapes ([256, B*64] data):

  A: level apply (dot + XLA REDC fold), feedback u32 -> next level
  C: dot alone, u8 feedback (e39 replica at the real cols)
  D: block-diag(W, W) [512, 512] dot over column-halved data, same
     useful MACs as C, u8 feedback

If D beats C substantially, the packed-weights trick is worth wiring
into the bb path; if A is much cheaper than C implies, the bare-dot
probes are artifacts and the real module is fine.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stark_rings_tpu.ops.mxu_bb import MxuBBNTT, _Q  # noqa: E402

OUT = open("/root/repo/experiments/e40_out.jsonl", "a")


def log(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def diffrate(build, lo=2, hi=10, reps=3):
    cs = jax.jit(lambda v: jnp.bitwise_xor.reduce(
        v.reshape(-1, v.shape[-1]).astype(jnp.uint32)).max())
    t_at = {}
    for k in (lo, hi):
        f, args = build(k)
        out = f(*args)
        _ = int(jax.device_get(cs(out)))
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            _ = int(jax.device_get(cs(out)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        t_at[k] = best
    per = (t_at[hi] - t_at[lo]) / (hi - lo)
    if per <= 0:
        per = t_at[hi] / hi
    return per, t_at


def main():
    N, B = 1 << 12, 4096
    tx = MxuBBNTT(N)
    core = tx.mat1
    cols = B * tx.N2                       # 262144
    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        rng.integers(0, _Q, size=(core.C, cols), dtype=np.uint32))
    big = jax.device_put(np.asarray(core.big))          # [256, 256] u8
    KR, PC = core.big.shape
    # block-diag(W, W): [512, 512]
    bd = np.zeros((2 * KR, 2 * PC), dtype=np.uint8)
    bd[:KR, :PC] = core.big
    bd[KR:, PC:] = core.big
    bd = jax.device_put(bd)

    # A: dot + fold chain (the real level apply)
    def build_A(depth):
        def fn(w, x):
            for _ in range(depth):
                x = core.fold(jax.lax.dot(
                    w, core.planes(x), preferred_element_type=jnp.int32))
            return x
        return jax.jit(fn), (big, x0)

    per, t_at = diffrate(build_A)
    macs = KR // core.K * PC * cols * core.K  # R*C*cols modMACs* K*P int8
    useful = (KR * PC) * cols
    log(chain="A_dot_fold", us=round(per * 1e6, 1),
        tops_incl_fold=round(useful / per / 1e12, 1),
        t_at={str(k): round(v, 4) for k, v in t_at.items()})

    # C: bare dot, u8 feedback
    def build_C(depth):
        def fn(w, x):
            for _ in range(depth):
                v = jax.lax.dot(w, x, preferred_element_type=jnp.int32)
                x = (v & 255).astype(jnp.uint8)
            return x
        return jax.jit(fn), (big, (x0 & 255).astype(jnp.uint8))

    per, t_at = diffrate(build_C)
    log(chain="C_dot_only", us=round(per * 1e6, 1),
        tops=round(KR * PC * cols / per / 1e12, 1),
        t_at={str(k): round(v, 4) for k, v in t_at.items()})

    # D: block-diag packed dot over column-halved data, u8 feedback
    def build_D(depth):
        def fn(w, x):
            for _ in range(depth):
                v = jax.lax.dot(w, x, preferred_element_type=jnp.int32)
                x = (v & 255).astype(jnp.uint8)
            return x
        xh = (x0 & 255).astype(jnp.uint8)
        xp = jnp.concatenate([xh[:, :cols // 2], xh[:, cols // 2:]],
                             axis=0)                     # [512, cols/2]
        return jax.jit(fn), (bd, xp)

    per, t_at = diffrate(build_D)
    log(chain="D_blockdiag_dot", us=round(per * 1e6, 1),
        useful_tops=round(KR * PC * cols / per / 1e12, 1),
        t_at={str(k): round(v, 4) for k, v in t_at.items()})

    # E: the same bare dot at 4x batch columns (is the cliff about cols?)
    def build_E(depth):
        def fn(w, x):
            for _ in range(depth):
                v = jax.lax.dot(w, x, preferred_element_type=jnp.int32)
                x = (v & 255).astype(jnp.uint8)
            return x
        xw = jnp.tile((x0 & 255).astype(jnp.uint8), (1, 4))
        return jax.jit(fn), (big, xw)

    per, t_at = diffrate(build_E)
    log(chain="E_dot_4xcols", us=round(per * 1e6, 1),
        tops=round(KR * PC * 4 * cols / per / 1e12, 1),
        t_at={str(k): round(v, 4) for k, v in t_at.items()})


if __name__ == "__main__":
    main()
