"""e17: staged_mul granularity "mixed" (5 modules/mul) vs "stage" (13):
does cutting dispatches 2.6x survive the remote compiler and win?"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("experiments/e17_out.jsonl", "a")


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def chained(mul, a, b, depth=8, reps=3):
    cs = jax.jit(lambda x: jnp.bitwise_xor.reduce(
        x.reshape(-1, x.shape[-1])).max())
    x = mul(a, b)
    _ = int(jax.device_get(cs(x)))
    best = None
    for r in range(reps):
        bs = [jnp.roll(b, 1 + i + r * depth, axis=1) for i in range(depth)]
        jax.block_until_ready(bs)
        t0 = time.perf_counter()
        x = a
        for i in range(depth):
            x = mul(x, bs[i])
        _ = int(jax.device_get(cs(x)))
        dt = (time.perf_counter() - t0) / depth
        best = dt if best is None else min(best, dt)
    return best


def main():
    from stark_rings_tpu.fields import get_field
    from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT

    f = get_field("goldilocks")
    N = 1 << 16
    emit(exp="start", dev=str(jax.devices()[0]))
    rng = np.random.default_rng(0)
    tp = Mxu2PallasNTT(N, pointwise_pallas=True)
    ref = None
    for gran in ("stage", "mixed"):
        for B in (32, 64):
            try:
                a = jax.device_put(
                    rng.integers(0, f.q, (B, N), dtype=np.uint64))
                b = jax.device_put(
                    rng.integers(0, f.q, (B, N), dtype=np.uint64))
                mul = tp.staged_mul(granularity=gran)
                t0 = time.perf_counter()
                out = np.asarray(mul(a, b)[:2])
                comp = round(time.perf_counter() - t0, 1)
                from stark_rings_tpu.native.host import HostGoldilocks

                hg = HostGoldilocks(N)
                want = hg.mul(np.asarray(a[:2]), np.asarray(b[:2]))
                assert np.array_equal(out, want), "mismatch!"
                dt = chained(mul, a, b)
                emit(exp="staged", gran=gran, B=B, compile_s=comp,
                     mults_per_s=round(B / dt, 1))
            except Exception as exc:  # noqa
                emit(exp="staged", gran=gran, B=B,
                     err=f"{type(exc).__name__}: {exc}"[:200])
    emit(exp="done")


if __name__ == "__main__":
    main()
