"""e28: batch-trailing model multiply vs the batch-leading pipeline.

In-module depth-differenced chain rates (bench.py chain_rate) for all
four models, both layouts, on the real chip.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from stark_rings_tpu.ops.model_mul import TModelMul  # noqa: E402
from stark_rings_tpu.rings import get_ring  # noqa: E402

sys.path.insert(0, "/root/repo")
from bench import chain_rate  # noqa: E402

OUT = open("/root/repo/experiments/e28_out.jsonl", "a")


def put(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def rand_storage(ring, B, rng):
    f = ring.field
    if f.limbed:
        limbs = rng.integers(0, 1 << 32, size=(B, ring.D, 8),
                             dtype=np.uint64)
        limbs[..., 7] &= (1 << 26) - 1
        return f.from_canon(jax.device_put(limbs.astype(np.uint32)))
    dt = np.uint32 if f.dtype == jax.numpy.uint32 else np.uint64
    return f.from_canon(jax.device_put(
        rng.integers(0, f.q, size=(B, ring.D), dtype=dt)))


def run(name, B, lo, hi):
    ring = get_ring(name)
    tm = TModelMul(ring)
    rng = np.random.default_rng(11)

    def build_lead(depth):
        a = rand_storage(ring, B, rng)
        bs = [rand_storage(ring, B, rng) for _ in range(depth)]

        def fn(x, bs):
            for i in range(depth):
                x = ring.icrt(ring.ntt_mul(ring.crt(x), ring.crt(bs[i])))
            return x
        return jax.jit(fn), (a, bs)

    def build_t(depth):
        a = tm.to_t(rand_storage(ring, B, rng))
        bs = [tm.to_t(rand_storage(ring, B, rng)) for _ in range(depth)]

        def fn(x, bs):
            for i in range(depth):
                x = tm.mul_t(x, bs[i])
            return x
        return jax.jit(fn), (jax.device_put(a),
                             [jax.device_put(b) for b in bs])

    t0 = time.time()
    rate_t, tt = chain_rate(build_t, B, lo=lo, hi=hi, reps=3)
    put(model=name, layout="batch_trailing", rate=round(rate_t, 1),
        B=B, lo=lo, hi=hi, t=tt, wall=round(time.time() - t0, 1))
    t0 = time.time()
    rate_l, tl = chain_rate(build_lead, B, lo=lo, hi=hi, reps=3)
    put(model=name, layout="batch_leading", rate=round(rate_l, 1),
        B=B, lo=lo, hi=hi, t=tl, wall=round(time.time() - t0, 1))


def run_pointwise(name, B, lo, hi):
    """NTT-form slotwise chain (the folding-prover hot loop on model
    rings), both layouts."""
    ring = get_ring(name)
    tm = TModelMul(ring)
    rng = np.random.default_rng(13)

    def build_lead(depth):
        a = rand_storage(ring, B, rng)
        bs = [rand_storage(ring, B, rng) for _ in range(depth)]

        def fn(x, bs):
            for i in range(depth):
                x = ring.ntt_mul(x, bs[i])
            return x
        return jax.jit(fn), (a, bs)

    def build_t(depth):
        a = jax.device_put(tm.to_t(rand_storage(ring, B, rng)))
        bs = [jax.device_put(tm.to_t(rand_storage(ring, B, rng)))
              for _ in range(depth)]

        def fn(x, bs):
            for i in range(depth):
                x = tm.ntt_mul_t(x, bs[i])
            return x
        return jax.jit(fn), (a, bs)

    for label, build in (("batch_trailing", build_t),
                         ("batch_leading", build_lead)):
        t0 = time.time()
        rate, tt = chain_rate(build, B, lo=lo, hi=hi, reps=3)
        put(bench="ntt_pointwise", model=name, layout=label,
            rate=round(rate, 1), B=B, t=tt, wall=round(time.time() - t0, 1))


def run_commit():
    """Ajtai commitment (8 x 1024 goldilocks NTT mat-vec), both layouts."""
    import random

    import jax.numpy as jnp

    ring = get_ring("goldilocks")
    f = ring.field
    tm = TModelMul(ring)
    n, L, W = 8, 1024, 16
    rng = random.Random(11)
    A = np.asarray(ring.rand_ntt((n, L), rng))
    At = jax.device_put(jnp.moveaxis(jnp.asarray(A), -1, 0))  # [D, n, L]
    Aj = jax.device_put(A)

    def build_lead(depth):
        s = jax.device_put(np.asarray(ring.rand_ntt((W, L), rng)))

        def fn(s):
            for _ in range(depth):
                prod = ring.ntt_mul(Aj[None], s[:, None])   # [W,n,L,D]
                c = f.sum(prod, axis=2)                     # [W,n,D]
                s = ring.ntt_mul(s, jnp.broadcast_to(c[:, :1], s.shape))
            return s
        return jax.jit(fn), (s,)

    def build_t(depth):
        s = tm.to_t(jax.device_put(np.asarray(ring.rand_ntt((W, L), rng))))

        def fn(s):
            for _ in range(depth):
                c = tm.matvec_t(At, s)                      # [D, W, n]
                s = tm.ntt_mul_t(s, jnp.broadcast_to(
                    c[:, :, :1], s.shape))
            return s
        return jax.jit(fn), (jax.device_put(s),)

    for label, build in (("batch_trailing", build_t),
                         ("batch_leading", build_lead)):
        t0 = time.time()
        rate, tt = chain_rate(build, W, lo=2, hi=34, reps=3)
        put(bench="ajtai_commit", layout=label, rate=round(rate, 2),
            W=W, t=tt, wall=round(time.time() - t0, 1))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "commit"):
        try:
            run_commit()
        except Exception as exc:  # noqa
            put(bench="ajtai_commit", error=f"{type(exc).__name__}: {exc}")
    if which in ("all", "models"):
        for name, B, lo, hi in (("goldilocks", 65536, 2, 34),
                                ("frog", 65536, 2, 34),
                                ("babybear", 16384, 2, 34),
                                ("stark_prime", 4096, 2, 26)):
            try:
                run(name, B, lo, hi)
            except Exception as exc:  # noqa
                put(model=name, error=f"{type(exc).__name__}: {exc}")
    if which in ("all", "pointwise"):
        for name, B, lo, hi in (("goldilocks", 65536, 4, 68),
                                ("babybear", 16384, 4, 68)):
            try:
                run_pointwise(name, B, lo, hi)
            except Exception as exc:  # noqa
                put(bench="ntt_pointwise", model=name,
                    error=f"{type(exc).__name__}: {exc}")
