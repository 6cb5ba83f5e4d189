#!/usr/bin/env python
"""Time the MXU-v2 hybrid (XLA int8 dots + Pallas folds) on the chip.
All MB-scale tables are jit ARGUMENTS (constants choke the remote
compiler)."""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def rep(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rep(exp="device", dev=str(jax.devices()[0]))
    from stark_rings_tpu.fields import GOLDILOCKS as f
    from stark_rings_tpu.ops.mxu2 import Mxu2NTT
    from stark_rings_tpu.ops.pallas_fold import (
        Mxu2PallasNTT, fold_end, fold_tw, pointwise_mul)

    N = 1 << 16
    t0 = time.perf_counter()
    tp = Mxu2PallasNTT(N)
    rep(exp="build", sec=round(time.perf_counter() - t0, 1))
    rng = np.random.default_rng(0)
    c = tp.consts()

    for B in (32, 64):
        a = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
        b = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))

        try:
            dot1 = jax.jit(lambda w, v: tp.mat1.dot(
                tp._to_internal(v).reshape(256, -1), w))
            V = dot1(c["w1"], a)
            dt = timeit(dot1, c["w1"], a)
            rep(exp="dot1", B=B, us=round(dt * 1e6, 1),
                us_per_elem=round(dt * 1e6 / B, 2))
        except Exception as e:  # noqa
            rep(exp="dot1", B=B, error=f"{type(e).__name__}: {e}"[:300])
            continue
        try:
            lo, hi = tp._tw32["tw"]
            ftw = jax.jit(lambda v, l, h: fold_tw(v, l, h, 256))
            dt = timeit(ftw, V, lo, hi)
            rep(exp="fold_tw", B=B, us=round(dt * 1e6, 1),
                us_per_elem=round(dt * 1e6 / B, 2))
            fe = jax.jit(lambda v: fold_end(v, 256))
            dt = timeit(fe, V)
            rep(exp="fold_end", B=B, us=round(dt * 1e6, 1),
                us_per_elem=round(dt * 1e6 / B, 2))
        except Exception as e:  # noqa
            rep(exp="fold", B=B, error=f"{type(e).__name__}: {e}"[:300])

        try:
            mulp = tp.jit_mul()
            dt = timeit(mulp, a, b)
            rep(exp="mxu2_pallas_mul", B=B, us=round(dt * 1e6, 1),
                us_per_elem=round(dt * 1e6 / B, 2),
                mults_per_s=round(B / dt, 1))
            out = mulp(a, b)
            from stark_rings_tpu.native.host import HostGoldilocks
            hg = HostGoldilocks(N)
            want = hg.mul(np.asarray(a[:2]), np.asarray(b[:2]))
            ok = bool(np.array_equal(np.asarray(out[:2]), want))
            rep(exp="mxu2_pallas_exact", ok=ok)
        except Exception as e:  # noqa
            rep(exp="mxu2_pallas_mul", B=B,
                error=f"{type(e).__name__}: {e}"[:300])

        try:
            base = Mxu2NTT.__dict__  # keep linters calm
            tx = Mxu2NTT(N)
            tx.mat1 = tp.mat1
            tx.mat2 = tp.mat2
            tx.mat1i = tp.mat1i
            tx.mat2i = tp.mat2i
            mulx = tx.jit_mul()
            dt = timeit(mulx, a, b)
            rep(exp="mxu2_xla_mul", B=B, us_per_elem=round(dt * 1e6 / B, 2),
                mults_per_s=round(B / dt, 1))
        except Exception as e:  # noqa
            rep(exp="mxu2_xla_mul", B=B,
                error=f"{type(e).__name__}: {e}"[:300])

        try:
            fa = jax.jit(lambda cc, v: tp.forward_internal(
                tp._to_internal(v), cc))(c, a)

            CH = 16

            def pw_chain(x, y):
                for _ in range(CH):
                    x = pointwise_mul(x, y)
                return x

            pwj = jax.jit(pw_chain)
            dt = timeit(pwj, fa, fa)
            rep(exp="pallas_pointwise_chain", B=B,
                ring_mults_per_s=round(B * CH / dt, 1))
        except Exception as e:  # noqa
            rep(exp="pallas_pointwise_chain", B=B,
                error=f"{type(e).__name__}: {e}"[:300])

    rep(exp="done")


if __name__ == "__main__":
    main()
