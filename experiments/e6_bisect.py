#!/usr/bin/env python
"""Bisect which module shape crashes the remote compiler."""

import json

import numpy as np

import jax
import jax.numpy as jnp


def rep(**kw):
    print(json.dumps(kw), flush=True)


def attempt(name, fn, *args):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
        rep(exp=name, ok=True)
        return True
    except Exception as e:  # noqa
        rep(exp=name, error=f"{type(e).__name__}: {e}"[:160])
        return False


def main():
    rep(exp="device", dev=str(jax.devices()[0]))
    from stark_rings_tpu.fields import GOLDILOCKS as f
    from stark_rings_tpu.ops.pallas_fold import (
        Mxu2PallasNTT, fold_end, fold_tw, pointwise_mul)

    N = 1 << 16
    tp = Mxu2PallasNTT(N)
    c = tp.consts()
    rng = np.random.default_rng(0)
    B = 32
    a = jax.device_put(rng.integers(0, f.q, (B, N), dtype=np.uint64))
    x = tp._to_internal(a)
    lo, hi = tp._tw32["tw"]

    # a) dot alone (known good)
    dot = jax.jit(lambda w, v: tp.mat1.dot(v.reshape(256, -1), w))
    ok = attempt("dot", dot, c["w1"], x)
    V = dot(c["w1"], x) if ok else None

    # b) fold_tw alone (known good)
    ftw = jax.jit(lambda v, l, h: fold_tw(v, l, h, 256))
    attempt("fold_tw", ftw, V, lo, hi)

    # c) dot + fold_tw in ONE module
    both = jax.jit(lambda w, v, l, h: fold_tw(
        tp.mat1.dot(v.reshape(256, -1), w), l, h, 256))
    attempt("dot_plus_fold", both, c["w1"], x, lo, hi)

    # d) _lvl_tw as used in staged_mul (includes reshape back)
    lvl = jax.jit(lambda cc, v: tp._lvl_tw(tp.mat1, v, cc["tw"], cc["w1"]))
    attempt("lvl_tw", lvl, c, x)

    # e) pointwise (4 pallas calls)
    pw = jax.jit(pointwise_mul)
    attempt("pointwise", pw, a, a)

    # f) fold_end alone
    fe = jax.jit(lambda v: fold_end(v, 256))
    attempt("fold_end", fe, V)

    # g) transpose u64
    tr = jax.jit(lambda v: jnp.transpose(v, (2, 1, 0)))
    attempt("transpose", tr, jnp.zeros((256, B, 256), jnp.uint64))

    rep(exp="done")


if __name__ == "__main__":
    main()
