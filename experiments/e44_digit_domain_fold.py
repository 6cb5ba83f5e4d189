"""e44: prove or break the "folds must be VPU work" bound (VERDICT r2 #1).

The int32 bucket planes coming out of a digit dot ARE 4 u8 planes by
bitcast, and y = sum_k V_k 2^(8k) (mod q) is a constant-weight linear
map — so the NEXT constant dot can consume the buckets directly with
its weights pre-scaled by 2^(8(k+m)) for plane (k, m): a digit-domain
pipeline that skips the intermediate fold at the cost of a 4x-wider
contraction (32 u8 planes instead of 8).

This experiment builds BOTH pipelines for the SAME linear map
L = W2 @ W1 (no twiddle — isolates fold-vs-dot, both exact and gated
bit-equal):

  (a) dot1 -> fold_end_dma -> dot2(8 planes)   -> fold_end_dma
  (b) dot1 -> bitcast32    -> dot2x(32 planes) -> fold_end_dma

and times them as in-module depth-differenced chains at the bench shape
(R=C=256, B=96 -> cols=24576), plus raw-dot TOPS probes at both widths
and a standalone fold_end_dma chain for the per-pass fold cost.
"""
import json
import sys
import time

import numpy as np

OUT = open("experiments/e44_out.jsonl", "a", buffering=1)


def log(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr)


def diff_time(build_chain, lo=2, hi=6, reps=3):
    import jax
    import jax.numpy as jnp

    out = {}
    for k in (lo, hi):
        fn, args = build_chain(k)
        cs = jax.jit(lambda x: jnp.bitwise_xor.reduce(
            x.reshape(-1, x.shape[-1]).astype(jnp.uint32)).max())
        t0 = time.time()
        o = fn(*args)
        _ = jax.device_get(cs(o))
        compile_s = time.time() - t0
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            o = fn(*args)
            _ = jax.device_get(cs(o))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[k] = (round(compile_s, 1), best)
    per = (out[hi][1] - out[lo][1]) / (hi - lo)
    return per, out


_Q = 2**64 - 2**32 + 1


def build_expanded_weights(m_ints, plane_scales):
    """u8 digit-plane weight matrix for arbitrary per-plane scales.

    big[j*R + r, l*C + c] = byte_j(m[r, c] * plane_scales[l] mod q),
    j in 0..8 (u8 digits of the 64-bit prescaled weight)."""
    m = np.asarray(m_ints, dtype=object)
    R, C = m.shape
    P = len(plane_scales)
    assert P * C * 255 * 255 < 2**31
    big = np.zeros((8 * R, P * C), dtype=np.uint8)
    for l, s in enumerate(plane_scales):
        v = ((m * (s % _Q)) % _Q).astype(np.uint64)
        for k in range(8):
            big[k * R:(k + 1) * R, l * C:(l + 1) * C] = (
                (v >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8)
    return big


def main():
    import jax
    import jax.numpy as jnp

    from stark_rings_tpu.ops.mxu2 import PrescaledMat
    from stark_rings_tpu.ops.pallas_fold import fold_end_dma

    B = 96
    R = C = 256
    cols = B * C
    rng = np.random.default_rng(44)
    log(exp="start", dev=str(jax.devices()[0]), B=B, cols=cols)

    # two random constant matrices (stand-ins for W1/W2; values mod q)
    w1_ints = rng.integers(0, _Q, size=(R, C), dtype=np.uint64)
    w2_ints = rng.integers(0, _Q, size=(R, C), dtype=np.uint64)
    m1 = PrescaledMat(w1_ints.astype(object))
    m2 = PrescaledMat(w2_ints.astype(object))
    # expanded second-level weights: plane (m, k) scale = 2^(8(k+m))
    scales = [pow(2, 8 * (k + m), _Q) for m in range(4) for k in range(8)]
    w2x = build_expanded_weights(w2_ints.astype(object), scales)

    consts = jax.device_put({
        "w1": m1.big, "w2": m2.big, "w2x": w2x})

    def planes32(V):
        """int32 buckets [8R, cols] -> u8 [32*C, cols], order (m, (k, c)).

        int32 buckets are nonnegative (< 2^27): little-endian byte m of
        bucket (k, c) carries weight 2^(8(k+m))."""
        Vb = jax.lax.bitcast_convert_type(V, jnp.uint8)  # [8R, cols, 4]
        return jnp.concatenate([Vb[:, :, m] for m in range(4)], axis=0)

    def step_fold(c, x):
        """(a): dot -> fold -> dot -> fold."""
        V1 = m1.dot(x, c["w1"])
        y = fold_end_dma(V1, R, signed=False)
        V2 = m2.dot(y, c["w2"])
        return fold_end_dma(V2, R, signed=False)

    def step_digit(c, x):
        """(b): dot -> bitcast planes -> expanded dot -> single fold."""
        V1 = m1.dot(x, c["w1"])
        V2 = jax.lax.dot(c["w2x"], planes32(V1),
                         preferred_element_type=jnp.int32)
        return fold_end_dma(V2, R, signed=False)

    x0 = jax.device_put(rng.integers(0, _Q, size=(C, cols),
                                     dtype=np.uint64))

    # -- exactness gate: (a) == (b) on a slice ---------------------------
    xs = x0[:, :512]
    a = jax.jit(lambda c, x: step_fold(c, x))(consts, xs)
    b = jax.jit(lambda c, x: step_digit(c, x))(consts, xs)
    eq = bool(jnp.array_equal(a, b))
    log(exp="exactness_gate", equal=eq)
    assert eq, "digit-domain pipeline mismatch"

    # -- chains -----------------------------------------------------------
    def chain(step):
        def build(depth):
            def fn(c, x):
                for _ in range(depth):
                    x = step(c, x)
                return x
            return jax.jit(fn), (consts, x0)
        return build

    per_a, raw_a = diff_time(chain(step_fold), lo=1, hi=4)
    log(exp="chain_fold_path", us_per_elem=per_a / B * 1e6, raw=raw_a)
    per_b, raw_b = diff_time(chain(step_digit), lo=1, hi=4)
    log(exp="chain_digit_path", us_per_elem=per_b / B * 1e6, raw=raw_b)

    # -- standalone fold chain (per-pass cost at bench shape) -------------
    V0 = jax.jit(lambda c, x: m1.dot(x, c["w1"]))(consts, x0)

    def build_fold_only(depth):
        def fn(V):
            out = None
            for i in range(depth):
                y = fold_end_dma(V + jnp.int32(i), R, signed=False)  # distinct inputs
                out = y if out is None else out ^ y
            return out
        return jax.jit(fn), (V0,)

    per_f, raw_f = diff_time(build_fold_only, lo=1, hi=5)
    log(exp="fold_end_dma_alone", us_per_elem=per_f / B * 1e6, raw=raw_f)

    # -- raw dot TOPS at both widths --------------------------------------
    def build_dot(wkey, in_rows):
        xpl = jax.device_put(rng.integers(0, 255, size=(in_rows, cols),
                                          dtype=np.uint8))

        def build(depth):
            def fn(c, p):
                acc = None
                for i in range(depth):
                    V = jax.lax.dot(c[wkey], p + jnp.uint8(i),
                                    preferred_element_type=jnp.int32)
                    acc = V if acc is None else acc ^ V
                return acc
            return jax.jit(fn), (consts, xpl)
        return build

    for wkey, in_rows in (("w2", 8 * C), ("w2x", 32 * C)):
        per_d, raw_d = diff_time(build_dot(wkey, in_rows), lo=2, hi=8)
        macs = 8 * R * in_rows * cols
        log(exp="raw_dot", w=wkey, in_rows=in_rows,
            us_per_elem=per_d / B * 1e6,
            tops=round(macs / per_d / 1e12, 1), raw=raw_d)

    log(exp="done")


if __name__ == "__main__":
    main()
