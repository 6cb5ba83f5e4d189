#!/usr/bin/env python
"""Benchmark: degree-2^16 Goldilocks negacyclic ring multiplication
throughput on one chip (BASELINE north star / config 1 scaled), plus the
four reference models' fused-CRT multiply rates.

Primary path: the single-module fused multiply — XLA int8 digit matmuls
(pre-scaled signed weights) + DMA-looped Pallas fold kernels with the
mid transpose fused (ops/mxu2.py + ops/pallas_fold.py), bit-exact vs
the native host oracle.  Fallbacks: the XLA-fold variant, then the
round-1 jnp radix-4 path.

Timing is IN-MODULE DEPTH-DIFFERENCED (chain_rate): a dependent chain
of k multiplies with distinct operands inside one jit module, measured
at two depths; the difference cancels the tunnel's per-dispatch round
trip (1-60 ms depending on congestion).  Both repeated calls and
cross-dispatch chains were shown to inflate on this stack
(PERF_NOTES.md "Methodology").

Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np

DEPTH = 8
REPS = 3


def chained_time(mul, a, b, depth=DEPTH, reps=REPS):
    """Checksum-forced dependency-chained timing.

    On this stack `jax.block_until_ready` can return before the device
    finishes multi-dispatch chains (measured rates exceeded HBM
    physics); the only airtight fence is fetching a VALUE that depends
    on every output byte.  Each chain step uses a distinct second
    operand and the measured region ends with device_get of an XOR
    checksum of the final result."""
    import jax
    import jax.numpy as jnp

    csum = jax.jit(lambda x: jnp.bitwise_xor.reduce(
        x.reshape(-1, x.shape[-1])).max())
    x = mul(a, b)
    _ = int(jax.device_get(csum(x)))   # warm incl. checksum graph
    best = None
    for r in range(reps):
        # fresh operand set every rep: no dispatch ever repeats its args
        bs = [jnp.roll(b, 1 + i + r * depth, axis=1) for i in range(depth)]
        jax.block_until_ready(bs)
        t0 = time.perf_counter()
        x = a
        for i in range(depth):
            x = mul(x, bs[i])
        _ = int(jax.device_get(csum(x)))
        dt = (time.perf_counter() - t0) / depth
        best = dt if best is None else min(best, dt)
    return best


def chain_rate(build, B, lo=2, hi=6, reps=3, cap=None):
    """In-module depth-differenced rate: mults/s net of dispatch latency.

    ``build(depth)`` returns (fn, args) where fn runs a DEPENDENT chain
    of ``depth`` multiplies inside ONE jit module (distinct second
    operands, so nothing can be elided).  The tunnel round trip appears
    once per dispatch regardless of depth, so
        per_mul = (t_hi - t_lo) / (hi - lo)
    cancels it exactly — immune to the 25-60 ms congestion episodes that
    made cross-dispatch numbers collapse (PERF_NOTES round 2).

    Robustness (the 2026-08-19 incident): the diff is taken as the
    MEDIAN over paired back-to-back (lo, hi) reps, not as a difference
    of independent per-depth minima — a single congestion spike landing
    on one dispatch then inflates or deflates ONE pair's diff and the
    median discards it, where min-vs-min recorded a 217k "headline" (14x
    physics) in one window.  ``cap`` is a per-path physical ceiling
    (per-stage budget floors, PERF_NOTES): a rate above it triggers one
    fresh measurement round and, if still violated, falls back to the
    conservative whole-dispatch estimate t_hi/hi."""
    import jax
    import jax.numpy as jnp

    cs = jax.jit(lambda x: jnp.bitwise_xor.reduce(
        x.reshape(-1, x.shape[-1])).max())
    fns = {}
    for k in (lo, hi):
        fn, args = build(k)
        out = fn(*args)
        _ = int(jax.device_get(cs(out)))   # warm incl. checksum graph
        fns[k] = (fn, args)

    def once(k):
        fn, args = fns[k]
        t0 = time.perf_counter()
        out = fn(*args)
        _ = int(jax.device_get(cs(out)))
        return time.perf_counter() - t0

    def measure(nreps):
        diffs, tlos, this_ = [], [], []
        for _ in range(nreps):
            tl = once(lo)
            th = once(hi)
            diffs.append(th - tl)
            tlos.append(tl)
            this_.append(th)
        diffs.sort()
        return diffs[(len(diffs) - 1) // 2], min(tlos), min(this_)

    d, tlo, thi = measure(reps)
    per_mul = d / (hi - lo)
    if per_mul <= 0:       # tunnel jitter swamped the diff; be honest
        per_mul = thi / hi
    rate = B / per_mul
    if cap is not None and rate > cap:
        print(f"chain_rate {rate:.0f}/s exceeds the physical cap "
              f"{cap:.0f}/s; remeasuring", file=sys.stderr)
        d, tlo, thi = measure(max(reps, 5))
        per_mul = d / (hi - lo)
        if per_mul <= 0 or B / per_mul > cap:
            per_mul = thi / hi   # conservative: includes dispatch cost
        rate = B / per_mul
    return rate, {lo: tlo, hi: thi}


def tunnel_roundtrip_ms():
    """Warm tiny-op round trip: contextualizes per-dispatch latency on
    this tunnel (healthy ~1 ms; has been observed at 27 ms under load)."""
    import jax
    import jax.numpy as jnp

    t = jax.jit(lambda x: (x * jnp.uint32(3) + jnp.uint32(1)).sum())
    x = jnp.arange(1024, dtype=jnp.uint32)
    _ = int(jax.device_get(t(x)))
    t0 = time.perf_counter()
    _ = int(jax.device_get(t(x)))
    return (time.perf_counter() - t0) * 1e3


def primary(N, B):
    """Measures three single-jit-module paths with in-module chained
    depth-differenced timing (chain_rate): the fused Pallas path (int8
    digit dots + DMA-looped VMEM folds), the XLA-fold variant, and the
    round-1 radix-4 path.  One module per CHAIN means the tunnel's
    per-dispatch latency cancels out of the measurement and, in
    production use, out of the workload itself."""
    import jax

    from stark_rings_tpu.fields import get_field
    from stark_rings_tpu.ops.ntt import get_ntt

    f = get_field("goldilocks")
    rng = np.random.default_rng(0)

    def operands(nb, depth=0):
        aa = jax.device_put(
            rng.integers(0, f.q, size=(nb, N), dtype=np.uint64))
        if not depth:
            bb = jax.device_put(
                rng.integers(0, f.q, size=(nb, N), dtype=np.uint64))
            return aa, bb
        bs = [jax.device_put(
            rng.integers(0, f.q, size=(nb, N), dtype=np.uint64))
            for _ in range(depth)]
        return aa, bs

    rates = {}    # path -> mults/s
    batches = {}  # path -> batch used

    try:
        # fused single-module path: int8 digit dots + DMA-looped Pallas
        # folds with the mid transpose fused into the epilogue and the
        # two forward end-folds fused with the slot product
        from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT

        tp = Mxu2PallasNTT(N, dma_folds=True, pointwise_pallas=True,
                           fuse_pointwise=True)
        c = jax.device_put(tp.consts())

        def build_pallas(depth):
            a, bs = operands(B, depth)

            def fn(cc, x, bs):
                for i in range(depth):
                    x = tp.mul(x, bs[i], cc)
                return x
            return jax.jit(fn), (c, a, bs)

        try:  # bit-exactness vs the native oracle BEFORE recording any
            # rate: a mismatching path must never become the headline
            from stark_rings_tpu.native.host import HostGoldilocks

            a, b = operands(2)
            hg = HostGoldilocks(N)
            got = np.asarray(jax.jit(lambda cc, x, y: tp.mul(x, y, cc))(
                c, a, b))
            assert np.array_equal(got, hg.mul(np.asarray(a),
                                              np.asarray(b))), \
                "mxu2 pallas mismatch vs host oracle"
        except (OSError, ImportError):
            pass
        # cap: the per-stage budget floor is ~45 us/element => <= ~22k
        # mults/s conceivable on this chip (PERF_NOTES); anything above
        # 30k is a congested-window measurement artifact
        rates["mxu2_pallas_single"], _ = chain_rate(build_pallas, B,
                                                    lo=2, hi=8, reps=4,
                                                    cap=30_000)
        batches["mxu2_pallas_single"] = B
    except Exception as exc:  # noqa
        print(f"pallas single failed ({type(exc).__name__}: {exc})",
              file=sys.stderr)
    try:
        # stacked-forward variant (e38): both operands' forward
        # transforms share one dot/fold pair at 2x columns; best at
        # B=40 (effective forward batch 80 = the unstacked sweet spot;
        # e46 re-sweep with argument-passed weights)
        Bs = 40
        ts = Mxu2PallasNTT(N, dma_folds=True, pointwise_pallas=True,
                           fuse_pointwise=True, stack_forward=True)
        cs_tab = jax.device_put(ts.consts())

        def build_stacked(depth):
            a, bs = operands(Bs, depth)

            def fn(cc, x, bs):
                for i in range(depth):
                    x = ts.mul(x, bs[i], cc)
                return x
            return jax.jit(fn), (cs_tab, a, bs)

        try:
            from stark_rings_tpu.native.host import HostGoldilocks

            a, b = operands(2)
            hg = HostGoldilocks(N)
            got = np.asarray(jax.jit(lambda cc, x, y: ts.mul(x, y, cc))(
                cs_tab, a, b))
            assert np.array_equal(got, hg.mul(np.asarray(a),
                                              np.asarray(b))), \
                "stacked mxu2 pallas mismatch vs host oracle"
        except (OSError, ImportError):
            pass
        rates["mxu2_pallas_stacked"], _ = chain_rate(build_stacked, Bs,
                                                     lo=2, hi=8, reps=4,
                                                     cap=30_000)
        batches["mxu2_pallas_stacked"] = Bs
    except Exception as exc:  # noqa
        print(f"pallas stacked failed ({type(exc).__name__}: {exc})",
              file=sys.stderr)
    cached_rate = None
    try:
        # fixed-operand multiply (protocol pattern: many elements times
        # the SAME ring element — gadget columns, challenge powers): the
        # fixed operand's forward transform is precomputed once as raw
        # level-2 bucket planes, every chain step runs 1 forward + fused
        # fold2-product + 1 inverse.  Same fused kernels; one forward
        # removed.  Chain is dependent through x; the constant operand
        # cannot be elided because x changes every step.
        tp_c = tp  # reuse the oracle-gated fused path object
        pre = jax.jit(lambda cc, y: tp_c.precompute(y, cc))
        a0, b0 = operands(B)
        vb = jax.block_until_ready(pre(c, b0))

        try:
            from stark_rings_tpu.native.host import HostGoldilocks

            hg = HostGoldilocks(N)
            got = np.asarray(jax.jit(
                lambda cc, x, v: tp_c.mul_cached(x, v, cc))(c, a0, vb))
            assert np.array_equal(got, hg.mul(np.asarray(a0),
                                              np.asarray(b0))), \
                "mul_cached mismatch vs host oracle"
        except (OSError, ImportError):
            pass

        def build_cached(depth):
            a, _ = operands(B)

            def fn(cc, x, v):
                for _ in range(depth):
                    x = tp_c.mul_cached(x, v, cc)
                return x
            return jax.jit(fn), (c, a, vb)

        cached_rate, _ = chain_rate(build_cached, B, lo=2, hi=8,
                                    reps=4, cap=40_000)
        cached_rate = round(cached_rate, 1)
    except Exception as exc:  # noqa
        print(f"fixed-operand bench failed ({type(exc).__name__}: {exc})",
              file=sys.stderr)
    try:
        from stark_rings_tpu.ops.mxu2 import Mxu2NTT

        tx = Mxu2NTT(N)
        cx = jax.device_put(tx.consts())

        def build_xla(depth):
            a, bs = operands(B, depth)

            def fn(cc, x, bs):
                for i in range(depth):
                    x = tx.mul(x, bs[i], cc)
                return x
            return jax.jit(fn), (cx, a, bs)

        rates["mxu2_xla"], _ = chain_rate(build_xla, B, lo=1, hi=3,
                                          cap=30_000)
        batches["mxu2_xla"] = B
    except Exception as exc:  # noqa
        print(f"mxu2_xla failed ({type(exc).__name__}: {exc})",
              file=sys.stderr)
    try:
        ctx = get_ntt("goldilocks", N, negacyclic=True)

        def build_radix4(depth):
            a, bs = operands(B, depth)

            def fn(x, bs):
                for i in range(depth):
                    x = ctx.mul(x, bs[i])
                return x
            return jax.jit(fn), (a, bs)

        rates["jnp_radix4"], _ = chain_rate(build_radix4, B,
                                            lo=1, hi=3,
                                            cap=30_000)
        batches["jnp_radix4"] = B
    except Exception as exc:  # noqa
        print(f"radix4 failed ({type(exc).__name__}: {exc})",
              file=sys.stderr)
    if not rates:
        raise RuntimeError("all primary paths failed")
    path = max(rates, key=rates.get)

    # NTT-form pointwise rate (folding-prover hot loop): in-module
    # depth-differenced chain of slotwise modmuls.  The XLA chain runs
    # at the measured VPU u64-emulation envelope (~2.2e10 modmuls/s);
    # the Pallas in-kernel chain loses to it and its compile hangs at
    # depth>16 on the remote stack (PERF_NOTES round 2).
    def build_pw(depth):
        a, b = operands(B)

        def fn(x, y):
            for _ in range(depth):
                x = f.mul(x, y)
            return x
        return jax.jit(fn), (a, b)

    pw_rate, _ = chain_rate(build_pw, B, lo=16, hi=64, reps=2,
                            cap=700_000)
    pw_path = "xla"
    all_rates = {k: [batches[k], round(v, 1)] for k, v in rates.items()}
    return (path, rates[path], batches[path], pw_rate, pw_path, all_rates,
            cached_rate)


def babybear_pow2_rate(N=1 << 12, B=4096):
    """BASELINE config 2: BabyBear deg-2^12 batched negacyclic multiply
    via the MXU digit path (ops/mxu_bb.py), in-module chained.
    Operands in Montgomery storage (the ring's native form)."""
    import jax

    from stark_rings_tpu.rings import get_power_ring

    ring = get_power_ring("babybear", N.bit_length() - 1)
    tx = ring.mxu_ctx()
    c = jax.device_put(tx.consts())   # tables as ARGUMENTS: constant-
    #                                   weight dots compile ~2.7x slower
    #                                   on this stack (e41)
    rng = np.random.default_rng(2)
    q = ring.field.q

    def build(depth):
        a = jax.device_put(rng.integers(0, q, size=(B, N),
                                        dtype=np.uint32))
        bs = [jax.device_put(rng.integers(0, q, size=(B, N),
                                          dtype=np.uint32))
              for _ in range(depth)]

        def fn(cc, x, bs):
            for i in range(depth):
                x = tx.mul(x, bs[i], cc)
            return x
        return jax.jit(fn), (c, a, bs)

    try:  # bit-exactness vs the native generic-prime oracle (canonical
        # domain: Montgomery storage decodes at the boundary) BEFORE any
        # rate is recorded
        from stark_rings_tpu.native.host import HostRing

        hr = HostRing("babybear", N)
        a0 = jax.device_put(rng.integers(0, q, size=(2, N),
                                         dtype=np.uint32))
        b0 = jax.device_put(rng.integers(0, q, size=(2, N),
                                         dtype=np.uint32))
        got = np.asarray(ring.field.decode(
            jax.jit(lambda cc, x, y: tx.mul(x, y, cc))(c, a0, b0)),
            dtype=np.uint64)
        assert np.array_equal(got, hr.mul_storage(a0, b0)), \
            "babybear mxu mismatch vs native oracle"
    except (OSError, ImportError):
        pass

    rate, _ = chain_rate(build, B, lo=1, hi=5, reps=2,
                         cap=700_000)
    return round(rate, 1)


def stark_pow2_rate(N=1 << 12, B=256):
    """252-bit stark-prime deg-2^12 negacyclic multiply via the limbed
    MXU four-step (ops/mxu_limb.py MxuLimbNTT), in-module chained —
    beyond-reference capability (its stark_prime model stops at D=16)."""
    import jax
    import jax.numpy as jnp

    from stark_rings_tpu.rings import get_power_ring

    ring = get_power_ring("stark_prime", N.bit_length() - 1)
    tx = ring.mxu_ctx()
    c = jax.device_put(tx.consts())   # tables as ARGUMENTS (e41)
    rng = np.random.default_rng(3)

    def rand(nb):
        limbs = rng.integers(0, 1 << 32, size=(nb, N, 8),
                             dtype=np.uint64).astype(np.uint32)
        limbs[..., 7] &= (1 << 26) - 1        # < q guaranteed
        return jax.device_put(jnp.asarray(limbs))

    def build(depth):
        a = rand(B)
        bs = [rand(B) for _ in range(depth)]

        def fn(cc, x, bs):
            for i in range(depth):
                x = tx.mul(x, bs[i], cc)
            return x
        return jax.jit(fn), (c, a, bs)

    rate, _ = chain_rate(build, B, lo=1, hi=3, reps=2,
                         cap=60_000)
    return round(rate, 1)


def model_rates():
    """Per-reference-model fused-CRT multiply throughput: in-module
    depth-differenced chains of icrt(ntt_mul(crt(x), crt(y))).

    All four models run in the batch-trailing layout
    (ops/model_mul.TModelMul) with the digit tables passed as jit
    arguments: the slot product's elementwise ops get the batch axis
    minor-most (+14-33% over batch-leading, e28), and argument tables
    beat closure constants by 1.2-1.6x (e42/e42b — with them even the
    limbed stark model wins transposed, 30.8M vs 25.4M).  Each model's
    path is gated bit-exact vs the integer spec before its rate is
    recorded."""
    import jax

    from stark_rings_tpu.ops.model_mul import TModelMul
    from stark_rings_tpu.rings import get_ring

    out = {}
    layouts = {}
    # depth spans sized so the differenced signal (hi-lo chain steps)
    # is tens of ms — well above tunnel round-trip jitter.  Small-D
    # steps take ~0.5 ms at these batches, the limbed stark ~3 ms.
    for name, B, lo, hi in (("goldilocks", 65536, 2, 34),
                            ("babybear", 16384, 2, 34),
                            ("frog", 65536, 2, 34),
                            ("stark_prime", 4096, 2, 26)):
        try:
            ring = get_ring(name)
            f = ring.field
            rng = np.random.default_rng(1)
            use_t = True
            tm = TModelMul(ring)

            def rand(nb):
                if f.limbed:
                    limbs = rng.integers(0, 1 << 32, size=(nb, ring.D, 8),
                                         dtype=np.uint64)
                    limbs[..., 7] &= (1 << 26) - 1
                    return f.from_canon(
                        jax.device_put(limbs.astype(np.uint32)))
                dt_ = np.uint32 if f.dtype == np.uint32 else np.uint64
                return f.from_canon(jax.device_put(
                    rng.integers(0, f.q, size=(nb, ring.D), dtype=dt_)))

            # exactness gate vs the integer spec (host oracle) BEFORE
            # any rate is recorded on this path
            a0, b0 = rand(2), rand(2)
            mul1 = (tm.mul if use_t else
                    lambda x, y: ring.icrt(ring.ntt_mul(ring.crt(x),
                                                        ring.crt(y))))
            got = ring.decode(jax.jit(mul1)(a0, b0))
            ai, bi = ring.decode(a0), ring.decode(b0)
            for r in range(2):
                want = ring.spec.coeff_mul([int(v) for v in ai[r]],
                                           [int(v) for v in bi[r]])
                assert [int(v) for v in got[r]] == \
                    [int(v) % ring.q for v in want], \
                    f"{name} model-mul mismatch vs spec"

            # digit tables as jit ARGUMENTS: constant-weight dots
            # compile 1.1-2.7x slower on this stack (e41/e42)
            cm = jax.device_put(tm.consts()) if tm is not None else None

            def build(depth):
                if use_t:
                    a = jax.device_put(tm.to_t(rand(B)))
                    bs = [jax.device_put(tm.to_t(rand(B)))
                          for _ in range(depth)]

                    def fn(cc, x, bs):
                        for i in range(depth):
                            x = tm.mul_t(x, bs[i], cc)
                        return x
                    return jax.jit(fn), (cm, a, bs)
                a = rand(B)
                bs = [rand(B) for _ in range(depth)]

                def fn(x, bs):
                    for i in range(depth):
                        x = ring.icrt(ring.ntt_mul(ring.crt(x),
                                                   ring.crt(bs[i])))
                    return x
                return jax.jit(fn), (a, bs)

            rate, _ = chain_rate(build, B, lo=lo, hi=hi, reps=3,
                                 cap=300e6)
            out[name] = round(rate, 1)
            layouts[name] = "batch_trailing" if use_t else "batch_leading"
        except Exception as exc:  # noqa
            print(f"model {name} failed ({type(exc).__name__}: {exc})",
                  file=sys.stderr)
            out[name] = None
    return out, layouts


def bigdeg_rates():
    """deg-2^18 / 2^20 Goldilocks ring mults via the single-module MXU
    path (sub-t fold chunking) — beyond-reference scale on ONE chip.
    deg-2^20 runs without the fused slot product: its fold2 kernel's
    VMEM footprint (2 operands x 9216 rows) exceeds the chunk budget."""
    import jax

    from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT

    q = 2**64 - 2**32 + 1
    rng = np.random.default_rng(4)
    out = {}
    for logN, B, chunk, fusepw in ((18, 32, 128, True),
                                   (20, 8, 128, False)):
        try:
            N = 1 << logN
            tp = Mxu2PallasNTT(N, dma_folds=True, pointwise_pallas=True,
                               fuse_pointwise=fusepw, fold_chunk=chunk)
            c = jax.device_put(tp.consts())

            def build(depth):
                a = jax.device_put(rng.integers(0, q, size=(B, N),
                                                dtype=np.uint64))
                bs = [jax.device_put(rng.integers(0, q, size=(B, N),
                                                  dtype=np.uint64))
                      for _ in range(depth)]

                def fn(cc, x, bs):
                    for i in range(depth):
                        x = tp.mul(x, bs[i], cc)
                    return x
                return jax.jit(fn), (c, a, bs)

            rate, _ = chain_rate(build, B, lo=1, hi=3, reps=2)
            try:  # exactness vs the native oracle (1 element)
                from stark_rings_tpu.native.host import HostGoldilocks

                hg = HostGoldilocks(N)
                a = jax.device_put(rng.integers(0, q, size=(1, N),
                                                dtype=np.uint64))
                b = jax.device_put(rng.integers(0, q, size=(1, N),
                                                dtype=np.uint64))
                got = np.asarray(jax.jit(
                    lambda cc, x, y: tp.mul(x, y, cc))(c, a, b))
                assert np.array_equal(got, hg.mul(np.asarray(a),
                                                  np.asarray(b)))
            except (OSError, ImportError):
                pass
            out[f"deg2^{logN}"] = round(rate, 1)
        except Exception as exc:  # noqa
            print(f"bigdeg 2^{logN} failed ({type(exc).__name__}: {exc})",
                  file=sys.stderr)
            out[f"deg2^{logN}"] = None
    return out


def mle20_eval_rate():
    """20-var dense-MLE full evaluation via the MXU two-contraction path
    (mle/mxu_eval.py: eval = u^T M v with int8 digit-plane dots) — the
    BASELINE config-4 hot loop.  Measured 22.8k evals/s vs 9.7k for the
    one-kernel Pallas halving path and ~0.2k for the XLA halving loop
    (e30); gated exact vs the Pallas path on chip before the rate is
    recorded."""
    import jax
    import jax.numpy as jnp

    from stark_rings_tpu.fields import GOLDILOCKS as f
    from stark_rings_tpu.mle.mxu_eval import evaluate_goldilocks_mxu
    from stark_rings_tpu.mle.pallas_fix import evaluate_goldilocks_pallas

    nv = 20
    rng = np.random.default_rng(5)
    pts = [np.uint64(int(x)) for x in
           rng.integers(0, f.q, size=(nv,), dtype=np.uint64)]

    ev0 = jax.device_put(rng.integers(0, f.q, size=(1 << nv,),
                                      dtype=np.uint64))
    a = int(jax.device_get(jax.jit(
        lambda e: evaluate_goldilocks_mxu(e, pts))(ev0)))
    b = int(jax.device_get(jax.jit(
        lambda e: evaluate_goldilocks_pallas(e, pts))(ev0)))
    assert a == b, "mxu MLE eval mismatch vs pallas path"

    def build(depth):
        ev = jax.device_put(rng.integers(0, f.q, size=(1 << nv,),
                                         dtype=np.uint64))

        def fn(e):
            for _ in range(depth):
                v = evaluate_goldilocks_mxu(e, pts)
                e = f.add(e, jnp.broadcast_to(v, e.shape))
            return e
        return jax.jit(fn), (ev,)

    # span sized against tunnel noise: each eval is ~30-40 us, so the
    # differenced signal at hi-lo=256 is ~8-10 ms >> the few-ms jitter
    # of a congested tunnel (hi=66 recorded 124.9k once — ABOVE the
    # 8.4 MB/eval HBM bound of ~95k/s, i.e. pure measurement artifact)
    rate, _ = chain_rate(build, 1, lo=2, hi=258, reps=3)
    # physical sanity clamp: one eval reads the 2^20 x 8 B table once
    hbm_ceiling = 800e9 / (8 * (1 << 20))
    if rate > hbm_ceiling:
        print(f"mle rate {rate:.0f}/s exceeds the HBM ceiling "
              f"{hbm_ceiling:.0f}/s; remeasuring with a deeper span",
              file=sys.stderr)
        rate, _ = chain_rate(build, 1, lo=2, hi=514, reps=3)
    return round(rate, 1)


def main():
    if "--tpucheck" in sys.argv:
        # kernel-exactness audit -> TPUCHECK_r{N}.json (benchmarks/tpucheck)
        sys.path.insert(0, "benchmarks")
        import tpucheck

        sys.argv = [a for a in sys.argv if a != "--tpucheck"]
        tpucheck.main()
        return
    N, B = 1 << 16, 80   # e46 re-sweep (u8 scheme, argument weights):
    #                      64/80/96/112 -> 15.0/15.3/15.1/14.2k single;
    #                      stacked peaks at B=40 (15.5k, effective
    #                      forward batch 80).  Both candidates run; the
    #                      chain stays compute-bound through 25 ms
    #                      tunnel-congestion episodes
    try:
        rt_ms = tunnel_roundtrip_ms()
        (path, ring_mults, pb, pw_rate, pw_path, all_rates,
         cached_rate) = primary(N, B)
    except Exception as exc:  # noqa
        print(f"primary bench failed ({type(exc).__name__}: {exc}), "
              "falling back to deg 2^12", file=sys.stderr)
        _fallback(1 << 12, 32)
        return

    butterflies = ring_mults * 3 * (N // 2) * (N.bit_length() - 1)
    models, model_layouts = model_rates()
    try:
        bb_rate = babybear_pow2_rate()
    except Exception as exc:  # noqa
        print(f"babybear pow2 bench failed ({type(exc).__name__}: {exc})",
              file=sys.stderr)
        bb_rate = None
    try:
        sk_rate = stark_pow2_rate()
    except Exception as exc:  # noqa
        print(f"stark pow2 bench failed ({type(exc).__name__}: {exc})",
              file=sys.stderr)
        sk_rate = None
    try:
        bigdeg = bigdeg_rates()
    except Exception as exc:  # noqa
        print(f"bigdeg bench failed ({type(exc).__name__}: {exc})",
              file=sys.stderr)
        bigdeg = None
    try:
        mle_rate = mle20_eval_rate()
    except Exception as exc:  # noqa
        print(f"mle bench failed ({type(exc).__name__}: {exc})",
              file=sys.stderr)
        mle_rate = None

    print(json.dumps({
        "metric": f"goldilocks_deg2^{N.bit_length() - 1}"
                  "_ring_mults_per_sec_per_chip",
        "fallback": False,
        "value": round(ring_mults, 3),
        "unit": "ring mults/s",
        "vs_baseline": round(ring_mults / 5e8, 9),
        "path": path,
        "path_rates_by_batch": all_rates,
        "timing": "in_module_chain_depth_differenced_checksum_forced",
        "tunnel_roundtrip_ms": round(rt_ms, 1),
        "equiv_butterflies_per_sec": round(butterflies, 0),
        "ntt_form_pointwise_ring_mults_per_sec": round(pw_rate, 1),
        "pointwise_path": pw_path,
        "fixed_operand_ring_mults_per_sec": cached_rate,
        "model_crt_mults_per_sec": models,
        "model_crt_layouts": model_layouts,
        "babybear_deg2^12_ring_mults_per_sec": bb_rate,
        "stark_prime_deg2^12_ring_mults_per_sec": sk_rate,
        "goldilocks_bigdeg_ring_mults_per_sec": bigdeg,
        "mle20_full_evaluate_per_sec": mle_rate,
        "mle20_eval_path": "mxu_two_contractions",
        "batch": pb,
        "device": str(__import__("jax").devices()[0]),
    }))


def _fallback(N, B):
    import jax

    from stark_rings_tpu.fields import get_field
    from stark_rings_tpu.ops.ntt import get_ntt

    f = get_field("goldilocks")
    ctx = get_ntt("goldilocks", N, negacyclic=True)
    rng = np.random.default_rng(0)
    a = jax.device_put(rng.integers(0, f.q, size=(B, N), dtype=np.uint64))
    b = jax.device_put(rng.integers(0, f.q, size=(B, N), dtype=np.uint64))
    dt = chained_time(jax.jit(ctx.mul), a, b)
    rate = B / dt
    print(json.dumps({
        "metric": f"goldilocks_deg2^{N.bit_length() - 1}"
                  "_ring_mults_per_sec_per_chip",
        "fallback": True,
        "value": round(rate, 3),
        "unit": "ring mults/s",
        "vs_baseline": round(rate / 5e8, 9),
        "path": "jnp_radix4",
        "batch": B,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
