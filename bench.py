#!/usr/bin/env python
"""Benchmark: degree-2^16 Goldilocks negacyclic ring multiplication
throughput on one chip (BASELINE north star / config 1 scaled), plus the
four reference models' fused-CRT multiply rates.

Primary path: the MXU v2 hybrid — XLA int8 digit matmuls (pre-scaled
signed weights) + Pallas VMEM fold/twiddle/pointwise kernels
(ops/mxu2.py + ops/pallas_fold.py), bit-exact vs the native host oracle.
Fallbacks: the staged XLA-fold variant, then the round-1 jnp radix-4
path.

Timing is DEPENDENCY-CHAINED (x = mul(x, b) in sequence): independent
repeated calls on this stack can overlap or be elided by the runtime
and report physically impossible rates (see PERF_NOTES.md round 2).

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
    """Measures BOTH the MXU v2 staged-Pallas path and the radix-4
    single-dispatch path — each at its own best batch size — and
    reports the winner.  The multi-dispatch Pallas path pays ~12 tunnel
    round trips per multiply, so on a congested tunnel the robust
    single-dispatch radix-4 path can win the day."""
    import jax

    from stark_rings_tpu.fields import get_field
    from stark_rings_tpu.ops.ntt import get_ntt

    f = get_field("goldilocks")
    rng = np.random.default_rng(0)

    def operands(nb):
        aa = jax.device_put(
            rng.integers(0, f.q, size=(nb, N), dtype=np.uint64))
        bb = jax.device_put(
            rng.integers(0, f.q, size=(nb, N), dtype=np.uint64))
        return aa, bb

    rates = {}    # path -> mults/s
    batches = {}  # path -> batch used
    ctx = get_ntt("goldilocks", N, negacyclic=True)
    try:
        a, b = operands(B)
        dtc = chained_time(jax.jit(ctx.mul), a, b)
        rates["jnp_radix4"] = B / dtc
        batches["jnp_radix4"] = B
    except Exception as exc:  # noqa
        print(f"radix4 failed ({type(exc).__name__}: {exc})",
              file=sys.stderr)
    try:
        # single-dispatch-per-multiply MXU path (XLA folds): slower than
        # the Pallas folds on a healthy tunnel but immune to the
        # 25 ms/dispatch congestion episodes (one module per multiply)
        from stark_rings_tpu.ops.mxu2 import Mxu2NTT

        XB = 128
        tx = Mxu2NTT(N)
        a, b = operands(XB)
        dtc = chained_time(tx.jit_mul(), a, b, reps=2)
        rates["mxu2_xla"] = XB / dtc
        batches["mxu2_xla"] = XB
    except Exception as exc:  # noqa
        print(f"mxu2_xla failed ({type(exc).__name__}: {exc})",
              file=sys.stderr)
    try:
        from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT

        PB = 64  # with "mixed" granularity dispatch count stays at 5/mul
        tp = Mxu2PallasNTT(N, pointwise_pallas=True)
        mul = tp.staged_mul(granularity="mixed4")
        a, b = operands(PB)
        dtc = chained_time(mul, a, b)
        rates["mxu2_pallas_staged"] = PB / dtc
        batches["mxu2_pallas_staged"] = PB
        try:  # spot-check exactness vs the native oracle
            from stark_rings_tpu.native.host import HostGoldilocks

            hg = HostGoldilocks(N)
            want = hg.mul(np.asarray(a[:2]), np.asarray(b[:2]))
            assert np.array_equal(np.asarray(mul(a, b)[:2]), want), \
                "mxu2 pallas mismatch vs host oracle"
        except (OSError, ImportError):
            pass
    except Exception as exc:  # noqa
        print(f"pallas path failed ({type(exc).__name__}: {exc})",
              file=sys.stderr)
    if not rates:
        raise RuntimeError("all primary paths failed")
    path = max(rates, key=rates.get)

    # NTT-form pointwise rate (folding-prover hot loop): dependent chain
    # of CH multiplies inside ONE module (tunnel-dispatch amortized),
    # checksum-fenced; best of the in-kernel Pallas chain and XLA
    # The XLA chain runs at the measured VPU u64-emulation envelope
    # (~2.2e10 modmuls/s => ~335k deg-2^16 mults/s); the Pallas
    # in-kernel chain (ops/pallas_fold.pointwise_chain) loses to it and
    # its compile hangs at depth>16 on the remote stack, so the bench
    # no longer risks timing out on it (PERF_NOTES round 2).
    CH = 64       # 64 muls per module keeps the chain compute-bound
    a, b = operands(B)

    def _time_chain(pwj, ch):
        import jax.numpy as jnp

        cs = jax.jit(lambda x: jnp.bitwise_xor.reduce(
            x.reshape(-1, x.shape[-1])).max())
        out = pwj(a, b)
        _ = int(jax.device_get(cs(out)))
        t0 = time.perf_counter()
        for _ in range(4):
            out = pwj(out, b)
        _ = int(jax.device_get(cs(out)))
        return 4 * B * ch / (time.perf_counter() - t0)

    def xla_chain(x, y):
        for _ in range(CH):
            x = f.mul(x, y)
        return x

    pw_rate = _time_chain(jax.jit(xla_chain), CH)
    pw_path = "xla"
    all_rates = {k: [batches[k], round(v, 1)] for k, v in rates.items()}
    return path, rates[path], batches[path], pw_rate, pw_path, all_rates


def babybear_pow2_rate(N=1 << 12, B=4096):
    """BASELINE config 2: BabyBear deg-2^12 batched negacyclic multiply
    via the MXU digit path (ops/mxu_bb.py) — all-XLA, one dispatch per
    multiply.  Operands in Montgomery storage (the ring's native form)."""
    import jax

    from stark_rings_tpu.rings import get_power_ring

    ring = get_power_ring("babybear", N.bit_length() - 1)
    tx = ring.mxu_ctx()
    rng = np.random.default_rng(2)
    q = ring.field.q
    a = jax.device_put(rng.integers(0, q, size=(B, N), dtype=np.uint32))
    b = jax.device_put(rng.integers(0, q, size=(B, N), dtype=np.uint32))
    dt = chained_time(tx.jit_mul(), a, b, depth=8, reps=2)
    return round(B / dt, 1)


def stark_pow2_rate(N=1 << 12, B=256):
    """252-bit stark-prime deg-2^12 negacyclic multiply via the limbed
    MXU four-step (ops/mxu_limb.py MxuLimbNTT) — beyond-reference
    capability (its stark_prime model stops at D=16)."""
    import jax
    import jax.numpy as jnp

    from stark_rings_tpu.rings import get_power_ring

    ring = get_power_ring("stark_prime", N.bit_length() - 1)
    tx = ring.mxu_ctx()
    rng = np.random.default_rng(3)
    limbs = rng.integers(0, 1 << 32, size=(2, B, N, 8),
                         dtype=np.uint64).astype(np.uint32)
    limbs[..., 7] &= (1 << 26) - 1        # < q guaranteed
    a = jax.device_put(jnp.asarray(limbs[0]))
    b = jax.device_put(jnp.asarray(limbs[1]))
    dt = chained_time(tx.jit_mul(), a, b, depth=4, reps=2)
    return round(B / dt, 1)


def model_rates():
    """Per-reference-model fused-CRT multiply throughput (batched,
    chained): crt(a), crt(b), slotwise ext mul, icrt."""
    import jax

    from stark_rings_tpu.rings import get_ring

    out = {}
    for name, B in (("goldilocks", 16384), ("babybear", 4096),
                    ("frog", 16384), ("stark_prime", 1024)):
        try:
            ring = get_ring(name)
            f = ring.field
            rng = np.random.default_rng(1)
            if f.limbed:
                limbs = rng.integers(0, 1 << 32, size=(B, ring.D, 8),
                                     dtype=np.uint64)
                limbs[..., 7] &= (1 << 26) - 1
                a = f.from_canon(jax.device_put(limbs.astype(np.uint32)))
                limbs2 = rng.integers(0, 1 << 32, size=(B, ring.D, 8),
                                      dtype=np.uint64)
                limbs2[..., 7] &= (1 << 26) - 1
                b = f.from_canon(jax.device_put(limbs2.astype(np.uint32)))
            else:
                dt_ = np.uint32 if f.dtype == np.uint32 else np.uint64
                a = f.from_canon(jax.device_put(
                    rng.integers(0, f.q, size=(B, ring.D), dtype=dt_)))
                b = f.from_canon(jax.device_put(
                    rng.integers(0, f.q, size=(B, ring.D), dtype=dt_)))

            def mul(x, y, ring=ring):
                return ring.icrt(ring.ntt_mul(ring.crt(x), ring.crt(y)))

            dt = chained_time(jax.jit(mul), a, b, depth=4, reps=2)
            out[name] = round(B / dt, 1)
        except Exception as exc:  # noqa
            print(f"model {name} failed ({type(exc).__name__}: {exc})",
                  file=sys.stderr)
            out[name] = None
    return out


def main():
    N, B = 1 << 16, 128  # B large enough to stay compute-bound even at
    #                      25 ms/dispatch tunnel-congestion episodes
    try:
        rt_ms = tunnel_roundtrip_ms()
        path, ring_mults, pb, pw_rate, pw_path, all_rates = primary(N, B)
    except Exception as exc:  # noqa
        print(f"primary bench failed ({type(exc).__name__}: {exc}), "
              "falling back to deg 2^12", file=sys.stderr)
        _fallback(1 << 12, 32)
        return

    butterflies = ring_mults * 3 * (N // 2) * (N.bit_length() - 1)
    models = model_rates()
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

    print(json.dumps({
        "metric": f"goldilocks_deg2^{N.bit_length() - 1}"
                  "_ring_mults_per_sec_per_chip",
        "fallback": False,
        "value": round(ring_mults, 3),
        "unit": "ring mults/s",
        "vs_baseline": round(ring_mults / 5e8, 9),
        "path": path,
        "path_rates_by_batch": all_rates,
        "timing": "dependency_chained_checksum_forced",
        "tunnel_roundtrip_ms": round(rt_ms, 1),
        "equiv_butterflies_per_sec": round(butterflies, 0),
        "ntt_form_pointwise_ring_mults_per_sec": round(pw_rate, 1),
        "pointwise_path": pw_path,
        "model_crt_mults_per_sec": models,
        "babybear_deg2^12_ring_mults_per_sec": bb_rate,
        "stark_prime_deg2^12_ring_mults_per_sec": sk_rate,
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
