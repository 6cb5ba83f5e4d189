"""e21: why is the DMA-looped fold ~10x slower than the chunked fold?

Isolates: chunked pallas_call fold vs in-kernel-loop fold (fori/unroll),
pure-DMA kernel (no compute), compute-only kernel (no DMA), at the
B=64-equivalent fold shape [K*R, 16384] int32.
"""
import json
import sys
import time

import numpy as np

OUT = open("experiments/e21_out.jsonl", "a", buffering=1)


def log(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr)


def timeit(fn, args_list):
    """min wall time over arg sets, checksum-fenced."""
    import jax
    import jax.numpy as jnp

    cs = jax.jit(lambda x: jnp.bitwise_xor.reduce(x.reshape(-1, 128)).max())
    out = fn(*args_list[0])
    _ = jax.device_get(cs(out if not isinstance(out, tuple) else out[0]))
    best = None
    for args in args_list:
        t0 = time.perf_counter()
        out = fn(*args)
        _ = jax.device_get(cs(out if not isinstance(out, tuple) else out[0]))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stark_rings_tpu.ops.pallas_fold import (
        fold_end, fold_end_dma, _fold_rows, _i32, _when)
    from stark_rings_tpu.ops.mxu2 import K_BUCKETS

    R = 256
    COLS = 16384          # B=64 x t=256
    KR = K_BUCKETS * R
    CH = 512
    NCH = COLS // CH
    rng = np.random.default_rng(0)
    log(exp="start", dev=str(jax.devices()[0]), shape=[KR, COLS])

    def vs(n):
        return [
            (jax.device_put(rng.integers(-2**25, 2**25, size=(KR, COLS),
                                         dtype=np.int32)),)
            for _ in range(n)]

    args = vs(3)

    for name, fn in (
        ("chunked", jax.jit(lambda v: fold_end(v, R))),
        ("dma_fori", jax.jit(lambda v: fold_end_dma(v, R))),
        ("dma_unroll", jax.jit(lambda v: fold_end_dma(v, R, unroll=True))),
    ):
        try:
            t0 = time.time()
            dt = timeit(fn, args)
            log(exp=name, compile_s=round(time.time() - t0, 1),
                ms=round(dt * 1e3, 2),
                gbps=round(KR * COLS * 4 / dt / 1e9, 1))
        except Exception as exc:  # noqa
            log(exp=name, err=f"{type(exc).__name__}: {exc}"[:300])

    # pure-DMA kernel: copy chunks in and straight back out, no compute
    def mk_dma_only():
        def kern(v_hbm, o_hbm, vin, in_sem, out_sem):
            def inc(i, slot):
                i, slot = _i32(i), _i32(slot)
                return pltpu.make_async_copy(
                    v_hbm.at[:, pl.ds(i * CH, CH)], vin.at[slot],
                    in_sem.at[slot])

            def outc(i, slot):
                i, slot = _i32(i), _i32(slot)
                return pltpu.make_async_copy(
                    vin.at[slot], o_hbm.at[:, pl.ds(i * CH, CH)],
                    out_sem.at[slot])

            inc(0, 0).start()

            def body(i, c):
                slot = jax.lax.rem(i, jnp.int32(2))
                nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

                @_when(i + 1 < NCH)
                def _():
                    inc(i + 1, nxt).start()
                inc(i, slot).wait()

                @_when(i >= 2)
                def _():
                    outc(i - 2, slot).wait()
                outc(i, slot).start()
                return c

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(NCH), body,
                              jnp.int32(0))
            for t in range(max(0, NCH - 2), NCH):
                outc(t, t % 2).wait()

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((KR, COLS), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((2, KR, CH), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

    try:
        fn = jax.jit(mk_dma_only())
        t0 = time.time()
        dt = timeit(fn, args)
        log(exp="dma_only", compile_s=round(time.time() - t0, 1),
            ms=round(dt * 1e3, 2),
            gbps=round(2 * KR * COLS * 4 / dt / 1e9, 1))
    except Exception as exc:  # noqa
        log(exp="dma_only", err=f"{type(exc).__name__}: {exc}"[:300])

    # compute-only: one chunk DMA'd in once, folded NCH times in a loop
    def mk_compute_only():
        def kern(v_hbm, olo, ohi, vin, vlo, vhi, sem):
            cp = pltpu.make_async_copy(v_hbm.at[:, pl.ds(_i32(0), CH)],
                                       vin, sem)
            cp.start()
            cp.wait()

            def body(i, c):
                lo, hi = _fold_rows(vin[:], R)
                vlo[:] = lo
                vhi[:] = hi
                return c

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(NCH), body,
                              jnp.int32(0))
            olo[:] = vlo[:]
            ohi[:] = vhi[:]

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
            out_shape=(jax.ShapeDtypeStruct((R, CH), jnp.uint32),) * 2,
            scratch_shapes=[
                pltpu.VMEM((KR, CH), jnp.int32),
                pltpu.VMEM((R, CH), jnp.uint32),
                pltpu.VMEM((R, CH), jnp.uint32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )

    try:
        fn = jax.jit(mk_compute_only())
        t0 = time.time()
        dt = timeit(fn, args)
        log(exp="compute_only", compile_s=round(time.time() - t0, 1),
            ms=round(dt * 1e3, 2))
    except Exception as exc:  # noqa
        log(exp="compute_only", err=f"{type(exc).__name__}: {exc}"[:300])

    log(exp="done")


if __name__ == "__main__":
    main()
