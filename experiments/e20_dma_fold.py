"""e20: DMA-looped folds — single-module mul, batch-size robustness.

The chunked fold emitted cols/512 pallas calls per fold, so module size
scaled with batch and the fully-fused multiply never compiled (remote
service hang/500).  With the chunk loop INSIDE the kernel the program is
batch-size-independent: test whether (a) the single-module mul compiles,
(b) big batches amortize the congested tunnel's per-dispatch cost.
"""
import json
import sys
import time

import numpy as np

OUT = open("experiments/e20_out.jsonl", "a", buffering=1)


def log(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import chained_time
    from stark_rings_tpu.ops.pallas_fold import Mxu2PallasNTT
    from stark_rings_tpu.native.host import HostGoldilocks

    N = 1 << 16
    q = 2**64 - 2**32 + 1
    rng = np.random.default_rng(0)
    log(exp="start", dev=str(jax.devices()[0]))

    hg = HostGoldilocks(N)

    def operands(nb):
        a = jax.device_put(rng.integers(0, q, size=(nb, N), dtype=np.uint64))
        b = jax.device_put(rng.integers(0, q, size=(nb, N), dtype=np.uint64))
        return a, b

    # single-module mul (jit_mul) with DMA folds
    for B in (128, 512, 1024):
        try:
            tp = Mxu2PallasNTT(N, dma_folds=True, fold_chunk=512,
                               pointwise_pallas=True)
            mul = tp.jit_mul()
            a, b = operands(B)
            t0 = time.time()
            out = mul(a, b)
            jax.block_until_ready(out)
            compile_s = time.time() - t0
            want = hg.mul(np.asarray(a[:2]), np.asarray(b[:2]))
            ok = bool(np.array_equal(np.asarray(out[:2]), want))
            dt = chained_time(mul, a, b, depth=4, reps=2)
            log(exp="single", B=B, compile_s=round(compile_s, 1),
                exact=ok, mults_per_s=round(B / dt, 1))
        except Exception as exc:  # noqa
            log(exp="single", B=B, err=f"{type(exc).__name__}: {exc}"[:300])
            break

    # mixed4 staged with DMA folds at big batch
    for B in (512,):
        try:
            tp = Mxu2PallasNTT(N, dma_folds=True, fold_chunk=512,
                               pointwise_pallas=True)
            mul = tp.staged_mul(granularity="mixed4")
            a, b = operands(B)
            t0 = time.time()
            out = mul(a, b)
            jax.block_until_ready(out)
            compile_s = time.time() - t0
            want = hg.mul(np.asarray(a[:2]), np.asarray(b[:2]))
            ok = bool(np.array_equal(np.asarray(out[:2]), want))
            dt = chained_time(mul, a, b, depth=4, reps=2)
            log(exp="mixed4_dma", B=B, compile_s=round(compile_s, 1),
                exact=ok, mults_per_s=round(B / dt, 1))
        except Exception as exc:  # noqa
            log(exp="mixed4_dma", B=B, err=f"{type(exc).__name__}: {exc}"[:300])

    log(exp="done")


if __name__ == "__main__":
    main()
