#!/usr/bin/env python
"""e52: composed folding-step batch sweep on chip (W = 8/16/32).

PROTO_r04 measured 4,544 witness-steps/s at W=16; this probes whether a
bigger witness batch amortizes the per-step fixed costs further (the
commit's matvec intermediate grows linearly with W — W=32 doubles it to
~450 MB, still far under HBM)."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import random

    import jax
    import jax.numpy as jnp

    from bench import chain_rate, setup_jax_cache
    from stark_rings_tpu.protocol import FoldingStep
    from stark_rings_tpu.rings import get_ring

    setup_jax_cache()
    ring = get_ring("goldilocks")
    f = ring.field
    out = {}
    for Wf in (8, 16, 32):
        fs = FoldingStep(ring, n_rows=8, wit_len=1024, base=256)

        def build(depth):
            r2 = random.Random(13)
            cP = jax.device_put(fs.init_tables(r2))
            rt = jax.device_put(
                fs.precompute_challenge(ring.rand_coeff((), r2)))
            s0 = jax.device_put(fs.rand_witness(Wf, r2))
            s1 = jax.device_put(fs.rand_witness(Wf, r2))
            c0 = jax.device_put(fs.tm.to_t(jnp.asarray(
                np.asarray(ring.rand_ntt((Wf, 8), r2)))))
            c1 = jax.device_put(fs.tm.to_t(jnp.asarray(
                np.asarray(ring.rand_ntt((Wf, 8), r2)))))

            def fn(cP, s0, s1, c0, c1, rt):
                for _ in range(depth):
                    o = fs.step(cP, s0, s1, c0, c1, rt)
                    mask = o["ok_l2"].astype(jnp.uint64)[None, :, None]
                    s1 = f.add(s1, mask)
                    s0, c0 = o["s"], o["cd"]
                return s0
            return jax.jit(fn), (cP, s0, s1, c0, c1, rt)

        t0 = time.time()
        try:
            rate, _ = chain_rate(build, Wf, lo=1, hi=5, reps=3)
            out[f"W{Wf}"] = round(rate, 1)
        except Exception as exc:  # noqa: BLE001
            print(f"W={Wf} failed: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
            out[f"W{Wf}"] = None
        print(f"W={Wf}: {out[f'W{Wf}']} witness-steps/s "
              f"({round(time.time() - t0, 1)}s)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
