#!/usr/bin/env python
"""e54: evaluate_many W sweep — the 2^20-entry table read (8.4 MB)
amortizes across W points; HBM bound = 95k calls/s ~ 95k*W point-evals/s
until the eq-vector contraction turns compute-bound."""
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bench import chain_rate, setup_jax_cache
    from stark_rings_tpu.fields import GOLDILOCKS as f
    from stark_rings_tpu.mle.mxu_eval import (
        evaluate_goldilocks_mxu, evaluate_many_goldilocks_mxu)

    setup_jax_cache()
    nv = 20
    nrng = np.random.default_rng(11)
    out = {}

    # exactness gate at each W before any rate is recorded
    ev0 = jax.device_put(nrng.integers(0, f.q, size=(1 << nv,),
                                       dtype=np.uint64))
    for W in (16, 32, 64, 128):
        P0 = jax.device_put(nrng.integers(0, f.q, size=(W, nv),
                                          dtype=np.uint64))
        vm = jax.jit(lambda e, P: evaluate_many_goldilocks_mxu(e, P))(
            ev0, P0)
        for w in (0, W - 1):
            v1 = int(jax.device_get(jax.jit(
                lambda e, p: evaluate_goldilocks_mxu(
                    e, [p[i] for i in range(nv)]))(ev0, P0[w])))
            assert int(vm[w]) == v1, (W, w)

        def build(depth):
            ev = jax.device_put(nrng.integers(0, f.q, size=(1 << nv,),
                                              dtype=np.uint64))
            P = jax.device_put(nrng.integers(0, f.q, size=(W, nv),
                                             dtype=np.uint64))

            def fn(ev, P):
                for _ in range(depth):
                    v = evaluate_many_goldilocks_mxu(ev, P)
                    ev = f.add(ev, jnp.broadcast_to(v[0], ev.shape))
                    P = f.add(P, jnp.broadcast_to(v[:1, None], P.shape))
                return ev
            return jax.jit(fn), (ev, P)

        try:
            rate, _ = chain_rate(build, W, lo=2, hi=34, reps=3,
                                 cap=95_000 * W)
            out[f"W{W}"] = round(rate, 1)
        except Exception as exc:  # noqa: BLE001
            print(f"W={W} failed: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
            out[f"W{W}"] = None
        print(f"W={W}: {out[f'W{W}']} point-evals/s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
