"""e27: Pallas full-table MLE evaluation vs the XLA halving loop,
hardware, in-module chained depth-differenced.
"""
import json
import sys
import time

import numpy as np

OUT = open("experiments/e27_out.jsonl", "a", buffering=1)


def log(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import chain_rate
    from stark_rings_tpu.fields import GOLDILOCKS as f
    from stark_rings_tpu.linalg import FieldElems
    from stark_rings_tpu.mle import DenseMLE
    from stark_rings_tpu.mle.pallas_fix import evaluate_goldilocks_pallas

    nv = 20
    rng = np.random.default_rng(0)
    log(exp="start", dev=str(jax.devices()[0]))

    ev0 = jax.device_put(rng.integers(0, f.q, size=(1 << nv,),
                                      dtype=np.uint64))
    pts = [np.uint64(int(x)) for x in
           rng.integers(0, f.q, size=(nv,), dtype=np.uint64)]
    fe = FieldElems(f)

    # exactness on hardware first
    want = jax.jit(lambda e: DenseMLE(fe, nv, e).evaluate(list(pts)))(ev0)
    got = jax.jit(lambda e: evaluate_goldilocks_pallas(e, pts))(ev0)
    ok = int(f.decode(want)) == int(f.decode(got))
    log(exp="exact", ok=bool(ok))

    def build(which):
        def b(depth):
            ev = jax.device_put(rng.integers(0, f.q, size=(1 << nv,),
                                             dtype=np.uint64))

            def fn(e):
                for _ in range(depth):
                    if which == "pallas":
                        v = evaluate_goldilocks_pallas(e, pts)
                    else:
                        v = DenseMLE(fe, nv, e).evaluate(list(pts))
                    e = f.add(e, jnp.broadcast_to(v, e.shape))
                return e
            return jax.jit(fn), (ev,)
        return b

    for which, lo, hi in (("xla", 1, 5), ("pallas", 2, 34)):
        try:
            rate, t_at = chain_rate(build(which), 1, lo=lo, hi=hi, reps=3)
            log(exp=which, evals_per_s=round(rate, 1),
                us_per_eval=round(1e6 / rate, 1),
                t_at={k: round(v * 1e3, 1) for k, v in t_at.items()})
        except Exception as exc:  # noqa
            log(exp=which, err=f"{type(exc).__name__}: {exc}"[:300])

    log(exp="done")


if __name__ == "__main__":
    main()
