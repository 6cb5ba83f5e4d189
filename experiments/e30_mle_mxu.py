"""e30: 20-var dense-MLE full evaluation — MXU two-contraction path
(mle/mxu_eval.py) vs the one-kernel Pallas halving path
(mle/pallas_fix.py), in-module depth-differenced chains."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stark_rings_tpu.fields import GOLDILOCKS as f  # noqa: E402
from stark_rings_tpu.mle.mxu_eval import evaluate_goldilocks_mxu  # noqa: E402
from stark_rings_tpu.mle.pallas_fix import evaluate_goldilocks_pallas  # noqa: E402
from bench import chain_rate  # noqa: E402

OUT = open("/root/repo/experiments/e30_out.jsonl", "a")


def put(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def main():
    nv = 20
    rng = np.random.default_rng(5)
    pts = [np.uint64(int(x)) for x in
           rng.integers(0, f.q, size=(nv,), dtype=np.uint64)]
    ev0 = jax.device_put(rng.integers(0, f.q, size=(1 << nv,),
                                      dtype=np.uint64))

    # exactness on chip first
    a = int(np.asarray(jax.jit(
        lambda e: evaluate_goldilocks_mxu(e, pts))(ev0)))
    b = int(np.asarray(jax.jit(
        lambda e: evaluate_goldilocks_pallas(e, pts))(ev0)))
    assert a == b, (a, b)
    put(check="mxu == pallas on chip", ok=True)

    def make_build(evalfn):
        def build(depth):
            ev = jax.device_put(rng.integers(0, f.q, size=(1 << nv,),
                                             dtype=np.uint64))

            def fn(e):
                for _ in range(depth):
                    v = evalfn(e, pts)
                    e = f.add(e, jnp.broadcast_to(v, e.shape))
                return e
            return jax.jit(fn), (ev,)
        return build

    for label, fn, lo, hi in (
            ("mxu_two_contractions", evaluate_goldilocks_mxu, 2, 66),
            ("pallas_halving", evaluate_goldilocks_pallas, 2, 66)):
        t0 = time.time()
        rate, tt = chain_rate(make_build(fn), 1, lo=lo, hi=hi, reps=3)
        put(bench="mle20_full_eval", path=label, rate=round(rate, 1),
            t=tt, wall=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
