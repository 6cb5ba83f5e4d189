"""e29b: Ajtai commitment via matvec_t with lazy broadcasts
(ntt_mul_bt), contraction axis major — vs the batch-leading champion."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stark_rings_tpu.ops.model_mul import TModelMul  # noqa: E402
from stark_rings_tpu.rings import get_ring  # noqa: E402
from bench import chain_rate  # noqa: E402

OUT = open("/root/repo/experiments/e29_out.jsonl", "a")


def put(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()


def main():
    import random

    ring = get_ring("goldilocks")
    f = ring.field
    tm = TModelMul(ring)
    n, L, W = 8, 1024, 16
    rng = random.Random(11)
    A = np.asarray(ring.rand_ntt((n, L), rng))
    At = jax.device_put(jnp.moveaxis(jnp.asarray(A), -1, 0))  # [D, n, L]
    Aj = jax.device_put(A)

    def build_mv(depth):
        s = jax.device_put(
            tm.to_t(jnp.asarray(np.asarray(ring.rand_ntt((W, L), rng)))))

        def fn(s):                                    # s [D, W, L]
            for _ in range(depth):
                c = tm.matvec_t(At, s)                # [D, W, n]
                s = tm.ntt_mul_bt(s, c[:, :, 0][:, :, None])
            return s
        return jax.jit(fn), (s,)

    def build_lead(depth):
        s = jax.device_put(np.asarray(ring.rand_ntt((W, L), rng)))

        def fn(s):
            for _ in range(depth):
                prod = ring.ntt_mul(Aj[None], s[:, None])   # [W,n,L,D]
                c = f.sum(prod, axis=2)                     # [W,n,D]
                s = ring.ntt_mul(s, jnp.broadcast_to(c[:, :1], s.shape))
            return s
        return jax.jit(fn), (s,)

    # one-step equality
    s0 = np.asarray(ring.rand_ntt((W, L), rng))
    lead_fn, _ = build_lead(1)
    mv_fn, _ = build_mv(1)
    out_l = ring.decode(lead_fn(jnp.asarray(s0)))
    out_m = ring.decode(tm.from_t(mv_fn(tm.to_t(jnp.asarray(s0)))))
    assert out_l.tolist() == out_m.tolist(), "formulations disagree"
    put(check="e29b one-step equality", ok=True)

    for label, build in (("matvec_t_lazy", build_mv),
                         ("batch_leading", build_lead)):
        t0 = time.time()
        rate, tt = chain_rate(build, W, lo=2, hi=34, reps=3)
        put(bench="ajtai_commit", layout=label, rate=round(rate, 2),
            W=W, t=tt, wall=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
