"""e29: Ajtai commitment formulations.

e28 showed the transposed mat-vec loses 3x because the contraction axis
(L=1024) lands minor-most and the sum becomes cross-lane.  Here the
contraction-major arrangement: values live as [D, m, W] (contraction m
MAJOR, witness batch W minor), the product tensor is [D, m, W, n] and
the reduction runs over axis 1 — lane-parallel — with (W, n) = 128
lanes minor.
"""

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
    D = ring.D
    A = np.asarray(ring.rand_ntt((n, L), rng))
    # contraction-major constant: [D, m, n]
    Am = jax.device_put(jnp.transpose(jnp.moveaxis(jnp.asarray(A), -1, 0),
                                      (0, 2, 1)))
    Aj = jax.device_put(A)

    def s_cm(s_np):
        """[W, L, D] -> [D, m, W]."""
        return jnp.transpose(jnp.asarray(s_np), (2, 1, 0))

    def build_cm(depth):
        s = jax.device_put(s_cm(np.asarray(ring.rand_ntt((W, L), rng))))

        def fn(s):
            for _ in range(depth):
                prod = tm.ntt_mul_t(
                    jnp.broadcast_to(Am[:, :, None, :], (D, L, W, n))
                    .reshape(D, -1),
                    jnp.broadcast_to(s[:, :, :, None], (D, L, W, n))
                    .reshape(D, -1)).reshape(D, L, W, n)
                c = f.sum(prod, axis=1)               # [D, W, n]
                s = tm.ntt_mul_t(s, jnp.broadcast_to(
                    c[:, None, :, 0], s.shape))
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

    # correctness cross-check (one step, both formulations)
    s0 = np.asarray(ring.rand_ntt((W, L), rng))
    lead_fn, _ = build_lead(1)
    cm_fn, _ = build_cm(1)
    out_l = ring.decode(lead_fn(jnp.asarray(s0)))
    out_c = ring.decode(jnp.transpose(cm_fn(s_cm(s0)), (2, 1, 0)))
    assert out_l.tolist() == out_c.tolist(), "formulations disagree"
    put(check="one-step equality", ok=True)

    for label, build in (("contraction_major", build_cm),
                         ("batch_leading", build_lead)):
        t0 = time.time()
        rate, tt = chain_rate(build, W, lo=2, hi=34, reps=3)
        put(bench="ajtai_commit", layout=label, rate=round(rate, 2),
            W=W, t=tt, wall=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
