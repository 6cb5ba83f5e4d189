#!/usr/bin/env python
"""e55: one-kernel Pallas sumcheck prover on the real chip.

Gates exactness vs the msb-order XLA oracle at nv=14 (cheap oracle
compile), then rates the nv=20 product prover as an in-module
depth-differenced chain (bench.py chain_rate), plus a W-batched
variant.  Target (VERDICT r4 item 1): >= 1,000 proofs/s for the 2^20
product claim vs the 14.7/s XLA baseline."""
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bench import chain_rate, setup_jax_cache
    from stark_rings_tpu.fields import GOLDILOCKS as f
    from stark_rings_tpu.mle.pallas_sumcheck import (
        sumcheck_prove_batch_goldilocks_pallas,
        sumcheck_prove_goldilocks_pallas)
    from stark_rings_tpu.mle.sumcheck import (
        sumcheck_prove_with_challenges)

    setup_jax_cache()
    nrng = np.random.default_rng(11)
    out = {"device": str(jax.devices()[0])}

    # ---- exactness on chip, nv=14 (both paths cheap to compile) -------
    nv14 = 14
    G = jax.device_put(nrng.integers(0, f.q, size=(1 << nv14,),
                                     dtype=np.uint64))
    H = jax.device_put(nrng.integers(0, f.q, size=(1 << nv14,),
                                     dtype=np.uint64))
    ch14 = [jax.device_put(np.uint64(v)) for v in
            nrng.integers(0, f.q, size=(nv14,), dtype=np.uint64)]
    wm, wg, wh = jax.jit(lambda G, H: sumcheck_prove_with_challenges(
        f, G, H, ch14, order="msb"))(G, H)
    gm, gg, gh = jax.jit(lambda G, H: sumcheck_prove_goldilocks_pallas(
        G, H, ch14))(G, H)
    assert np.array_equal(np.asarray(wm), np.asarray(gm)), "msgs mismatch"
    assert int(wg) == int(gg) and int(wh) == int(gh), "finals mismatch"
    out["exact_nv14"] = True
    print("nv=14 exactness OK", flush=True)

    # ---- nv=20 single-proof rate --------------------------------------
    nv = 20
    ch = [jax.device_put(np.uint64(v)) for v in
          nrng.integers(0, f.q, size=(nv,), dtype=np.uint64)]

    def build(depth):
        G0 = jax.device_put(nrng.integers(0, f.q, size=(1 << nv,),
                                          dtype=np.uint64))
        H0 = jax.device_put(nrng.integers(0, f.q, size=(1 << nv,),
                                          dtype=np.uint64))

        def fn(G, H):
            for _ in range(depth):
                msgs, gv, hv = sumcheck_prove_goldilocks_pallas(G, H, ch)
                G = f.add(G, jnp.broadcast_to(gv, G.shape))
                H = f.add(H, jnp.broadcast_to(f.add(hv, msgs[0, 0]),
                                              H.shape))
            return G
        return jax.jit(fn), (G0, H0)

    # cap: one proof cannot beat its 16 MB table read at ~800 GB/s HBM
    # (~20 us) -> < 50k proofs/s physically
    rate, info = chain_rate(build, 1, lo=2, hi=18, reps=3, cap=50_000)
    out["sumcheck20_pallas_proofs_per_s"] = round(rate, 2)
    out["info"] = info
    print(json.dumps(out), flush=True)

    # ---- W-batched ----------------------------------------------------
    W = 8

    def build_batch(depth):
        Gs = jax.device_put(nrng.integers(0, f.q, size=(W, 1 << nv),
                                          dtype=np.uint64))
        Hs = jax.device_put(nrng.integers(0, f.q, size=(W, 1 << nv),
                                          dtype=np.uint64))

        def fn(Gs, Hs):
            for _ in range(depth):
                msgs, (gv, hv) = sumcheck_prove_batch_goldilocks_pallas(
                    [Gs, Hs], ch)
                Gs = f.add(Gs, jnp.broadcast_to(gv[:, None], Gs.shape))
                Hs = f.add(Hs, jnp.broadcast_to(
                    f.add(hv, msgs[:, 0, 0])[:, None], Hs.shape))
            return Gs
        return jax.jit(fn), (Gs, Hs)

    rate_b, info_b = chain_rate(build_batch, W, lo=1, hi=3, reps=3,
                                cap=50_000 * W)
    out[f"sumcheck20_pallas_batchW{W}_proofs_per_s"] = round(rate_b, 2)
    out["info_batch"] = info_b
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
