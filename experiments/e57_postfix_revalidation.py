#!/usr/bin/env python
"""e57: on-chip revalidation after the r5 review fixes.

1. The field-parametric sumcheck kernel refactor (gl path, new HLO):
   nv=14 exactness vs the msb oracle + nv=20 rate (expect the
   2.2-3.0k band), plus a first BabyBear nv=20 rate.
2. The commit-threshold fix: re-measure the three folding_step keys on
   the SINGLE-BLOCK path the heuristic now selects at W<=16 (e56's
   numbers measured the blocked path by accident) and patch
   PROTO_r05.json.
"""
import json
import pathlib
import random
import sys

import numpy as np

sys.path.insert(0, ".")

ARTIFACT = pathlib.Path("benchmarks/PROTO_r05.json")


def main():
    import jax
    import jax.numpy as jnp

    from bench import chain_rate, setup_jax_cache
    from stark_rings_tpu.fields import GOLDILOCKS as f, get_field
    from stark_rings_tpu.mle.pallas_sumcheck import (
        sumcheck_prove_goldilocks_pallas, sumcheck_prove_many_pallas)
    from stark_rings_tpu.mle.sumcheck import (
        sumcheck_prove_with_challenges)
    from stark_rings_tpu.protocol import FoldingStep
    from stark_rings_tpu.rings import get_ring

    setup_jax_cache()
    nrng = np.random.default_rng(11)
    out = {"device": str(jax.devices()[0])}

    # ---- 1a. refactored kernel exactness on chip (nv=14) --------------
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
    out["refactored_kernel_exact_nv14"] = True
    print("gl exactness OK", flush=True)

    # ---- 1b. nv=20 gl rate (refactored HLO) ---------------------------
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

    rate, _ = chain_rate(build, 1, lo=2, hi=18, reps=3, cap=50_000)
    out["sumcheck20_pallas_proofs_per_s"] = round(rate, 2)
    print(json.dumps(out), flush=True)

    # ---- 1c. babybear nv=20 rate --------------------------------------
    fb = get_field("babybear")
    chb = [jax.device_put(np.uint32(v)) for v in
           nrng.integers(0, fb.q, size=(nv,), dtype=np.uint32)]

    def build_bb(depth):
        G0 = jax.device_put(nrng.integers(0, fb.q, size=(1 << nv,),
                                          dtype=np.uint32))
        H0 = jax.device_put(nrng.integers(0, fb.q, size=(1 << nv,),
                                          dtype=np.uint32))

        def fn(G, H):
            for _ in range(depth):
                msgs, fins = sumcheck_prove_many_pallas(
                    [G, H], chb, field="babybear")
                G = fb.add(G, jnp.broadcast_to(fins[0], G.shape))
                H = fb.add(H, jnp.broadcast_to(
                    fb.add(fins[1], msgs[0, 0]), H.shape))
            return G
        return jax.jit(fn), (G0, H0)

    try:
        # bb tables are 4 MB: the one-read floor is ~2x gl's rate cap
        rate, _ = chain_rate(build_bb, 1, lo=2, hi=18, reps=3,
                             cap=100_000)
        out["sumcheck20_bb_pallas_proofs_per_s"] = round(rate, 2)
    except Exception as exc:  # noqa: BLE001
        print(f"bb sumcheck failed: {exc}", file=sys.stderr)
        out["sumcheck20_bb_pallas_proofs_per_s"] = None
    print(json.dumps(out), flush=True)

    # ---- 2. folding step keys on the (fixed) single-block path --------
    ring = get_ring("goldilocks")
    Lf, nf = 1024, 8
    fs_psi = FoldingStep(ring, n_rows=nf, wit_len=Lf, base=256,
                         psi_check=True)
    fs_nopsi = FoldingStep(ring, n_rows=nf, wit_len=Lf, base=256)
    assert fs_psi._COMMIT_BUDGET_WORDS // (ring.D * 16 * nf) >= fs_psi.M, \
        "W=16 should be single-block after the threshold fix"

    def build_foldstep_W(fs, Wf):
        def build(depth):
            r2 = random.Random(13)
            cP = jax.device_put(fs.init_tables(r2))
            rt = jax.device_put(
                fs.precompute_challenge(ring.rand_coeff((), r2)))
            s0 = jax.device_put(fs.rand_witness(Wf, r2))
            s1 = jax.device_put(fs.rand_witness(Wf, r2))
            c0 = jax.device_put(fs.tm.to_t(jnp.asarray(
                np.asarray(ring.rand_ntt((Wf, nf), r2)))))
            c1 = jax.device_put(fs.tm.to_t(jnp.asarray(
                np.asarray(ring.rand_ntt((Wf, nf), r2)))))

            def fn(cP, s0, s1, c0, c1, rt):
                for _ in range(depth):
                    o = fs.step(cP, s0, s1, c0, c1, rt)
                    mask = o["ok_l2"].astype(jnp.uint64)[None, :, None]
                    if fs.psi_check:
                        mask = mask + o["ok_psi"].astype(
                            jnp.uint64)[None, :, None]
                    s1 = f.add(s1, mask)
                    s0, c0 = o["s"], o["cd"]
                return s0
            return jax.jit(fn), (cP, s0, s1, c0, c1, rt)
        return build

    keys = {}
    for key, fs, Wf in (
            ("folding_step_composed_psi_W8_L1024_per_s", fs_psi, 8),
            ("folding_step_composed_psi_W16_L1024_per_s", fs_psi, 16),
            ("folding_step_composed_W8_L1024_per_s", fs_nopsi, 8)):
        rate, _ = chain_rate(build_foldstep_W(fs, Wf), Wf, lo=1, hi=5,
                             reps=3, cap=2500 * Wf)
        keys[key] = round(rate, 2)
        print(key, keys[key], flush=True)

    art = json.loads(ARTIFACT.read_text())
    art.update(keys)
    art.update({k: v for k, v in out.items() if k != "device"})
    art["commit_path"] = "single_block (post threshold fix)"
    ARTIFACT.write_text(json.dumps(art) + "\n")
    print(json.dumps({**out, **keys}), flush=True)


if __name__ == "__main__":
    main()
