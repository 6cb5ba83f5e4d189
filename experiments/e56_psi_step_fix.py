#!/usr/bin/env python
"""e56: re-measure the psi-on composed folding step after replacing the
ct-table GATHER with an unrolled select chain (XLA's TPU gather inside
the composed module cost ~24 ms/step flat: 291 steps/s vs 5,620 nopsi).

Patches the three folding_step keys + the standalone psi rate into
benchmarks/PROTO_r05.json in place."""
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
    from stark_rings_tpu.protocol import FoldingStep
    from stark_rings_tpu.rings import get_ring
    from stark_rings_tpu.rings.monomial import psi_range_check_batched

    setup_jax_cache()
    ring = get_ring("goldilocks")
    f = ring.field
    out = {}

    # standalone psi (frog digit tensor, select-chain path)
    fr = get_ring("frog")
    rng = random.Random(11)
    Brc = 32768

    def build_rc(depth):
        digits = jax.device_put(np.asarray(
            fr.encode_coeffs(np.array([[rng.randrange(-2, 3) % fr.q
                                        for _ in range(fr.D)]
                                       for _ in range(Brc)],
                                      dtype=object))))

        def fn(d):
            acc = jnp.zeros((), jnp.uint32)
            for _ in range(depth):
                ok = psi_range_check_batched(fr, d)
                acc = acc + ok.sum().astype(jnp.uint32)
                d = fr.field.add(d, jnp.zeros_like(d) + acc.astype(d.dtype))
            return d
        return jax.jit(fn), (digits,)

    rate, _ = chain_rate(build_rc, Brc, lo=2, hi=130, reps=5,
                         cap=2_000_000_000)
    out["psi_range_check_elems_per_s"] = round(rate, 1)
    print("psi standalone:", out, flush=True)

    Lf, nf = 1024, 8
    fs_psi = FoldingStep(ring, n_rows=nf, wit_len=Lf, base=256,
                         psi_check=True)
    fs_nopsi = FoldingStep(ring, n_rows=nf, wit_len=Lf, base=256)

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

    for key, fs, Wf in (
            ("folding_step_composed_psi_W8_L1024_per_s", fs_psi, 8),
            ("folding_step_composed_psi_W16_L1024_per_s", fs_psi, 16),
            ("folding_step_composed_W8_L1024_per_s", fs_nopsi, 8)):
        rate, _ = chain_rate(build_foldstep_W(fs, Wf), Wf, lo=1, hi=5,
                             reps=3, cap=2500 * Wf)
        out[key] = round(rate, 2)
        print(key, out[key], flush=True)

    art = json.loads(ARTIFACT.read_text())
    art.update(out)
    art["psi_lookup"] = "select_chain (e56: gather was 30x slower in-module)"
    ARTIFACT.write_text(json.dumps(art) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
