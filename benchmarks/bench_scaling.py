#!/usr/bin/env python
"""Sharded-NTT scaling bench with per-phase breakdown (BASELINE config 5).

Measures deg-2^20 four-step NTT ring-mul throughput at 1 / 2 / 4 / 8
devices AND times each forward phase separately (column stage /
all_to_all exchange / row stage) so collective cost is attributable.
Prints one JSON line per device count.

Honesty note: on the CPU virtual mesh (the only multi-device environment
available here) all "devices" share the same host cores, so per-device
compute does NOT scale and the efficiency column mostly measures host
parallelism + XLA CPU collective overhead — NOT the sharding design.
The phase columns exist precisely to separate those: the analytic ICI
model for real v5p hardware lives in PERF_NOTES.md "Multi-chip".  Set
SRT_SCALING_REAL=1 to measure attached real devices instead.
"""

import json
import sys
import time

import numpy as np


def _ensure_mesh_platform(max_devices: int):
    """Default to the virtual CPU mesh: JAX_PLATFORMS=cpu in the env is
    IGNORED here (sitecustomize imports jax onto the axon platform at
    interpreter start), so re-exec a child that flips the platform
    before backend init — same pattern as __graft_entry__."""
    import os
    import pathlib
    import subprocess

    if os.environ.get("SRT_SCALING_REAL") == "1" \
            or os.environ.get("_SRT_SCALING_REEXEC") == "1":
        if os.environ.get("_SRT_SCALING_REEXEC") == "1":
            import jax

            jax.config.update("jax_platforms", "cpu")
        return
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    env = dict(os.environ)
    env["_SRT_SCALING_REEXEC"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            + str(max_devices)).strip()
    raise SystemExit(subprocess.run(
        [sys.executable, __file__] + sys.argv[1:], env=env,
        cwd=repo).returncode)


def _timeit(fn, args, iters=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def main(N=1 << 20, counts=(1, 2, 4, 8), batch=2):
    _ensure_mesh_platform(max(counts))
    import jax

    sys.path.insert(0, ".")
    from stark_rings_tpu.fields import get_field
    from stark_rings_tpu.parallel import ShardedNTT, make_mesh

    f = get_field("goldilocks")
    rng = np.random.default_rng(0)
    base = None
    records = []
    for Pn in counts:
        if len(jax.devices()) < Pn:
            continue
        sn = ShardedNTT("goldilocks", N, Pn)
        mesh = make_mesh(Pn)
        _, _, mul = sn.make_fns(mesh, batch_ndim=1)
        phases = sn.make_phase_fns(mesh, batch_ndim=1)
        a = sn.to_matrix(rng.integers(0, f.q, size=(batch, N),
                                      dtype=np.uint64))
        b = sn.to_matrix(rng.integers(0, f.q, size=(batch, N),
                                      dtype=np.uint64))

        # overlap variant (batch-pipelined forward, the make_fns default
        # for even batches): same math, exchange hidden behind chunk i+1's
        # column stage on real ICI
        fwd_ov, _, mul_ov = sn.make_fns(mesh, batch_ndim=1, overlap=True)

        t_mul = _timeit(mul, (a, b))
        t_fwd = _timeit(phases["forward"], (a,))
        t_fwd_ov = _timeit(fwd_ov, (a,))
        t_mul_ov = _timeit(mul_ov, (a, b))
        t_pre = _timeit(phases["pre"], (a,))
        pre_out = phases["pre"](a)
        t_exch = _timeit(phases["exchange"], (pre_out,))
        exch_out = phases["exchange"](pre_out)
        t_rows = _timeit(phases["rows"], (exch_out,))

        rate = batch / t_mul
        if base is None:
            base = rate
        eff = rate / (base * Pn / counts[0])
        rec = {
            "devices": Pn, "deg": N,
            "ring_mults_per_sec": round(rate, 3),
            "scaling_efficiency": round(eff, 4),
            "phase_ms": {
                "pre_col_stage": round(t_pre * 1e3, 2),
                "all_to_all": round(t_exch * 1e3, 2),
                "row_stage": round(t_rows * 1e3, 2),
                "forward_fused": round(t_fwd * 1e3, 2),
                "forward_overlap": round(t_fwd_ov * 1e3, 2),
                "full_mul": round(t_mul * 1e3, 2),
                "full_mul_overlap": round(t_mul_ov * 1e3, 2),
            },
            "exchange_frac_of_forward": round(t_exch / t_fwd, 4),
            "note": "CPU virtual mesh shares host cores; see PERF_NOTES "
                    "Multi-chip for the real-ICI analytic model",
        }
        records.append(rec)
        print(json.dumps(rec))
        import pathlib

        art = pathlib.Path(__file__).parent / "SCALING_r05.json"
        art.write_text("\n".join(json.dumps(r) for r in records) + "\n")


def shardcompute(N=1 << 20, counts=(1, 2, 4, 8), B=8):
    """Anchor the ICI model's COMPUTE term on the real chip.

    The analytic multi-chip model (PERF_NOTES "Multi-chip") previously
    divided a whole-chip measurement by P; this measures the ACTUAL
    P-shard local stage shapes — column twist+NTT+twiddle at
    [B, N1, N2/P] and row NTT at [B, N1/P, N2] — as in-module
    depth-differenced chains on the attached chip, so shard-shape
    effects (narrower lane tiles at larger P) are in the number, and
    publishes predicted efficiency = ideal / (measured-local +
    modeled-ICI) per P for the 1-D-ring and torus ICI bounds.

    Run on the REAL chip:  python benchmarks/bench_scaling.py --shardcompute
    Artifact: benchmarks/SHARDCOMPUTE_r05.json
    """
    import pathlib

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from bench import chain_rate, setup_jax_cache
    from stark_rings_tpu.fields import get_field
    from stark_rings_tpu.parallel import ShardedNTT

    setup_jax_cache()
    f = get_field("goldilocks")
    rng = np.random.default_rng(5)
    out = {"device": str(jax.devices()[0]), "deg": N, "batch": B,
           "per_p": {}}
    art = pathlib.Path(__file__).parent / "SHARDCOMPUTE_r05.json"

    # modeled ICI per MUL (PERF_NOTES): 1-D bidirectional ring carries
    # A/8 bytes per link per direction per transform independent of P
    # (A = 8 MB at deg 2^20, u64), 3 transforms/mul, ~100 GB/s per link
    # per direction on v5p -> 30 us; a 2-D/3-D torus embedding divides
    # by the extra dims -> ~10 us
    ICI_RING_S, ICI_TORUS_S = 30e-6, 10e-6

    t_single = None
    for Pn in counts:
        sn = ShardedNTT("goldilocks", N, Pn)
        sn.consts()
        # shard-0 constants: the per-shard compute COST is identical on
        # every shard (same shapes, different constant values)
        sn._col_ofs = lambda: jnp.int64(0)
        N1, N2 = sn.N1, sn.N2
        C, R1 = N2 // Pn, N1 // Pn
        # scale the batch with P so the differenced signal stays tens of
        # ms as per-shard work shrinks (B=8 at P=8 produced sub-ms
        # signals that tunnel jitter swamped — non-monotonic garbage)
        Bp = min(B * Pn, 64)

        def build_pre(depth, sn=sn, N1=N1, C=C, Bp=Bp):
            x = jax.device_put(rng.integers(0, f.q, size=(Bp, N1, C),
                                            dtype=np.uint64))

            def fn(x):
                for _ in range(depth):
                    x = sn._pre_transpose(x)
                return x
            return jax.jit(fn), (x,)

        def build_rows(depth, sn=sn, R1=R1, N2=N2, Bp=Bp):
            y = jax.device_put(rng.integers(0, f.q, size=(Bp, R1, N2),
                                            dtype=np.uint64))

            def fn(y):
                for _ in range(depth):
                    y = sn._apply_on_axis(sn._local_fns()[2], y, 1)
                return y
            return jax.jit(fn), (y,)

        def build_pw(depth, R1=R1, N2=N2, Bp=Bp):
            ya = jax.device_put(rng.integers(0, f.q, size=(Bp, R1, N2),
                                            dtype=np.uint64))
            yb = jax.device_put(rng.integers(0, f.q, size=(Bp, R1, N2),
                                            dtype=np.uint64))

            def fn(ya, yb):
                for _ in range(depth):
                    ya = f.mul(ya, yb)
                return ya
            return jax.jit(fn), (ya, yb)

        # physical caps (PERF_NOTES methodology): a stage cannot beat
        # its shard-data HBM traffic at ~820 GB/s — pre/rows move >= 2
        # passes of 8 MB/P per element, pointwise >= 3
        bytes_elem = 8 * N // Pn
        cap_stage = 1.0 / (2 * bytes_elem / 820e9)
        cap_pw = 1.0 / (3 * bytes_elem / 820e9)
        rec = {"batch": Bp}
        for key, build, lo, hi, cap in (
                ("pre_col_stage", build_pre, 1, 5, cap_stage),
                ("row_stage", build_rows, 1, 5, cap_stage),
                ("pointwise", build_pw, 2, 18, cap_pw)):
            rate, _ = chain_rate(build, Bp, lo=lo, hi=hi, reps=5,
                                 cap=cap)
            rec[key + "_us_per_elem"] = round(1e6 / rate, 2)
        # per-element local mul time at this shard shape: 3 transforms
        # (fwd a, fwd b, inverse — same stage structure) + pointwise
        t_local = 3 * (rec["pre_col_stage_us_per_elem"]
                       + rec["row_stage_us_per_elem"]) * 1e-6 \
            + rec["pointwise_us_per_elem"] * 1e-6
        rec["local_mul_us_per_elem"] = round(t_local * 1e6, 1)
        if Pn == counts[0]:
            t_single = t_local
        ideal = t_single / Pn
        rec["compute_scaling"] = round(ideal / t_local, 4)
        rec["pred_efficiency_ring"] = round(
            ideal / (t_local + ICI_RING_S), 4)
        rec["pred_efficiency_torus"] = round(
            ideal / (t_local + ICI_TORUS_S), 4)
        rec["pred_efficiency_overlap"] = round(
            ideal / max(t_local, ICI_RING_S), 4)
        out["per_p"][str(Pn)] = rec
        print(json.dumps({"P": Pn, **rec}), flush=True)
        art.write_text(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if "--shardcompute" in sys.argv:
        shardcompute()
    else:
        main()
