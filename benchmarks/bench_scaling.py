#!/usr/bin/env python
"""Sharded-NTT scaling bench (BASELINE config 5 harness).

Measures deg-2^20 four-step NTT ring-mul throughput at 1 / 2 / 4 / 8
devices and reports scaling efficiency.  On a CPU host this exercises the
code path with virtual devices (set XLA_FLAGS/JAX_PLATFORMS as in
tests/conftest.py); on a real multi-chip TPU slice it measures ICI
all_to_all scaling.  Prints one JSON line per device count.
"""

import json
import sys
import time

import numpy as np


def _ensure_mesh_platform(max_devices: int):
    """Default to the virtual CPU mesh: JAX_PLATFORMS=cpu in the env is
    IGNORED here (sitecustomize imports jax onto the axon platform at
    interpreter start), so re-exec a child that flips the platform
    before backend init (jax.config.update works until the first
    jax.devices() call) — same pattern as __graft_entry__.  Set
    SRT_SCALING_REAL=1 to measure the attached real devices instead."""
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
        [sys.executable, __file__], env=env, cwd=repo).returncode)


def main(N=1 << 20, counts=(1, 2, 4, 8), batch=1):
    _ensure_mesh_platform(max(counts))
    import jax

    sys.path.insert(0, ".")
    from stark_rings_tpu.fields import get_field
    from stark_rings_tpu.parallel import ShardedNTT, make_mesh

    f = get_field("goldilocks")
    rng = np.random.default_rng(0)
    base = None
    for Pn in counts:
        if len(jax.devices()) < Pn:
            continue
        sn = ShardedNTT("goldilocks", N, Pn)
        mesh = make_mesh(Pn)
        _, _, mul = sn.make_fns(mesh, batch_ndim=1)
        a = sn.to_matrix(rng.integers(0, f.q, size=(batch, N),
                                      dtype=np.uint64))
        b = sn.to_matrix(rng.integers(0, f.q, size=(batch, N),
                                      dtype=np.uint64))
        out = mul(a, b)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = mul(a, b)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rate = batch * iters / dt
        if base is None:
            base = rate
        eff = rate / (base * Pn / counts[0])
        print(json.dumps({"devices": Pn, "deg": N,
                          "ring_mults_per_sec": round(rate, 3),
                          "scaling_efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()
