"""Native C++ host oracle + Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax

from stark_rings_tpu.fields import get_field
from stark_rings_tpu.ops.ntt import get_ntt


def test_native_host_oracle_matches_device():
    from stark_rings_tpu.native import HostGoldilocks

    f = get_field("goldilocks")
    N = 512
    h = HostGoldilocks(N)
    rng = np.random.default_rng(70)
    a = rng.integers(0, f.q, size=(2, N), dtype=np.uint64)
    b = rng.integers(0, f.q, size=(2, N), dtype=np.uint64)
    got = h.mul(a, b)
    want = h.mul_schoolbook(a[0], b[0])
    assert (got[0] == want).all()
    ctx = get_ntt("goldilocks", N)
    dev = np.asarray(jax.jit(ctx.mul)(jax.device_put(a), jax.device_put(b)))
    assert (got == dev).all()
    assert (h.forward(a) == np.asarray(ctx.forward(jax.device_put(a)))).all()


def test_native_decompose():
    from stark_rings_tpu.native import get_host_lib
    from stark_rings_tpu.spec.decomp import decompose_balanced_fixed, to_signed

    lib = get_host_lib()
    q = 2**64 - 2**32 + 1
    rng = np.random.default_rng(71)
    xs = rng.integers(0, q, size=16, dtype=np.uint64)
    k, b = 9, 256
    digs = np.zeros(16 * k, dtype=np.int64)
    lib.srh_decompose_balanced(xs, digs, 16, b, k)
    for i, x in enumerate(xs):
        want = decompose_balanced_fixed(to_signed(int(x), q), b, k)
        assert list(digs[i * k:(i + 1) * k]) == want


def test_pallas_goldilocks_interpret_matches_jnp():
    from stark_rings_tpu.ops.pallas_goldilocks import GoldilocksPallasNTT

    f = get_field("goldilocks")
    N = 128
    pk = GoldilocksPallasNTT(N, rows_per_block=2, interpret=True)
    ctx = get_ntt("goldilocks", N)
    rng = np.random.default_rng(72)
    a = jax.device_put(rng.integers(0, f.q, size=(3, N), dtype=np.uint64))
    b = jax.device_put(rng.integers(0, f.q, size=(3, N), dtype=np.uint64))
    assert (np.asarray(pk.forward(a)) == np.asarray(ctx.forward(a))).all()
    assert (np.asarray(pk.inverse(pk.forward(a))) == np.asarray(a)).all()
    assert (np.asarray(pk.mul(a, b)) == np.asarray(ctx.mul(a, b))).all()


def test_mxu_modmat_and_matmul_ntt():
    """MXU int8-limb modular matmul + the 128x128 matmul-NTT are exact."""
    import random

    from stark_rings_tpu.native import HostGoldilocks
    from stark_rings_tpu.ops.mxu import MatmulNTT, MxuModMat

    f = get_field("goldilocks")
    rng = random.Random(80)
    R, C = 4, 128
    M = [[rng.randrange(f.q) for _ in range(C)] for _ in range(R)]
    mm = MxuModMat(M)
    x_i = [[rng.randrange(f.q) for _ in range(3)] for _ in range(C)]
    x = np.array(x_i, dtype=np.uint64)
    got = np.asarray(mm.apply(jax.device_put(x)))
    for r in range(R):
        for c in range(3):
            want = sum(M[r][j] * x_i[j][c] for j in range(C)) % f.q
            assert int(got[r, c]) == want

    mn = MatmulNTT()
    nprng = np.random.default_rng(81)
    a = nprng.integers(0, f.q, size=(2, mn.N), dtype=np.uint64)
    b = nprng.integers(0, f.q, size=(2, mn.N), dtype=np.uint64)
    back = np.asarray(mn.inverse(mn.forward(jax.device_put(a))))
    assert (back == a).all()
    host = HostGoldilocks(mn.N)
    got2 = np.asarray(mn.mul(jax.device_put(a), jax.device_put(b)))
    assert (got2 == host.mul(a, b)).all()
