"""Large power-of-two NTT tests (BASELINE configs 1/2): roundtrip +
ring-mul vs python-int schoolbook oracles at several sizes/fields."""

import random

import numpy as np
import pytest

import jax

from stark_rings_tpu.fields import get_field
from stark_rings_tpu.ops.ntt import find_primitive_root, get_ntt


def _negacyclic_mul_ints(a, b, q):
    n = len(a)
    out = [0] * n
    for i, x in enumerate(a):
        if not x:
            continue
        for j, y in enumerate(b):
            k = i + j
            if k < n:
                out[k] = (out[k] + x * y) % q
            else:
                out[k - n] = (out[k - n] - x * y) % q
    return out


def _cyclic_mul_ints(a, b, q):
    n = len(a)
    out = [0] * n
    for i, x in enumerate(a):
        if not x:
            continue
        for j, y in enumerate(b):
            out[(i + j) % n] = (out[(i + j) % n] + x * y) % q
    return out


def test_primitive_roots():
    for name in ("goldilocks", "babybear", "frog", "stark_prime"):
        f = get_field(name)
        g = find_primitive_root(f.q)
        assert pow(g, f.q - 1, f.q) == 1
        # nontrivial in the 2-Sylow subgroup
        two_adic = (f.q - 1) & -(f.q - 1)
        assert pow(g, (f.q - 1) // 2, f.q) == f.q - 1
        assert two_adic >= 8


@pytest.mark.parametrize("name,N", [
    ("goldilocks", 64), ("goldilocks", 256),
    ("babybear", 64),
    pytest.param("stark_prime", 16, marks=pytest.mark.slow),
    pytest.param("stark_prime", 256, marks=pytest.mark.slow),
])
def test_negacyclic_roundtrip_and_mul(name, N):
    f = get_field(name)
    ctx = get_ntt(name, N, negacyclic=True)
    rng = random.Random(40)
    a_i = [rng.randrange(f.q) for _ in range(N)]
    b_i = [rng.randrange(f.q) for _ in range(N)]
    a = f.encode(np.array(a_i, dtype=object))
    b = f.encode(np.array(b_i, dtype=object))
    back = f.decode(jax.jit(lambda x: ctx.inverse(ctx.forward(x)))(a))
    assert [int(v) for v in back] == a_i
    got = f.decode(jax.jit(ctx.mul)(a, b))
    assert [int(v) for v in got] == _negacyclic_mul_ints(a_i, b_i, f.q)


@pytest.mark.parametrize("name,N", [("goldilocks", 128), ("babybear", 32)])
def test_cyclic_mul(name, N):
    f = get_field(name)
    ctx = get_ntt(name, N, negacyclic=False)
    rng = random.Random(41)
    a_i = [rng.randrange(f.q) for _ in range(N)]
    b_i = [rng.randrange(f.q) for _ in range(N)]
    a = f.encode(np.array(a_i, dtype=object))
    b = f.encode(np.array(b_i, dtype=object))
    got = f.decode(jax.jit(ctx.mul)(a, b))
    assert [int(v) for v in got] == _cyclic_mul_ints(a_i, b_i, f.q)


@pytest.mark.slow
def test_negacyclic_batched_big():
    """Batched deg-2^12 goldilocks mul == oracle on one row; jit once."""
    f = get_field("goldilocks")
    N = 1 << 12
    ctx = get_ntt("goldilocks", N)
    rng = random.Random(42)
    batch = 4
    a_i = [[rng.randrange(f.q) for _ in range(N)] for _ in range(batch)]
    b_i = [[rng.randrange(f.q) for _ in range(N)] for _ in range(batch)]
    a = f.encode(np.array(a_i, dtype=object))
    b = f.encode(np.array(b_i, dtype=object))
    got = f.decode(jax.jit(ctx.mul)(a, b))
    want = _negacyclic_mul_ints(a_i[1], b_i[1], f.q)
    assert [int(v) for v in got[1]] == want


@pytest.mark.slow
def test_power_ring_cached_mul_and_square():
    """PowerRing precompute/coeff_mul_cached/coeff_square == coeff_mul,
    incl. the batch-1 challenge broadcast (NTTContext.square lineage)."""
    from stark_rings_tpu.rings import get_power_ring

    ring = get_power_ring("goldilocks", 9)
    rng = random.Random(44)
    a = np.asarray(ring.rand_coeff((3,), rng))
    b = np.asarray(ring.rand_coeff((3,), rng))
    want = np.asarray(ring.coeff_mul(a, b))
    assert np.array_equal(
        np.asarray(ring.coeff_mul_cached(a, ring.precompute(b))), want)
    assert np.array_equal(np.asarray(ring.coeff_square(a)),
                          np.asarray(ring.coeff_mul(a, a)))
    f1 = ring.precompute(b[:1])
    w1 = np.asarray(ring.coeff_mul(a, np.broadcast_to(b[:1], a.shape)))
    assert np.array_equal(np.asarray(ring.coeff_mul_cached(a, f1)), w1)


def test_leaf_order_is_permutation_of_evaluations():
    """Leaf order semantics: forward(x)[i] == x(psi^leaf_exps[i])."""
    f = get_field("goldilocks")
    N = 16
    ctx = get_ntt("goldilocks", N)
    rng = random.Random(43)
    a_i = [rng.randrange(f.q) for _ in range(N)]
    a = f.encode(np.array(a_i, dtype=object))
    got = [int(v) for v in f.decode(ctx.forward(a))]
    q = f.q
    for i, e in enumerate(ctx.leaf_exps):
        # leaf block X - psi^e: evaluation at psi^e
        z = pow(ctx.psi_int, e, q)
        want = 0
        for j in reversed(range(N)):
            want = (want * z + a_i[j]) % q
        assert got[i] == want, i


def test_power_ring_fourstep_ctx_matches_coeff_mul():
    """PowerRing.fourstep_ctx (single-chip four-step engine, the bench
    deg-2^20 winner): mul == coeff_mul bit-for-bit and
    inverse(forward) == id on flat tensors, goldilocks and babybear."""
    import jax
    import jax.numpy as jnp

    from stark_rings_tpu.rings.power import get_power_ring

    for name, logN in (("goldilocks", 9), ("babybear", 8)):
        ring = get_power_ring(name, logN)
        fwd, inv, mul = ring.fourstep_ctx()
        dt = np.uint32 if name == "babybear" else np.uint64
        rng = np.random.default_rng(7)
        a = rng.integers(0, ring.q, size=(2, ring.D), dtype=dt)
        b = rng.integers(0, ring.q, size=(2, ring.D), dtype=dt)
        got = np.asarray(jax.jit(mul)(jnp.asarray(a), jnp.asarray(b)))
        want = np.asarray(jax.jit(ring.coeff_mul)(jnp.asarray(a),
                                                  jnp.asarray(b)))
        assert np.array_equal(got, want), name
        rt = np.asarray(jax.jit(lambda x: inv(fwd(x)))(jnp.asarray(a)))
        assert np.array_equal(rt, a), name


def test_stark_prime_power_ring_deg_2_10():
    """252-bit Starknet-prime big-degree ring (2-adicity 192 allows any
    power of two): roundtrip + a spot product vs the host schoolbook.

    Beyond the reference (its stark_prime model stops at D=16,
    stark_prime/ntt.rs:13); the generalization reuses the same
    fully-splitting negacyclic NTT machinery."""
    from stark_rings_tpu.rings import get_power_ring

    ring = get_power_ring("stark_prime", 10)
    f = ring.field
    n = ring.D
    rng = random.Random(41)
    a_i = [rng.randrange(f.q) for _ in range(n)]
    a = jax.numpy.asarray(ring.encode_coeffs(np.array(a_i, dtype=object)))
    back = ring.decode(ring.icrt(ring.crt(a)))
    assert [int(v) for v in back] == a_i
    # x * X^1 rotates negacyclically
    x1 = [0] * n
    x1[1] = 1
    b = jax.numpy.asarray(ring.encode_coeffs(np.array(x1, dtype=object)))
    got = ring.decode(ring.coeff_mul(a, b))
    want = [(-a_i[-1]) % f.q] + a_i[:-1]
    assert [int(v) for v in got] == want
