"""Field-layer tests: every jnp kernel vs exact python-int arithmetic.

Mirrors reference test category "constant validation + property tests"
(SURVEY.md §4); RNG is seeded for determinism like the reference's
ChaCha8Rng::seed_from_u64 tests."""

import random

import numpy as np
import pytest

from stark_rings_tpu.fields import FIELDS, get_field

NAMES = list(FIELDS)


def _edge_values(q):
    vals = [0, 1, 2, q - 1, q - 2, (q - 1) // 2, (q + 1) // 2]
    for k in (32, 63, 64, 127, 128, 192, 251):
        vals += [(1 << k) % q, ((1 << k) - 1) % q, ((1 << k) + 1) % q]
    return sorted(set(v % q for v in vals))


@pytest.mark.parametrize("name", NAMES)
def test_encode_decode_roundtrip(name):
    f = get_field(name)
    rng = random.Random(0)
    vals = _edge_values(f.q) + [rng.randrange(f.q) for _ in range(50)]
    arr = np.array(vals, dtype=object)
    assert list(f.decode(f.encode(arr))) == vals


@pytest.mark.parametrize("name", NAMES)
def test_add_sub_neg(name):
    f = get_field(name)
    rng = random.Random(1)
    q = f.q
    a_i = _edge_values(q) + [rng.randrange(q) for _ in range(64)]
    b_i = list(reversed(_edge_values(q))) + [rng.randrange(q) for _ in range(64)]
    n = min(len(a_i), len(b_i))
    a_i, b_i = a_i[:n], b_i[:n]
    a = f.encode(np.array(a_i, dtype=object))
    b = f.encode(np.array(b_i, dtype=object))
    assert list(f.decode(f.add(a, b))) == [(x + y) % q for x, y in zip(a_i, b_i)]
    assert list(f.decode(f.sub(a, b))) == [(x - y) % q for x, y in zip(a_i, b_i)]
    assert list(f.decode(f.neg(a))) == [(-x) % q for x in a_i]


@pytest.mark.parametrize("name", NAMES)
def test_mul(name):
    f = get_field(name)
    rng = random.Random(2)
    q = f.q
    edges = _edge_values(q)
    a_i = edges + [rng.randrange(q) for _ in range(200)]
    b_i = list(reversed(edges)) + [rng.randrange(q) for _ in range(200)]
    n = min(len(a_i), len(b_i))
    a_i, b_i = a_i[:n], b_i[:n]
    a = f.encode(np.array(a_i, dtype=object))
    b = f.encode(np.array(b_i, dtype=object))
    assert list(f.decode(f.mul(a, b))) == [x * y % q for x, y in zip(a_i, b_i)]


@pytest.mark.parametrize("name", NAMES)
def test_mul_all_pairs_of_edges(name):
    f = get_field(name)
    q = f.q
    edges = _edge_values(q)
    A = np.array([[x for x in edges] for _ in edges], dtype=object)
    B = np.array([[y for _ in edges] for y in edges], dtype=object)
    got = f.decode(f.mul(f.encode(A), f.encode(B)))
    for i in range(len(edges)):
        for j in range(len(edges)):
            assert got[i, j] == A[i, j] * B[i, j] % q


@pytest.mark.parametrize("name", NAMES)
def test_sum_dot(name):
    f = get_field(name)
    rng = random.Random(3)
    q = f.q
    for n in (1, 2, 3, 7, 8, 64, 65):
        a_i = [rng.randrange(q) for _ in range(n)]
        b_i = [rng.randrange(q) for _ in range(n)]
        a = f.encode(np.array(a_i, dtype=object))
        b = f.encode(np.array(b_i, dtype=object))
        assert int(f.decode(f.sum(a, 0))) == sum(a_i) % q
        assert int(f.decode(f.dot(a, b, 0))) == (
            sum(x * y for x, y in zip(a_i, b_i)) % q)


@pytest.mark.parametrize("name", NAMES)
def test_pow_inv(name):
    f = get_field(name)
    rng = random.Random(4)
    q = f.q
    vals = [1, 2, q - 1] + [rng.randrange(1, q) for _ in range(5)]
    a = f.encode(np.array(vals, dtype=object))
    assert list(f.decode(f.pow_const(a, 5))) == [pow(v, 5, q) for v in vals]
    if name != "stark_prime":  # 251-bit Fermat chain: covered by test below
        assert list(f.decode(f.inv(a))) == [pow(v, q - 2, q) for v in vals]


@pytest.mark.slow
def test_stark_inv():
    f = get_field("stark_prime")
    q = f.q
    vals = [2, q - 3]
    a = f.encode(np.array(vals, dtype=object))
    assert list(f.decode(f.inv(a))) == [pow(v, q - 2, q) for v in vals]


@pytest.mark.parametrize("name", NAMES)
def test_from_uint(name):
    f = get_field(name)
    vals = [0, 1, 2, 12345, 2**31, 2**32 - 1]
    got = f.decode(f.from_uint(np.array(vals, dtype=np.uint64)))
    assert list(got) == [v % f.q for v in vals]


@pytest.mark.parametrize("name", NAMES)
def test_zeros_ones_is_zero(name):
    f = get_field(name)
    z = f.zeros((3,))
    o = f.ones((3,))
    assert list(f.decode(z)) == [0, 0, 0]
    assert list(f.decode(o)) == [1, 1, 1]
    assert bool(np.all(np.asarray(f.is_zero(z))))
    assert not bool(np.any(np.asarray(f.is_zero(o))))
    assert list(f.decode(f.add(o, z))) == [1, 1, 1]


@pytest.mark.parametrize("name", NAMES)
def test_jit_and_vmap(name):
    import jax

    f = get_field(name)
    rng = random.Random(5)
    q = f.q
    a_i = [rng.randrange(q) for _ in range(16)]
    b_i = [rng.randrange(q) for _ in range(16)]
    a = f.encode(np.array(a_i, dtype=object))
    b = f.encode(np.array(b_i, dtype=object))

    fused = jax.jit(lambda x, y: f.add(f.mul(x, y), f.sub(x, y)))
    got = list(f.decode(fused(a, b)))
    want = [(x * y + x - y) % q for x, y in zip(a_i, b_i)]
    assert got == want

    vm = jax.jit(jax.vmap(f.mul))
    assert list(f.decode(vm(a, b))) == [x * y % q for x, y in zip(a_i, b_i)]
