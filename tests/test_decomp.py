"""Balanced decomposition tests.

Mirrors the reference's test suite (balanced_decomposition/mod.rs:405-422
exhaustive-range roundtrips; stark_prime/decomposition.rs:72-99 golden
vector) plus equivalence of the fixed-k reformulation with the reference's
data-dependent digit loop."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stark_rings_tpu.decomp import (
    center,
    decompose,
    decomposition_max_length,
    gadget_decompose,
    gadget_recompose,
    l2_check,
    l2_norm_squared,
    l2_norm_squared_words,
    recompose,
    sign,
    words_to_int,
)
from stark_rings_tpu.fields import FIELDS, Field, get_field
from stark_rings_tpu.spec.decomp import (
    decompose_balanced_fixed,
    decompose_balanced_ref,
    recompose_ints,
    to_signed,
)

NAMES = list(FIELDS)
BASES = [2, 4, 8, 16, 32, 256, 65536]


def test_fixed_equals_reference_loop_exhaustive():
    """The branch-free fixed-k digit rule == the reference loop, for every
    signed value in a full small range and every test basis (the analogue
    of the reference's all-of-F_65537 test)."""
    for b in BASES:
        k = decomposition_max_length(1 << 40, b)
        for v in range(-3000, 3000):
            assert decompose_balanced_ref(v, b, k) == \
                decompose_balanced_fixed(v, b, k), (v, b)
        rng = random.Random(b)
        for _ in range(500):
            v = rng.randrange(-(1 << 39), 1 << 39)
            assert decompose_balanced_ref(v, b, k) == \
                decompose_balanced_fixed(v, b, k), (v, b)


def test_digit_bound_and_recompose_ints():
    rng = random.Random(7)
    for b in BASES:
        k = decomposition_max_length(1 << 62, b)
        for _ in range(200):
            v = rng.randrange(-(1 << 61), 1 << 61)
            d = decompose_balanced_fixed(v, b, k)
            assert all(abs(x) <= b // 2 for x in d)
            assert recompose_ints(d, b) == v


@pytest.mark.parametrize("name", NAMES)
def test_device_decompose_matches_spec(name):
    f = get_field(name)
    q = f.q
    rng = random.Random(8)
    vals = [0, 1, 2, q - 1, q - 2, (q - 1) // 2, (q + 1) // 2]
    vals += [rng.randrange(q) for _ in range(40)]
    for b in (4, 256, 65536):
        k = decomposition_max_length(q, b)
        x = f.encode(np.array(vals, dtype=object))
        dig = decompose(f, x, b, k)
        axis = -2 if f.limbed else -1
        got = f.decode(dig)
        for i, v in enumerate(vals):
            want = [d % q for d in
                    decompose_balanced_fixed(to_signed(v, q), b, k)]
            row = list(got[i]) if not f.limbed else list(got[i, :])
            assert row == want, (name, b, v)
        # roundtrip on device
        back = f.decode(recompose(f, dig, b))
        assert list(back) == vals, (name, b)


def test_stark_prime_decomposition_golden():
    """stark_prime/decomposition.rs:72-99 golden vector."""
    f = get_field("stark_prime")
    q = f.q
    x = f.encode(np.array([253532532532352325], dtype=object))
    dig = f.decode(decompose(f, x, 1 << 16, 16))
    want = [(-27323) % q, (-17255) % q, (-17793) % q, 901] + [0] * 12
    assert list(dig[0]) == want


@pytest.mark.parametrize("name", NAMES)
def test_gadget_roundtrip_ring(name):
    from stark_rings_tpu.rings import get_ring

    ring = get_ring(name)
    f = ring.field
    rng = random.Random(9)
    x = ring.rand_coeff((3,), rng)
    b, k = 256, decomposition_max_length(f.q, 256)
    g = gadget_decompose(f, x, b, k)
    off = 2 if f.limbed else 1
    assert g.shape[-off - 1] == 3 * k
    back = gadget_recompose(f, g, b, k)
    assert (np.asarray(back) == np.asarray(x)).all()


@pytest.mark.parametrize("name", NAMES)
def test_center_sign(name):
    f = get_field(name)
    q = f.q
    rng = random.Random(10)
    vals = [0, 1, q - 1, (q - 1) // 2, (q + 1) // 2] + [
        rng.randrange(q) for _ in range(20)]
    x = f.encode(np.array(vals, dtype=object))
    got_c = list(f.decode(center(f, x)))
    got_s = list(f.decode(sign(f, x)))
    for i, v in enumerate(vals):
        s = to_signed(v, q)
        assert got_c[i] == abs(s) % q, (name, v)
        assert got_s[i] == (1 if s >= 0 else q - 1), (name, v)


@pytest.mark.parametrize("name", NAMES)
def test_l2_norm_traced_matches_host(name):
    """Traced exact L2 (word-convolution squares + carry normalization)
    == the host BigUint-style sum of squares, incl. extreme magnitudes;
    batched axis semantics; traced bound check at the exact boundary."""
    f = get_field(name)
    q = f.q
    rng = random.Random(11)
    vals = [[0, 1, q - 1, (q - 1) // 2, (q + 1) // 2] +
            [rng.randrange(q) for _ in range(45)] for _ in range(3)]
    x = f.encode(np.array(vals, dtype=object))

    words = jax.jit(lambda x: l2_norm_squared_words(f, x))(x)
    want = l2_norm_squared(f, x)
    assert words_to_int(words) == want, name

    # batched: reduce the element axis only, one norm per row
    wb = jax.jit(lambda x: l2_norm_squared_words(f, x, axis=-1))(x)
    assert wb.shape[0] == 3
    for i in range(3):
        assert words_to_int(wb[i]) == l2_norm_squared(f, x[i]), (name, i)

    # traced bound check, exact boundary both sides
    assert bool(jax.jit(lambda x: l2_check(f, x, want))(x))
    assert not bool(jax.jit(lambda x: l2_check(f, x, want - 1))(x))
    row_bound = l2_norm_squared(f, x[1])
    per_row = jax.jit(lambda x: l2_check(f, x, row_bound, axis=-1))(x)
    assert list(np.asarray(per_row)) == [
        l2_norm_squared(f, x[i]) <= l2_norm_squared(f, x[1])
        for i in range(3)], name

    # chunked reduction path (guards the >2^32/(2W)-element overflow
    # bound with a small forced chunk size): same exact value, both for
    # a full reduce and a batched axis reduce with non-front axes
    flat = x.reshape(-1) if not f.limbed else x.reshape(-1, x.shape[-1])
    wc = jax.jit(lambda x: l2_norm_squared_words(f, x, chunk_n=37))(flat)
    assert words_to_int(wc) == want, name
    wcb = jax.jit(
        lambda x: l2_norm_squared_words(f, x, axis=-1, chunk_n=29))(x)
    for i in range(3):
        assert words_to_int(wcb[i]) == l2_norm_squared(f, x[i]), (name, i)


# -- full-range device roundtrip over a small synthetic modulus ----------
# Mirrors the reference's test_decompose_balanced exactly
# (balanced_decomposition/mod.rs:405-422): EVERY value of F_65537, the 5
# test bases [2, 4, 8, 16, 32], digit-bound + recompose==id — but as ONE
# jitted device call per basis instead of 65537 scalar loops.


class _F65537(Field):
    """Minimal canonical-storage prime field for the exhaustive test."""

    dtype = jnp.uint64

    def __init__(self):
        super().__init__("f65537", 65537)
        self._q = np.uint64(self.q)

    def encode(self, ints):
        arr = np.asarray(ints, dtype=object)
        flat = arr.reshape(-1) if arr.shape else arr.reshape(1)
        out = np.empty(flat.size, dtype=np.uint64)
        for i, v in enumerate(flat):
            out[i] = np.uint64(int(v) % self.q)
        return out.reshape(arr.shape) if arr.shape else out[0]

    def decode(self, x):
        host = np.asarray(jax.device_get(x))
        out = np.empty(host.size, dtype=object)
        for i, v in enumerate(host.reshape(-1)):
            out[i] = int(v)
        return out.reshape(host.shape)

    def from_uint(self, x):
        return jnp.asarray(x).astype(jnp.uint64) % self._q

    def add(self, a, b):
        return (a + b) % self._q

    def sub(self, a, b):
        return (a + self._q - b) % self._q

    def neg(self, a):
        return jnp.where(a == 0, a, self._q - a)

    def mul(self, a, b):
        return (a * b) % self._q   # products < 2^34 fit u64 exactly


def test_full_range_decompose_recompose_device():
    f = _F65537()
    q = f.q
    x = jnp.arange(q, dtype=jnp.uint64)          # EVERY field value
    for b in (2, 4, 8, 16, 32):
        k = 32                                    # reference uses 32 digits

        @jax.jit
        def both(x, b=b, k=k):
            dig = decompose(f, x, b, k)           # [q, k]
            back = recompose(f, dig, b)
            # digit bound: centered |d| <= b/2  <=>  d <= b/2 or d >= q-b/2
            ok_bound = jnp.all((dig <= np.uint64(b // 2)) |
                               (dig >= np.uint64(q - b // 2)))
            return ok_bound, jnp.all(back == x)

        ok_bound, ok_rt = both(x)
        assert bool(ok_bound), f"digit bound violated, b={b}"
        assert bool(ok_rt), f"recompose != id, b={b}"


def test_decompose_to_vec_padding_none():
    """DecomposeToVec variable-length host API (mod.rs:119-161 doc):
    None pads to the slice's largest natural length; digits match the
    fixed-k kernel truncated of trailing zeros; recompose == id."""
    from stark_rings_tpu.spec.decomp import (
        decompose_balanced, decompose_to_vec)

    rng = random.Random(13)
    for b in (2, 16, 256):
        vals = [0, 1, -1, b // 2, -(b // 2), b, 12345,
                -(1 << 40)] + [rng.randrange(-(1 << 50), 1 << 50)
                               for _ in range(30)]
        vecs = decompose_to_vec(vals, b, None)
        kmax = max(len(decompose_balanced(v, b, None)) for v in vals)
        assert all(len(d) == kmax for d in vecs)
        for v, d in zip(vals, vecs):
            assert recompose_ints(d, b) == v
            assert all(abs(x) <= b // 2 for x in d)
            # natural vector == fixed-k vector with the tail zeros cut
            fixed = decompose_balanced_fixed(v, b, kmax)
            assert d == fixed
        # explicit k pads further
        vecs2 = decompose_to_vec(vals, b, kmax + 3)
        assert all(len(d) == kmax + 3 for d in vecs2)
