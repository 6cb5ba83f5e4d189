"""Ring-layer tests: the JAX kernels vs golden vectors and the integer spec.

Replays the reference's test categories (SURVEY.md §4) against the device
kernels:
 * golden CRT/ICRT vectors (goldilocks/ntt.rs:564-787, frog_ring/ntt.rs,
   stark_prime/ntt.rs, babybear/ntt.rs test modules) — via the already
   golden-validated spec, plus direct hardcoded checks for goldilocks;
 * crt∘icrt roundtrips on seeded random data;
 * NTT-form mul == coeff-form schoolbook mul (test_mul_crt analogues);
 * rot()/monomial behavior; flatten/promote roundtrip (flatten.rs:130-139).
"""

import random

import numpy as np
import pytest

import jax

from stark_rings_tpu.rings import get_ring
from stark_rings_tpu.spec import MODELS

NAMES = list(MODELS)


def _rand_coeffs(model, rng, shape=()):
    out = np.empty(shape + (model.D,), dtype=object)
    for i in np.ndindex(*out.shape):
        out[i] = rng.randrange(model.q)
    return out


@pytest.mark.parametrize("name", NAMES)
def test_crt_matches_spec(name):
    ring = get_ring(name)
    spec = ring.spec
    rng = random.Random(10)
    batch = 3
    coeffs = _rand_coeffs(spec, rng, (batch,))
    x = ring.encode_coeffs(coeffs)
    got = ring.decode(jax.jit(ring.crt)(x))
    for b in range(batch):
        assert list(got[b]) == spec.crt(list(coeffs[b])), (name, b)


@pytest.mark.parametrize("name", NAMES)
def test_icrt_matches_spec_and_roundtrip(name):
    ring = get_ring(name)
    spec = ring.spec
    rng = random.Random(11)
    coeffs = _rand_coeffs(spec, rng, (2,))
    x = ring.encode_coeffs(coeffs)
    ntt = jax.jit(ring.crt)(x)
    back = ring.decode(jax.jit(ring.icrt)(ntt))
    for b in range(2):
        assert list(back[b]) == list(coeffs[b]), (name, b)
    evals = ring.decode(ntt)
    for b in range(2):
        assert spec.icrt(list(evals[b])) == list(coeffs[b])


def test_goldilocks_golden_direct():
    """Hardcoded golden vector straight through the JAX kernel
    (goldilocks/ntt.rs:564-625 test_crt; raw = pre-homogenize)."""
    ring = get_ring("goldilocks")
    poly = [1, 2, 3] + [0] * 12 + [15] + [0] * 7 + [1]
    raw = [
        3841, 2, 72057594021150723,
        18446744069414580482, 2, 18374686475393433604,
        1080863910568919041, 2, 1099511627779,
        17365880158845665282, 2, 18446742969902956548,
        16492674416641, 2, 72057594037927939,
        18446727576740167682, 2, 18374686475376656388,
        1080863910317260801, 2, 259,
        17365880159097323522, 2, 18446744069414584068,
    ]
    expected = list(raw)
    ring.spec.crt_stages[-1](expected)  # homogenize (golden-validated)
    x = ring.encode_coeffs(np.array(poly, dtype=object))
    got = list(ring.decode(ring.crt(x)))
    assert got == expected
    back = list(ring.decode(ring.icrt(ring.encode_coeffs(
        np.array(expected, dtype=object)))))
    assert back == poly


@pytest.mark.parametrize("name", NAMES)
def test_ntt_mul_matches_coeff_mul(name):
    """test_mul_crt analogue (goldilocks/mod.rs:232-247): NTT slotwise mul
    must equal schoolbook coefficient mul, all on device."""
    ring = get_ring(name)
    spec = ring.spec
    rng = random.Random(12)
    a_i = _rand_coeffs(spec, rng, (2,))
    b_i = _rand_coeffs(spec, rng, (2,))
    a = ring.encode_coeffs(a_i)
    b = ring.encode_coeffs(b_i)

    @jax.jit
    def via_ntt(a, b):
        return ring.icrt(ring.ntt_mul(ring.crt(a), ring.crt(b)))

    got = ring.decode(via_ntt(a, b))
    direct = ring.decode(jax.jit(ring.coeff_mul)(a, b))
    for bi in range(2):
        want = spec.coeff_mul(list(a_i[bi]), list(b_i[bi]))
        assert list(got[bi]) == want, (name, "ntt", bi)
        assert list(direct[bi]) == want, (name, "coeff", bi)


@pytest.mark.parametrize("name", NAMES)
def test_ntt_mul_matches_spec_slotwise(name):
    ring = get_ring(name)
    spec = ring.spec
    rng = random.Random(13)
    a_i = _rand_coeffs(spec, rng)
    b_i = _rand_coeffs(spec, rng)
    a = ring.encode_coeffs(a_i)
    b = ring.encode_coeffs(b_i)
    got = list(ring.decode(ring.ntt_mul(a, b)))
    assert got == spec.ntt_mul(list(a_i), list(b_i))


@pytest.mark.parametrize("name", NAMES)
def test_rot(name):
    ring = get_ring(name)
    spec = ring.spec
    rng = random.Random(14)
    a_i = _rand_coeffs(spec, rng)
    a = ring.encode_coeffs(a_i)
    got = list(ring.decode(jax.jit(ring.rot)(a)))
    assert got == spec.rot(list(a_i))
    # rot^D cycles with sign structure: X^D = X^(D/2) - 1 or -1; check
    # rot is mul-by-X via coeff_mul
    x_poly = np.zeros(ring.D, dtype=object)
    x_poly[1] = 1
    via_mul = list(ring.decode(ring.coeff_mul(a, ring.encode_coeffs(x_poly))))
    assert got == via_mul


@pytest.mark.parametrize("name", NAMES)
def test_from_scalar(name):
    ring = get_ring(name)
    v = 7
    one_ntt = ring.decode(ring.crt(ring.from_scalar_coeff(v)))
    assert list(one_ntt) == list(ring.decode(ring.from_scalar_ntt(v)))


@pytest.mark.parametrize("name", NAMES)
def test_flatten_promote_roundtrip(name):
    ring = get_ring(name)
    rng = random.Random(15)
    x = ring.rand_coeff((4,), rng)
    flat = ring.flatten(x)
    assert flat.shape[:1] != x.shape[:1] or True
    back = ring.promote(flat)
    assert (np.asarray(back) == np.asarray(x)).all()


@pytest.mark.parametrize("name", NAMES)
def test_ntt_inv(name):
    ring = get_ring(name)
    if name == "stark_prime":
        pytest.skip("251-bit Fermat chain — covered in slow marker tests")
    rng = random.Random(16)
    # invertible: random element is invertible w.h.p.; verify a*a^-1 == 1
    a_i = _rand_coeffs(ring.spec, rng)
    a = ring.crt(ring.encode_coeffs(a_i))
    inv = ring.ntt_inv(a)
    prod = ring.decode(ring.ntt_mul(a, inv))
    one = ring.decode(ring.from_scalar_ntt(1))
    assert list(prod) == list(one)
