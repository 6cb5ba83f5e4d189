"""Operator-level Rq wrapper (rings/element.py) — the reference's
RqPoly/RqNTT ergonomics (coeff_form.rs:608-711 operator impl matrix)."""

import random

import numpy as np
import pytest

from stark_rings_tpu.rings import Rq, get_ring
from stark_rings_tpu.spec import MODELS


@pytest.mark.parametrize("name", list(MODELS))
def test_rq_operator_surface(name):
    R = get_ring(name)
    rng = random.Random(17)
    a = Rq.rand(R, (3,), rng)
    b = Rq.rand(R, (3,), rng)
    one = Rq.one(R, (3,))

    # mul agrees with the spec through both forms
    prod_coeff = a * b
    prod_ntt = (a.crt() * b.crt()).icrt()
    assert prod_coeff == prod_ntt
    ai, bi, pi = a.decode(), b.decode(), prod_coeff.decode()
    for r in range(3):
        want = R.spec.coeff_mul([int(v) for v in ai[r]],
                                [int(v) for v in bi[r]])
        assert [int(v) for v in pi[r]] == [int(v) % R.q for v in want]

    # ring axioms via operators
    assert a * one == a
    assert (a + b) - b == a
    assert -(-a) == a
    assert (a + a) == 2 * a
    assert a * 0 == Rq.zero(R, (3,))

    # form safety
    with pytest.raises(AssertionError):
        _ = a * b.crt()

    # rot == mul by X
    x_poly = Rq.from_ints(R, [0, 1] + [0] * (R.D - 2))
    assert a.rot() == a * x_poly

    # square in both forms
    assert a.square() == a * a
    assert a.crt().square() == (a * a).crt()

    # decompose/recompose roundtrip through the wrapper
    dig = a.decompose(256, k=5) if R.q < (1 << 40) else a.decompose(256, 9)
    if R.q >= (1 << 40) and R.q < (1 << 65):
        back = Rq.recompose(R, dig, 256)
        assert back == a


def test_rq_ntt_pow_inv_goldilocks():
    R = get_ring("goldilocks")
    rng = random.Random(23)
    a = Rq.rand(R, (2,), rng).crt()
    assert a ** 3 == a * a * a
    assert a * a.inv() == Rq.one(R, (2,), form="ntt")


def test_rq_square_power_ring():
    """Rq.square on a PowerRing routes through coeff_square (one forward
    transform) and must equal the two-operand multiply."""
    from stark_rings_tpu.rings import get_power_ring

    R = get_power_ring("goldilocks", 8)
    rng = random.Random(31)
    a = Rq.coeff(R, R.rand_coeff((2,), rng))
    assert a.square() == a * a


def test_rq_from_ints_reduces_long_input():
    R = get_ring("goldilocks")
    long = [1] * (2 * R.D - 1)
    got = Rq.from_ints(R, long)
    want = R.spec.reduce([1] * (2 * R.D - 1))
    assert [int(v) for v in got.decode()] == [int(v) for v in want]


def test_rq_l2_norm_surface():
    """Rq.l2_norm_squared_words / l2_check == the host exact norm."""
    import jax

    from stark_rings_tpu.decomp import l2_norm_squared, words_to_int
    from stark_rings_tpu.rings import get_ring
    from stark_rings_tpu.rings.element import Rq

    ring = get_ring("goldilocks")
    x = Rq.rand(ring, (3,), random.Random(21))
    want = l2_norm_squared(ring.field, x.data)
    assert words_to_int(x.l2_norm_squared_words()) == want
    assert bool(x.l2_check(want))
    assert not bool(x.l2_check(want - 1))


def test_rq_pow_coeff_form_matches_repeated_mul():
    """Ring::pow on coeff-form elements (reference computes it directly
    on RqPoly): the CRT-routed pow equals repeated schoolbook mul."""
    from stark_rings_tpu.rings import get_ring
    from stark_rings_tpu.rings.element import Rq

    for name in ("goldilocks", "stark_prime"):
        ring = get_ring(name)
        a = Rq.rand(ring, (), random.Random(31))
        p5 = a ** 5
        assert p5.form == "coeff"
        want = a
        for _ in range(4):
            want = want * a
        assert (np.asarray(p5.data) == np.asarray(want.data)).all(), name
        # and it agrees with the NTT-form pow through crt
        assert (np.asarray((a.crt() ** 5).icrt().data)
                == np.asarray(p5.data)).all(), name
