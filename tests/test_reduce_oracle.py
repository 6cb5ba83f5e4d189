"""Independent long-division oracle for cyclotomic reduction.

The reference cross-checks every model's `reduce_in_place` against
ark-poly's generic `DenseOrSparsePolynomial::divide_with_q_and_r` by the
explicit cyclotomic (goldilocks/mod.rs:209-229, babybear/mod.rs:220-240,
frog_ring/mod.rs:192-212, stark_prime/mod.rs:139-159).  Here the generic
oracle is a 15-line schoolbook polynomial long division over Z_q — an
implementation with nothing in common with SpecModel.reduce's fold rules
— applied to random length-(2D-1) inputs, and additionally to the traced
device path (ring.reduce)."""

import random

import numpy as np

import jax

from stark_rings_tpu.rings import get_ring
from stark_rings_tpu.spec import MODELS

import pytest


def _phi(spec):
    """Explicit cyclotomic Phi(X) as a coefficient list (low-to-high)."""
    c = [0] * (spec.D + 1)
    c[0] = 1
    c[spec.D] = 1
    if spec.has_middle_term:
        c[spec.D // 2] = -1 % spec.q
    return c


def _long_division_rem(num, phi, q):
    """Remainder of num(X) mod phi(X) over Z_q, schoolbook long division.

    phi is monic, so no leading-coefficient inversion is needed."""
    r = [v % q for v in num]
    d = len(phi) - 1
    for i in reversed(range(d, len(r))):
        c = r[i]
        if c == 0:
            continue
        r[i] = 0
        for j in range(d):
            r[i - d + j] = (r[i - d + j] - c * phi[j]) % q
    return r[:d]


@pytest.mark.parametrize("name", list(MODELS))
def test_reduce_matches_long_division(name):
    spec = MODELS[name]
    phi = _phi(spec)
    rng = random.Random(hash(name) & 0xFFFF)
    for _ in range(25):
        num = [rng.randrange(spec.q) for _ in range(2 * spec.D - 1)]
        want = _long_division_rem(num, phi, spec.q)
        got = spec.reduce(num)
        assert got == want, name


@pytest.mark.parametrize("name", list(MODELS))
def test_device_reduce_matches_long_division(name):
    ring = get_ring(name)
    spec = ring.spec
    phi = _phi(spec)
    rng = random.Random((hash(name) >> 5) & 0xFFFF)
    B = 8
    nums = [[rng.randrange(spec.q) for _ in range(2 * spec.D - 1)]
            for _ in range(B)]
    x = ring.field.encode(np.array(nums, dtype=object))
    got = ring.field.decode(jax.jit(ring.reduce)(x))
    for i in range(B):
        want = _long_division_rem(nums[i], phi, spec.q)
        assert [int(v) for v in got[i]] == want, (name, i)
