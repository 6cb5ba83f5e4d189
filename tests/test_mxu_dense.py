"""prescaled_dense (ops/mxu_dense.py): int8 digit-plane constant
matrices for every field, vs the DenseModMat broadcast oracle and
integer arithmetic.

Parity anchor: the per-model CRT maps these back (goldilocks/ntt.rs:68-127,
babybear/ntt.rs:143-317, frog_ring/ntt.rs:108-191); the per-field fold
constructions have no reference counterpart (MXU-specific)."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from stark_rings_tpu.fields import get_field
from stark_rings_tpu.ops.dense_linear import DenseModMat
from stark_rings_tpu.ops.mxu_dense import prescaled_dense
from stark_rings_tpu.rings import get_ring

EXPECT = {
    "goldilocks": "_Wrap2D",
    "babybear": "_Wrap2D",
    "frog": "Mont64PrescaledMat",
    "stark_prime": "LimbPrescaledMat",
}


def _rand_mat(q, R, C, pr):
    m = np.empty((R, C), dtype=object)
    for r in range(R):
        for c in range(C):
            m[r, c] = pr.randrange(q)
    return m


@pytest.mark.parametrize("fname", list(EXPECT))
def test_matches_dense_mod_mat(fname):
    f = get_field(fname)
    pr = random.Random(hash(fname) & 0xFFFF)
    m = _rand_mat(f.q, 9, 6, pr)
    lm = prescaled_dense(f, m)
    assert type(lm).__name__ == EXPECT[fname]
    dm = DenseModMat(f, m)
    ints = np.empty((4, 6), dtype=object)
    for t in range(4):
        for c in range(6):
            ints[t, c] = pr.randrange(f.q)
    x = jnp.asarray(f.encode(ints))
    assert np.array_equal(np.asarray(lm(x)), np.asarray(dm(x)))


@pytest.mark.parametrize("fname", ["goldilocks", "babybear", "frog"])
def test_vs_int_oracle_and_edge_values(fname):
    f = get_field(fname)
    pr = random.Random(5)
    R, C = 5, 7
    m = _rand_mat(f.q, R, C, pr)
    lm = prescaled_dense(f, m)
    ints = np.empty((3, C), dtype=object)
    for c in range(C):
        ints[0, c] = pr.randrange(f.q)
        ints[1, c] = f.q - 1
        ints[2, c] = 0
    got = f.decode(lm(jnp.asarray(f.encode(ints))))
    for t in range(3):
        for r in range(R):
            want = sum(int(m[r, c]) * int(ints[t, c])
                       for c in range(C)) % f.q
            assert int(got[t, r]) == want, (fname, t, r)


@pytest.mark.parametrize("model", list(EXPECT))
def test_ring_dense_crt_roundtrip(model):
    ring = get_ring(model)
    assert type(ring._dense_crt[0]).__name__ == EXPECT[model]
    pr = random.Random(6)
    ints = np.empty((3, ring.D), dtype=object)
    for t in range(3):
        for i in range(ring.D):
            ints[t, i] = pr.randrange(ring.q)
    x = jnp.asarray(ring.encode_coeffs(ints))
    y = ring.crt(x)
    assert np.array_equal(np.asarray(y), np.asarray(ring.crt_staged(x)))
    assert np.array_equal(np.asarray(ring.icrt(y)), np.asarray(x))
