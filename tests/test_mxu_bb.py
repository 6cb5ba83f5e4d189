"""BabyBear MXU NTT (ops/mxu_bb.py): CPU bit-exactness vs NTTContext,
the spec schoolbook, and the storage-domain (Montgomery) invariants.

Parity anchor: the reference BabyBear butterfly kernels
(babybear/ntt.rs:143-236) generalized to BASELINE config 2's
power-of-two degrees."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stark_rings_tpu.fields import get_field
from stark_rings_tpu.ops.mxu_bb import (
    BBPrescaledMat, K_BUCKETS, MxuBBNTT, _Q)
from stark_rings_tpu.ops.ntt import NTTContext

F = get_field("babybear")
N = 1 << 12


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    a = jax.device_put(rng.integers(0, _Q, (3, N), dtype=np.uint32))
    b = jax.device_put(rng.integers(0, _Q, (3, N), dtype=np.uint32))
    ctx = NTTContext(F, N, negacyclic=True)
    return a, b, np.asarray(ctx.mul(a, b))


def test_prescaled_mat_exact():
    rng = np.random.default_rng(0)
    R, C = 16, 16
    M = [[int(rng.integers(0, _Q)) for _ in range(C)] for _ in range(R)]
    mat = BBPrescaledMat(M)
    x = rng.integers(0, _Q, size=(C, 5), dtype=np.uint32)
    got = np.asarray(mat.apply(jnp.asarray(x)))
    for r in range(R):
        for j in range(5):
            want = sum(M[r][c] * int(x[c, j]) for c in range(C)) % _Q
            assert int(got[r, j]) == want


def test_mul_matches_radix4(data):
    a, b, want = data
    tx = MxuBBNTT(N)
    got = np.asarray(tx.jit_mul()(a, b))
    assert np.array_equal(got, want)


def test_staged_mul_matches(data):
    a, b, want = data
    tx = MxuBBNTT(N)
    got = np.asarray(tx.staged_mul()(a, b))
    assert np.array_equal(got, want)


def test_forward_inverse_roundtrip(data):
    a, _, _ = data
    tx = MxuBBNTT(N)
    ai = tx._to_internal(a)
    back = tx._from_internal(tx.inverse_internal(tx.forward_internal(ai)))
    assert np.array_equal(np.asarray(back), np.asarray(a))


def test_small_degree_vs_schoolbook():
    """Canonical-domain check: encode -> mul -> decode equals the
    negacyclic schoolbook product of the canonical values."""
    n = 256
    tx = MxuBBNTT(n)
    rng = np.random.default_rng(2)
    canon = rng.integers(0, _Q, size=(2, 2, n), dtype=np.uint32)
    a = F.from_canon(jnp.asarray(canon[0]))
    b = F.from_canon(jnp.asarray(canon[1]))
    got = np.asarray(F.canon(tx.jit_mul()(a, b)))
    A, B = canon[0].astype(object), canon[1].astype(object)
    want = np.zeros((2, n), dtype=object)
    for t in range(2):
        for i in range(n):
            row = (A[t, i] * B[t]) % _Q
            for j in range(n):
                k = i + j
                if k >= n:
                    want[t, k - n] = (want[t, k - n] - row[j]) % _Q
                else:
                    want[t, k] = (want[t, k] + row[j]) % _Q
    assert np.array_equal(got.astype(object), want)


def test_power_ring_mxu_ctx(data):
    from stark_rings_tpu.rings import get_power_ring

    a, b, want = data
    ring = get_power_ring("babybear", 12)
    tx = ring.mxu_ctx()
    got = np.asarray(tx.jit_mul()(a, b))
    assert np.array_equal(got, want)
    assert np.array_equal(np.asarray(ring.coeff_mul(a, b)), want)


def test_odd_log2_degree():
    n = 1 << 9  # asymmetric 32 x 16 split
    tx = MxuBBNTT(n)
    ctx = NTTContext(F, n, negacyclic=True)
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.integers(0, _Q, (2, n), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, _Q, (2, n), dtype=np.uint32))
    assert np.array_equal(np.asarray(tx.jit_mul()(a, b)),
                          np.asarray(ctx.mul(a, b)))
