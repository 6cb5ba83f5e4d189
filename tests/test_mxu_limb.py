"""LimbPrescaledMat (ops/mxu_limb.py): the stark-prime fused dense
CRT/ICRT on the MXU digit-plane path.

Parity anchor: the composed stark_prime NTT kernels
(stark_prime/ntt.rs:121-346) as one 16 x 16 linear map; bit-exactness
is vs DenseModMat (itself probed from the golden-validated integer
spec) and the staged butterfly chain."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from stark_rings_tpu.fields import get_field
from stark_rings_tpu.ops.dense_linear import DenseModMat, probe_dense_matrix
from stark_rings_tpu.ops.mxu_limb import LimbPrescaledMat
from stark_rings_tpu.rings import get_ring
from stark_rings_tpu.spec import get_model

F = get_field("stark_prime")
SPEC = get_model("stark_prime")


def _rand_storage(pr, shape):
    ints = np.empty(shape, dtype=object)
    flat = ints.reshape(-1)
    for i in range(flat.size):
        flat[i] = pr.randrange(SPEC.q)
    return jnp.asarray(F.encode(ints)), ints


@pytest.fixture(scope="module")
def crt_mats():
    mc = probe_dense_matrix(SPEC.crt, SPEC.D, SPEC.D, SPEC.q)
    return mc, LimbPrescaledMat(F, mc), DenseModMat(F, mc)


def test_matches_dense_mod_mat(crt_mats):
    _, lm, dm = crt_mats
    pr = random.Random(1)
    x, _ = _rand_storage(pr, (5, SPEC.D))
    assert np.array_equal(np.asarray(lm(x)), np.asarray(dm(x)))


def test_random_matrix_vs_int_oracle():
    pr = random.Random(2)
    R, C = 7, 5
    m = np.empty((R, C), dtype=object)
    for r in range(R):
        for c in range(C):
            m[r, c] = pr.randrange(SPEC.q)
    lm = LimbPrescaledMat(F, m)
    x, ints = _rand_storage(pr, (3, C))
    got = F.decode(lm(x))
    for t in range(3):
        for r in range(R):
            want = sum(int(m[r, c]) * int(ints[t, c])
                       for c in range(C)) % SPEC.q
            assert int(got[t, r]) == want


def test_edge_values(crt_mats):
    """q-1 everywhere (max canonical) and zero must fold exactly."""
    mc, lm, dm = crt_mats
    hi = np.full((2, SPEC.D), SPEC.q - 1, dtype=object)
    hi[1, :] = 0
    x = jnp.asarray(F.encode(hi))
    assert np.array_equal(np.asarray(lm(x)), np.asarray(dm(x)))


def test_ring_uses_fused_path_and_matches_staged():
    ring = get_ring("stark_prime")
    assert ring.use_dense_crt
    assert type(ring._dense_crt[0]).__name__ == "LimbPrescaledMat"
    pr = random.Random(3)
    x, _ = _rand_storage(pr, (4, SPEC.D))
    assert np.array_equal(np.asarray(ring.crt(x)),
                          np.asarray(ring.crt_staged(x)))
    y = ring.crt(x)
    assert np.array_equal(np.asarray(ring.icrt(y)),
                          np.asarray(ring.icrt_staged(y)))


def test_leading_batch_dims(crt_mats):
    _, lm, dm = crt_mats
    pr = random.Random(4)
    x, _ = _rand_storage(pr, (2, 3, SPEC.D))
    assert np.array_equal(np.asarray(lm(x)), np.asarray(dm(x)))


# -- MxuLimbNTT: the 252-bit four-step power-ring multiplier ----------------

@pytest.mark.slow
def test_mxu_limb_ntt_matches_radix4():
    from stark_rings_tpu.ops.mxu_limb import MxuLimbNTT
    from stark_rings_tpu.ops.ntt import NTTContext

    N = 64     # the N=512 odd-log2 test covers the larger split shapes
    tx = MxuLimbNTT(F, N)
    ctx = NTTContext(F, N, negacyclic=True)
    pr = random.Random(21)
    ints = np.empty((2, 2, N), dtype=object)
    for s in range(2):
        for t in range(2):
            for i in range(N):
                ints[s, t, i] = pr.randrange(F.q)
    a = jnp.asarray(F.encode(ints[0]))
    b = jnp.asarray(F.encode(ints[1]))
    assert np.array_equal(np.asarray(tx.jit_mul()(a, b)),
                          np.asarray(ctx.mul(a, b)))
    back = tx.inverse(tx.forward(a))
    assert np.array_equal(np.asarray(back), np.asarray(a))
    # fixed-operand multiply and square (one forward transform saved)
    want = np.asarray(ctx.mul(a, b))
    fb = tx.precompute(b)
    assert np.array_equal(np.asarray(tx.mul_cached(a, fb)), want)
    assert np.array_equal(np.asarray(tx.square(a)),
                          np.asarray(ctx.mul(a, a)))


def test_mxu_limb_ntt_odd_log2_and_power_ring():
    from stark_rings_tpu.rings import get_power_ring
    from stark_rings_tpu.ops.ntt import NTTContext

    ring = get_power_ring("stark_prime", 9)   # 512 = 32 x 16 split
    tx = ring.mxu_ctx()
    assert type(tx).__name__ == "MxuLimbNTT"
    ctx = NTTContext(F, ring.D, negacyclic=True)
    pr = random.Random(22)
    ints = np.empty((2, 2, ring.D), dtype=object)
    for s in range(2):
        for t in range(2):
            for i in range(ring.D):
                ints[s, t, i] = pr.randrange(F.q)
    a = jnp.asarray(F.encode(ints[0]))
    b = jnp.asarray(F.encode(ints[1]))
    assert np.array_equal(np.asarray(tx.mul(a, b)),
                          np.asarray(ctx.mul(a, b)))
