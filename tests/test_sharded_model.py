"""Data-parallel sharded model multiply == the local fused multiply
(reference rayon DP mapped to a mesh batch axis)."""

import random
import numpy as np
import pytest
import jax

from stark_rings_tpu.rings import get_ring
from stark_rings_tpu.parallel import ShardedModelMul, make_mesh
from stark_rings_tpu.ops.model_mul import TModelMul


@pytest.mark.parametrize("name", ["goldilocks", pytest.param(
    "stark_prime", marks=pytest.mark.slow)])  # limbed: minutes on CPU
def test_sharded_model_mul_matches_local(name):
    Pn = 8
    if len(jax.devices()) < Pn:
        pytest.skip("not enough devices")
    ring = get_ring(name)
    mesh = make_mesh(Pn)
    smm = ShardedModelMul(ring, mesh)
    rng = random.Random(5)
    B = 16
    a = np.asarray(ring.rand_coeff((B,), rng))
    b = np.asarray(ring.rand_coeff((B,), rng))
    got = np.asarray(smm.make_mul_fn()(a, b))
    tm = TModelMul(ring)
    want = np.asarray(jax.jit(tm.mul)(a, b))
    assert np.array_equal(got, want)

    na = np.asarray(ring.crt(a))
    nb = np.asarray(ring.crt(b))
    got_n = np.asarray(smm.make_ntt_mul_fn()(na, nb))
    want_n = np.asarray(jax.jit(ring.ntt_mul)(na, nb))
    assert np.array_equal(got_n, want_n)

    # replicated challenge multiply (batch sharded, c batch-1)
    ch = b[:1]
    got_c = np.asarray(smm.make_challenge_mul_fn()(a, ch))
    want_c = np.asarray(jax.jit(tm.mul)(a, np.broadcast_to(ch, a.shape)))
    assert np.array_equal(got_c, want_c)


@pytest.mark.parametrize("name", ["babybear", "frog"])
def test_sharded_model_mul_other_models_and_consts_gate(name):
    """The two remaining models through the sharded multiply, with the
    result decoded and checked against the integer spec (not just the
    local-replica path) on a couple of elements."""
    Pn = 8
    if len(jax.devices()) < Pn:
        pytest.skip("not enough devices")
    ring = get_ring(name)
    mesh = make_mesh(Pn)
    smm = ShardedModelMul(ring, mesh)
    rng = random.Random(9)
    B = 16
    a = np.asarray(ring.rand_coeff((B,), rng))
    b = np.asarray(ring.rand_coeff((B,), rng))
    got = ring.decode(smm.make_mul_fn()(a, b))
    ai, bi = ring.decode(a), ring.decode(b)
    for r in (0, B - 1):
        want = ring.spec.coeff_mul([int(v) for v in ai[r]],
                                   [int(v) for v in bi[r]])
        assert [int(v) for v in got[r]] == [int(v) % ring.q for v in want]
