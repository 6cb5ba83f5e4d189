"""Deterministic multi-seed fuzz: JAX kernels vs the integer spec across
all four models, batched (one jit call per model per op)."""

import random

import numpy as np
import pytest

import jax

from stark_rings_tpu.rings import get_ring
from stark_rings_tpu.spec import MODELS

BATCH = 16


def _rand_batch(spec, rng, n):
    out = np.empty((n, spec.D), dtype=object)
    for i in range(n):
        for j in range(spec.D):
            out[i, j] = rng.randrange(spec.q)
    return out


@pytest.mark.parametrize("name", list(MODELS))
def test_fuzz_crt_roundtrip_and_mul(name):
    ring = get_ring(name)
    spec = ring.spec
    rng = random.Random(hash(name) & 0xFFFF)
    a_i = _rand_batch(spec, rng, BATCH)
    b_i = _rand_batch(spec, rng, BATCH)
    a = ring.encode_coeffs(a_i)
    b = ring.encode_coeffs(b_i)

    @jax.jit
    def pipeline(a, b):
        na, nb = ring.crt(a), ring.crt(b)
        prod = ring.ntt_mul(na, nb)
        return ring.icrt(prod), ring.icrt(na)

    prod, back = pipeline(a, b)
    got_prod = ring.decode(prod)
    got_back = ring.decode(back)
    for i in range(BATCH):
        ai = [int(v) for v in a_i[i]]
        bi = [int(v) for v in b_i[i]]
        assert [int(v) for v in got_back[i]] == ai, (name, "roundtrip", i)
        assert [int(v) for v in got_prod[i]] == spec.coeff_mul(ai, bi), \
            (name, "mul", i)


@pytest.mark.parametrize("name", list(MODELS))
def test_fuzz_add_sub_rot(name):
    ring = get_ring(name)
    spec = ring.spec
    rng = random.Random((hash(name) >> 4) & 0xFFFF)
    a_i = _rand_batch(spec, rng, 4)
    b_i = _rand_batch(spec, rng, 4)
    a = ring.encode_coeffs(a_i)
    b = ring.encode_coeffs(b_i)

    @jax.jit
    def ops(a, b):
        return ring.add(a, b), ring.sub(a, b), ring.rot(a)

    s, d, r = ops(a, b)
    gs, gd, gr = ring.decode(s), ring.decode(d), ring.decode(r)
    q = spec.q
    for i in range(4):
        ai = [int(v) for v in a_i[i]]
        bi = [int(v) for v in b_i[i]]
        assert [int(v) for v in gs[i]] == [(x + y) % q for x, y in zip(ai, bi)]
        assert [int(v) for v in gd[i]] == [(x - y) % q for x, y in zip(ai, bi)]
        assert [int(v) for v in gr[i]] == spec.rot(ai)
