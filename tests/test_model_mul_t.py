"""Batch-trailing model multiply (ops/model_mul.TModelMul) equals the
batch-leading RingModel pipeline element-exactly, for all four models.

The batch-leading pipeline is itself golden-validated against the
reference vectors (tests/test_spec_golden.py), so equality here anchors
the transposed layout to the same bit-exactness chain
(crt.rs:52-77 + ntt_form.rs:159-189).
"""

import numpy as np
import pytest

from stark_rings_tpu.ops.model_mul import TModelMul
from stark_rings_tpu.rings import get_ring

MODELS = ["goldilocks", "babybear", "frog", "stark_prime"]


@pytest.mark.parametrize("name", MODELS)
def test_mul_t_matches_ring_pipeline(name):
    ring = get_ring(name)
    rng = np.random.default_rng(hash(name) % 2**32)
    B = 5
    a = ring.rand_coeff((B,), __import__("random").Random(1))
    b = ring.rand_coeff((B,), __import__("random").Random(2))

    want = ring.icrt(ring.ntt_mul(ring.crt(a), ring.crt(b)))

    tm = TModelMul(ring)
    got = tm.mul(a, b)
    assert ring.decode(got).tolist() == ring.decode(want).tolist()

    # stagewise: crt_t / ntt_mul_t / icrt_t individually
    at, bt = tm.to_t(a), tm.to_t(b)
    fa = tm.crt_t(at)
    fb = tm.crt_t(bt)
    assert ring.decode(tm.from_t(fa)).tolist() == \
        ring.decode(ring.crt(a)).tolist()
    prod = tm.ntt_mul_t(fa, fb)
    assert ring.decode(tm.from_t(prod)).tolist() == \
        ring.decode(ring.ntt_mul(ring.crt(a), ring.crt(b))).tolist()

    # fixed-operand multiply and square (one CRT dot saved)
    fbt = tm.precompute_t(bt)
    got_c = tm.mul_cached_t(at, fbt)
    assert ring.decode(tm.from_t(got_c)).tolist() == \
        ring.decode(want).tolist()
    sq_want = ring.icrt(ring.ntt_mul(ring.crt(a), ring.crt(a)))
    assert ring.decode(tm.from_t(tm.square_t(at))).tolist() == \
        ring.decode(sq_want).tolist()
    # batch-1 challenge broadcast
    f1 = tm.precompute_t(tm.to_t(b[:1]))
    want1 = ring.icrt(ring.ntt_mul(
        ring.crt(a), np.broadcast_to(np.asarray(ring.crt(b[:1])),
                                     np.asarray(ring.crt(a)).shape)))
    got1 = tm.mul_cached_t(at, f1)
    assert ring.decode(tm.from_t(got1)).tolist() == \
        ring.decode(want1).tolist()
    del rng


@pytest.mark.parametrize("name", ["goldilocks", "frog"])
def test_matvec_t_matches_reference_matvec(name):
    """Transposed NTT-form mat-vec == per-row ntt_mul + sum (the
    checked_mul_vec contract, matrix.rs:148-188)."""
    import random

    ring = get_ring(name)
    tm = TModelMul(ring)
    f = ring.field
    n, m, W = 3, 4, 2
    A = ring.rand_ntt((n, m), random.Random(8))
    x = ring.rand_ntt((W, m), random.Random(9))

    want = f.sum(ring.ntt_mul(np.asarray(A)[None],
                              np.asarray(x)[:, None]), axis=2)  # [W, n, D]

    At = tm.to_t(A)                                         # [D, n, m]
    xt = tm.to_t(x)                                         # [D, W, m]
    got = tm.from_t(tm.matvec_t(At, xt))                    # [W, n, D]
    assert ring.decode(got).tolist() == ring.decode(want).tolist()

    # unbatched vector form
    got1 = tm.from_t(tm.matvec_t(At, tm.to_t(x[0])))
    assert ring.decode(got1).tolist() == ring.decode(want[0]).tolist()


@pytest.mark.parametrize("name", ["goldilocks", "babybear", "frog"])
def test_mul_t_volume_vs_pipeline(name):
    """10^4-element batch through mul_t in ONE call equals the
    batch-leading pipeline (reference-volume consistency, the shape of
    goldilocks/ntt.rs:801-806)."""
    import jax

    ring = get_ring(name)
    f = ring.field
    rng = np.random.default_rng(hash(name) & 0xFFFF)
    n = 10_000
    dt = np.uint32 if f.dtype == np.uint32 else np.uint64
    a = f.from_canon(jax.device_put(
        rng.integers(0, f.q, size=(n, ring.D), dtype=dt)))
    b = f.from_canon(jax.device_put(
        rng.integers(0, f.q, size=(n, ring.D), dtype=dt)))
    tm = TModelMul(ring)

    @jax.jit
    def both(x, y):
        lead = ring.icrt(ring.ntt_mul(ring.crt(x), ring.crt(y)))
        trail = tm.from_t(tm.mul_t(tm.to_t(x), tm.to_t(y)))
        return lead, trail

    lead, trail = both(a, b)
    assert (np.asarray(lead) == np.asarray(trail)).all(), name


@pytest.mark.parametrize("name", ["goldilocks", "stark_prime"])
def test_mul_t_spec_oracle(name):
    """One element through the integer spec's coeff-form product."""
    import random

    ring = get_ring(name)
    r = random.Random(7)
    a_ints = [r.randrange(ring.q) for _ in range(ring.D)]
    b_ints = [r.randrange(ring.q) for _ in range(ring.D)]
    want = ring.spec.coeff_mul(a_ints, b_ints)

    tm = TModelMul(ring)
    a = ring.encode_coeffs(np.array([a_ints], dtype=object))
    b = ring.encode_coeffs(np.array([b_ints], dtype=object))
    got = ring.decode(tm.mul(a, b))[0]
    assert [int(v) for v in got] == [int(v) % ring.q for v in want]
