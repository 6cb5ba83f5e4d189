"""Sharded dense-MLE tests on the virtual 8-device mesh (the multi-chip
MLE story of BASELINE config 4: psum/all_gather reductions)."""

import random

import numpy as np
import pytest

import jax

from stark_rings_tpu.fields import get_field
from stark_rings_tpu.linalg import FieldElems
from stark_rings_tpu.mle import DenseMLE
from stark_rings_tpu.parallel import ShardedMLE, make_mesh


@pytest.mark.parametrize("name", ["goldilocks", "babybear"])
def test_sharded_eval_matches_single(name):
    Pn = 8
    if len(jax.devices()) < Pn:
        pytest.skip("not enough devices")
    f = get_field(name)
    e = FieldElems(f)
    nv = 10
    mesh = make_mesh(Pn)
    sm = ShardedMLE(f, nv, mesh)
    rng = random.Random(100)
    evals_i = [rng.randrange(f.q) for _ in range(1 << nv)]
    evals = np.asarray(f.encode(np.array(evals_i, dtype=object)))
    point = [np.asarray(f.encode(np.array(rng.randrange(f.q), dtype=object)))
             for _ in range(nv)]
    ev_fn = sm.make_eval_fn()
    got = int(f.decode(ev_fn(evals, *point)))
    mle = DenseMLE(e, nv, jax.numpy.asarray(evals))
    want = int(f.decode(mle.evaluate([jax.numpy.asarray(p) for p in point])))
    assert got == want


def test_sharded_fix_and_sums():
    Pn = 8
    if len(jax.devices()) < Pn:
        pytest.skip("not enough devices")
    f = get_field("goldilocks")
    e = FieldElems(f)
    nv = 9
    mesh = make_mesh(Pn)
    sm = ShardedMLE(f, nv, mesh)
    rng = random.Random(101)
    a_i = [rng.randrange(f.q) for _ in range(1 << nv)]
    b_i = [rng.randrange(f.q) for _ in range(1 << nv)]
    a = np.asarray(f.encode(np.array(a_i, dtype=object)))
    b = np.asarray(f.encode(np.array(b_i, dtype=object)))
    # partial fix (local) == single-chip
    k = 3
    pts = [np.asarray(f.encode(np.array(rng.randrange(f.q), dtype=object)))
           for _ in range(k)]
    fix = sm.make_fix_fn(k)
    got = f.decode(fix(a, *pts))
    mle = DenseMLE(e, nv, jax.numpy.asarray(a))
    want = f.decode(mle.fix_variables(
        [jax.numpy.asarray(p) for p in pts]).evals)
    assert [int(v) for v in got] == [int(v) for v in want]
    # hypercube sum + inner product via psum
    s_fn = sm.make_hypercube_sum_fn()
    assert int(f.decode(s_fn(a))) == sum(a_i) % f.q
    ip_fn = sm.make_inner_product_fn()
    assert int(f.decode(ip_fn(a, b))) == \
        sum(x * y for x, y in zip(a_i, b_i)) % f.q


def test_sharded_matvec():
    Pn = 8
    if len(jax.devices()) < Pn:
        pytest.skip("not enough devices")
    from stark_rings_tpu.parallel import ShardedMatVec
    from stark_rings_tpu.rings import get_ring
    from stark_rings_tpu.linalg import Matrix, RingElems

    ring = get_ring("goldilocks")
    e = RingElems(ring)
    mesh = make_mesh(Pn)
    rng = random.Random(110)
    n, m = 3, 16
    A = Matrix.rand(e, n, m, rng)
    v = np.asarray(ring.rand_ntt((m,), rng))
    mv = ShardedMatVec(e, mesh).make_matvec_fn()
    got = mv(np.asarray(A.vals), v)
    want = A.mul_vec(v)
    assert (np.asarray(got) == np.asarray(want)).all()


def test_sharded_matvec_field_scalars():
    Pn = 8
    if len(jax.devices()) < Pn:
        pytest.skip("not enough devices")
    from stark_rings_tpu.parallel import ShardedMatVec
    from stark_rings_tpu.linalg import Matrix

    f = get_field("stark_prime")
    e = FieldElems(f)
    mesh = make_mesh(Pn)
    rng = random.Random(111)
    A = Matrix.rand(e, 2, 8, rng)
    v = np.asarray(f.rand((8,), rng))
    mv = ShardedMatVec(e, mesh).make_matvec_fn()
    got = mv(np.asarray(A.vals), v)
    want = A.mul_vec(v)
    assert (np.asarray(got) == np.asarray(want)).all()


@pytest.mark.parametrize("name", ["goldilocks", pytest.param(
    "stark_prime", marks=pytest.mark.slow)])  # limbed rounds: minutes
def test_sharded_sumcheck_matches_single(name):
    """Multi-chip sumcheck prover == the single-device prover: same
    messages and final bound values for the same challenges."""
    from stark_rings_tpu.mle.sumcheck import sumcheck_prove_with_challenges

    Pn = 8
    if len(jax.devices()) < Pn:
        pytest.skip("not enough devices")
    f = get_field(name)
    nv = 6 if f.limbed else 8   # limbed CPU-mesh rounds are ~100x slower
    mesh = make_mesh(Pn)
    sm = ShardedMLE(f, nv, mesh)
    rng = random.Random(7)

    def enc_vec(n):
        return np.asarray(f.encode(np.array(
            [rng.randrange(f.q) for _ in range(n)], dtype=object)))

    G = enc_vec(1 << nv)
    H = enc_vec(1 << nv)
    chals = [np.asarray(f.encode(np.array(rng.randrange(f.q),
                                          dtype=object)))
             for _ in range(nv)]
    fn = sm.make_sumcheck_fn()
    msgs, gv, hv = fn(G, H, *chals)
    want_msgs, want_g, want_h = jax.jit(
        lambda G, H, *cs: sumcheck_prove_with_challenges(f, G, H, cs))(
            G, H, *chals)
    assert np.array_equal(np.asarray(msgs), np.asarray(want_msgs))
    assert np.array_equal(np.asarray(gv), np.asarray(want_g))
    assert np.array_equal(np.asarray(hv), np.asarray(want_h))


def test_sharded_sparse_matvec_ring():
    """nnz-sharded sparse mat-vec == the single-device gather+segment-sum
    (sparse_matrix.rs:202-217 scaled across the mesh), ring elements."""
    Pn = 8
    if len(jax.devices()) < Pn:
        pytest.skip("not enough devices")
    from stark_rings_tpu.linalg import RingElems, SparseMatrix
    from stark_rings_tpu.parallel import ShardedSparseMatVec
    from stark_rings_tpu.rings import get_ring

    ring = get_ring("goldilocks")
    e = RingElems(ring)
    mesh = make_mesh(Pn)
    rng = random.Random(210)
    n, m = 5, 12
    A = SparseMatrix.rand(e, n, m, 0.4, rng)
    v = np.asarray(ring.rand_ntt((m,), rng))
    got = ShardedSparseMatVec(e, mesh).mul_vec(A, v)
    want = A.mul_vec(v)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_sharded_sparse_matvec_limbed_and_skewed():
    """Limbed 252-bit scalars, plus a pathological pattern where every
    entry sits in ONE row (row-sharding would put all work on one
    device; nnz-sharding keeps it balanced and exact)."""
    Pn = 8
    if len(jax.devices()) < Pn:
        pytest.skip("not enough devices")
    from stark_rings_tpu.linalg import SparseMatrix
    from stark_rings_tpu.parallel import ShardedSparseMatVec

    f = get_field("stark_prime")
    e = FieldElems(f)
    mesh = make_mesh(Pn)
    rng = random.Random(211)
    m = 16
    vals = e.rand((m,), rng)
    entries = [(2, c, int(x)) for c, x in enumerate(f.decode(vals))]
    A = SparseMatrix.from_entries(e, 4, m, entries)
    v = np.asarray(f.rand((m,), rng))
    smv = ShardedSparseMatVec(e, mesh)
    got = smv.mul_vec(A, v)
    want = A.mul_vec(v)
    assert np.array_equal(np.asarray(got), np.asarray(want))

    # dimension-mismatch keeps the checked_mul_vec error contract
    from stark_rings_tpu.linalg import AlgebraError
    try:
        smv.mul_vec(A, v[:-1])
        assert False, "expected AlgebraError"
    except AlgebraError:
        pass


def test_sharded_kary_sumcheck_matches_single():
    """make_sumcheck_many_fn == the single-device k-ary prover for the
    same tables/challenges (k = 3, degree-3 rounds) on the 8-dev mesh."""
    from stark_rings_tpu.mle.sumcheck import (
        sumcheck_prove_many_with_challenges)

    Pn = 8
    if len(jax.devices()) < Pn:
        pytest.skip("not enough devices")
    f = get_field("goldilocks")
    nv, k = 7, 3
    mesh = make_mesh(Pn)
    sm = ShardedMLE(f, nv, mesh)
    rng = random.Random(17)
    tables = [np.asarray(f.encode(np.array(
        [rng.randrange(f.q) for _ in range(1 << nv)], dtype=object)))
        for _ in range(k)]
    chals = [np.asarray(f.encode(np.array(rng.randrange(f.q),
                                          dtype=object)))
             for _ in range(nv)]
    msgs_sh, finals_sh = sm.make_sumcheck_many_fn(k)(*tables, *chals)
    import jax.numpy as jnp

    msgs_1, finals_1 = jax.jit(
        lambda ts, cs: sumcheck_prove_many_with_challenges(f, ts, cs)
    )([jnp.asarray(t) for t in tables], chals)
    assert np.array_equal(np.asarray(msgs_sh), np.asarray(msgs_1))
    for a, b in zip(finals_sh, finals_1):
        assert np.array_equal(np.asarray(a), np.asarray(b))
