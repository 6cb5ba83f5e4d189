"""Linalg tests vs python-int oracles (reference matrix.rs:213-285,
sparse_matrix.rs:309-409, symmetric_matrix.rs tests, ops.rs:82-134)."""

import random

import numpy as np
import pytest

from stark_rings_tpu.fields import get_field
from stark_rings_tpu.linalg import (
    FieldElems,
    Matrix,
    RingElems,
    SparseMatrix,
    SymmetricMatrix,
    recompose_left_right_symmetric_matrix,
    rounded_div_jnp,
)
from stark_rings_tpu.rings import get_ring
from stark_rings_tpu.spec.decomp import rounded_div

FIELD_NAMES = ["goldilocks", "babybear", "frog", "stark_prime"]


def _int_matmul(A, B, q):
    n, k = len(A), len(A[0])
    m = len(B[0])
    return [[sum(A[i][t] * B[t][j] for t in range(k)) % q for j in range(m)]
            for i in range(n)]


@pytest.mark.parametrize("name", FIELD_NAMES)
def test_dense_matmul_matvec(name):
    f = get_field(name)
    e = FieldElems(f)
    rng = random.Random(20)
    q = f.q
    A = [[rng.randrange(q) for _ in range(5)] for _ in range(4)]
    B = [[rng.randrange(q) for _ in range(3)] for _ in range(5)]
    v = [rng.randrange(q) for _ in range(5)]
    MA = Matrix.from_ints(e, A)
    MB = Matrix.from_ints(e, B)
    got = MA.mul_mat(MB).decode()
    want = _int_matmul(A, B, q)
    for i in range(4):
        assert list(got[i]) == want[i]
    gv = e.decode(MA.mul_vec(e.encode(np.array(v, dtype=object))))
    wv = [sum(A[i][j] * v[j] for j in range(5)) % q for i in range(4)]
    assert list(gv) == wv


def test_dense_identity_pad_concat():
    f = get_field("goldilocks")
    e = FieldElems(f)
    I = Matrix.identity(e, 3)
    got = I.decode()
    for i in range(3):
        for j in range(3):
            assert got[i][j] == (1 if i == j else 0)
    P = I.pad_rows(5).pad_cols(4)
    assert P.nrows == 5 and P.ncols == 4
    H = I.hconcat(I)
    assert H.ncols == 6


@pytest.mark.parametrize("name", ["goldilocks", "babybear"])
def test_ring_matrix_matvec(name):
    """Matrix of NTT-form ring elements: scalar mul = slotwise ext mul."""
    ring = get_ring(name)
    e = RingElems(ring)
    spec = ring.spec
    rng = random.Random(21)
    n, m = 3, 2
    A_ints = [[[rng.randrange(spec.q) for _ in range(spec.D)]
               for _ in range(m)] for _ in range(n)]
    v_ints = [[rng.randrange(spec.q) for _ in range(spec.D)] for _ in range(m)]
    MA = Matrix.from_ints(e, A_ints)
    v = e.encode(np.array(v_ints, dtype=object))
    got = e.decode(MA.mul_vec(v))
    for i in range(n):
        want = [0] * spec.D
        for j in range(m):
            p = spec.ntt_mul(A_ints[i][j], v_ints[j])
            want = [(x + y) % spec.q for x, y in zip(want, p)]
        assert list(got[i]) == want, i


@pytest.mark.parametrize("name", FIELD_NAMES)
def test_sparse_matvec_and_dense_roundtrip(name):
    f = get_field(name)
    e = FieldElems(f)
    rng = random.Random(22)
    q = f.q
    n, m = 6, 5
    entries = []
    dense = [[0] * m for _ in range(n)]
    for r in range(n):
        for c in range(m):
            if rng.random() < 0.4:
                val = rng.randrange(q)
                entries.append((r, c, val))
                dense[r][c] = val
    S = SparseMatrix.from_entries(e, n, m, entries)
    got_dense = S.to_dense().decode()
    for i in range(n):
        assert list(got_dense[i]) == dense[i]
    v = [rng.randrange(q) for _ in range(m)]
    gv = e.decode(S.mul_vec(e.encode(np.array(v, dtype=object))))
    wv = [sum(dense[i][j] * v[j] for j in range(m)) % q for i in range(n)]
    assert list(gv) == wv
    # from_dense roundtrip
    S2 = SparseMatrix.from_dense(e, S.to_dense())
    got2 = S2.to_dense().decode()
    for i in range(n):
        assert list(got2[i]) == dense[i]


def test_sparse_sparse_mul():
    f = get_field("goldilocks")
    e = FieldElems(f)
    rng = random.Random(23)
    q = f.q
    A = SparseMatrix.rand(e, 4, 6, 0.5, rng)
    B = SparseMatrix.rand(e, 6, 3, 0.5, rng)
    C = A.mul_sparse(B)
    got = C.to_dense().decode()
    DA = A.to_dense().decode()
    DB = B.to_dense().decode()
    want = _int_matmul([list(r) for r in DA], [list(r) for r in DB], q)
    for i in range(4):
        assert list(got[i]) == want[i]


def test_sparse_sparse_mul_stays_sparse():
    """The merge-join keeps sparsity: multiplying two n x n matrices with
    one diagonal band each must produce O(n) entries, not the n^2 dense
    accumulator (sparse_matrix.rs:219-275)."""
    f = get_field("goldilocks")
    e = FieldElems(f)
    n = 64
    A = SparseMatrix.from_entries(
        e, n, n, [(i, i, i + 1) for i in range(n)])
    B = SparseMatrix.from_entries(
        e, n, n, [(i, (i + 1) % n, i + 2) for i in range(n)])
    C = A.mul_sparse(B)
    assert C.nnz <= n          # dense accumulator would be n*n = 4096
    got = C.to_dense().decode()
    q = f.q
    for i in range(n):
        for j in range(n):
            want = (i + 1) * (i + 2) % q if j == (i + 1) % n else 0
            assert int(got[i][j]) == want
    # ring-element variant (NTT form, slotwise mul)
    from stark_rings_tpu.rings import get_ring

    ring = get_ring("frog")
    er = RingElems(ring)
    A2 = SparseMatrix.from_entries(
        er, 3, 3, [(0, 1, [2] * ring.D), (2, 2, [3] * ring.D)])
    B2 = SparseMatrix.from_entries(
        er, 3, 3, [(1, 0, [5] * ring.D), (2, 2, [7] * ring.D)])
    C2 = A2.mul_sparse(B2)
    assert C2.nnz <= 2
    got2 = C2.to_dense().decode()
    want01 = [v % ring.q for v in
              np.asarray(ring.decode(ring.ntt_mul(
                  ring.encode_coeffs(np.full(ring.D, 2, dtype=object)),
                  ring.encode_coeffs(np.full(ring.D, 5, dtype=object)))))]
    assert [int(v) for v in got2[0][0]] == [int(v) for v in want01]


def test_symmetric_matrix_and_gadget_recompose():
    f = get_field("goldilocks")
    e = FieldElems(f)
    rng = random.Random(24)
    q = f.q
    n, d = 2, 3
    nd = n * d
    rows = [[rng.randrange(q) for _ in range(i + 1)] for i in range(nd)]
    S = SymmetricMatrix.from_rows(e, rows)
    assert S.size() == nd
    dense = np.asarray(f.decode(S.to_dense()))
    for i in range(nd):
        for j in range(nd):
            assert dense[i][j] == dense[j][i]
    b = 256
    pb_ints = [pow(b, i, q) for i in range(d)]
    pb = e.encode(np.array(pb_ints, dtype=object))
    G = recompose_left_right_symmetric_matrix(S, pb)
    got = np.asarray(f.decode(G.to_dense()))
    for i in range(n):
        for j in range(n):
            want = 0
            for k in range(nd):
                for l in range(nd):
                    if k // d == i and l // d == j:
                        want += int(dense[k][l]) * pb_ints[k % d] * \
                            pb_ints[l % d]
            assert got[i][j] == want % q, (i, j)


def test_rounded_div_jnp():
    import itertools

    vals = [-17, -8, -5, -2, -1, 0, 1, 2, 5, 8, 17]
    divs = [-6, -4, -2, 2, 4, 6]
    for a, b in itertools.product(vals, divs):
        got = int(rounded_div_jnp(np.int64(a), np.int64(b)))
        assert got == rounded_div(a, b), (a, b)


def test_try_mul_aliases_raise_and_match():
    """try_mul_vec/try_mul_mat (matrix.rs:180-205): same results as the
    checked path, AlgebraError on dimension mismatch."""
    from stark_rings_tpu.linalg import AlgebraError

    f = get_field("goldilocks")
    e = FieldElems(f)
    rng = random.Random(77)
    A = Matrix.rand(e, 3, 4, rng)
    B = Matrix.rand(e, 4, 2, rng)
    v = f.rand((4,), rng)
    got = np.asarray(f.decode(A.try_mul_mat(B).vals))
    want = np.asarray(f.decode(A.mul_mat(B).vals))
    assert (got == want).all()
    gv = np.asarray(f.decode(A.try_mul_vec(v)))
    wv = np.asarray(f.decode(A.mul_vec(v)))
    assert (gv == wv).all()
    with pytest.raises(AlgebraError):
        A.try_mul_mat(A)
    with pytest.raises(AlgebraError):
        A.try_mul_vec(f.rand((3,), rng))


def test_symmetric_from_fn():
    """from_fn == the reference's from_par_fn (symmetric_matrix.rs:77-89):
    entry (i, j) = func(i, j), both scalar and vectorized forms."""
    import jax.numpy as jnp
    from stark_rings_tpu.fields import GOLDILOCKS as F
    from stark_rings_tpu.linalg import FieldElems, SymmetricMatrix

    e = FieldElems(F)
    n = 5
    m = SymmetricMatrix.from_fn(e, n, lambda i, j: 10 * i + j)
    mv = SymmetricMatrix.from_fn(
        e, n, lambda ii, jj: jnp.asarray(10 * ii + jj, dtype=jnp.uint64),
        vectorized=True)
    for i in range(n):
        for j in range(n):
            assert int(F.decode(m.at(i, j))) == 10 * max(i, j) + min(i, j)
            assert int(F.decode(mv.at(i, j))) == 10 * max(i, j) + min(i, j)


@pytest.mark.parametrize("name", ["goldilocks", "stark_prime"])
def test_mul_mat_blocked_equals_unblocked(name):
    """The k-blocked widened-accumulator mul_mat == the one-shot path,
    for scalar and ring elements (incl. the limbed field)."""
    f = get_field(name)
    e = FieldElems(f)
    rng = random.Random(31)
    A = Matrix.rand(e, 6, 17, rng)
    B = Matrix.rand(e, 17, 5, rng)
    want = np.asarray(A.mul_mat(B, block=17).vals)       # one-shot
    for blk in (1, 3, 16):
        got = np.asarray(A.mul_mat(B, block=blk).vals)
        assert (got == want).all(), (name, blk)

    ring = get_ring(name)
    er = RingElems(ring)
    RA = Matrix.rand(er, 3, 9, rng)
    RB = Matrix.rand(er, 9, 4, rng)
    want = np.asarray(RA.mul_mat(RB, block=9).vals)
    got = np.asarray(RA.mul_mat(RB, block=2).vals)
    assert (got == want).all(), name


@pytest.mark.slow
def test_mul_mat_256_ring_in_ram():
    """A 256x256x256 Goldilocks-ring mat-mat completes within the block
    budget (the naive [n,k,m]+elem product would allocate ~25 GB)."""
    ring = get_ring("goldilocks")
    e = RingElems(ring)
    rng = random.Random(32)
    A = Matrix.rand(e, 256, 256, rng)
    B = Matrix.rand(e, 256, 256, rng)
    C = A.mul_mat(B)
    assert C.vals.shape[:2] == (256, 256)
    # spot-check one output cell against the direct row-column product
    f = ring.field
    want = np.asarray(f.decode(
        f.sum(ring.ntt_mul(A.vals[7], B.vals[:, 11]), 0)))
    got = np.asarray(f.decode(C.vals[7, 11]))
    assert (got == want).all()


@pytest.mark.slow
def test_mul_sparse_1e5_nnz_host_join_fast():
    """The vectorized searchsorted equi-join handles 10^5-nnz operands in
    seconds (the per-entry Python join took minutes at this scale)."""
    import time

    f = get_field("goldilocks")
    e = FieldElems(f)
    n = 2000
    nnz = 100_000
    rs = np.random.default_rng(33)
    rows = rs.integers(0, n, nnz).astype(np.int32)
    cols = rs.integers(0, n, nnz).astype(np.int32)
    data = f.encode(rs.integers(0, f.q, nnz, dtype=np.uint64).astype(object))
    A = SparseMatrix(e, n, n, data, rows, cols)
    t0 = time.monotonic()
    C = A.mul_sparse(A.transpose())
    C.data.block_until_ready()
    assert time.monotonic() - t0 < 60
    # correctness spot-check: one output row vs mul_vec with a basis col
    r0 = int(C.rows[0])
    c0 = int(C.cols[0])
    basis = np.zeros(n, dtype=object)
    basis[c0] = 1
    col = f.decode(A.mul_vec(
        A.transpose().mul_vec(f.encode(basis))))
    assert int(f.decode(C.data[0])) == int(col[r0])
