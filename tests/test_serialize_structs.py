"""Structure serialization codecs vs hand-spelled arkworks compressed
byte layouts (reference: Matrix matrix.rs:111-145, SparseMatrix
sparse_matrix.rs:158-199, MLEs dense.rs:17-24 / sparse.rs:24-31)."""

import random
import struct

import numpy as np

from stark_rings_tpu.fields import get_field
from stark_rings_tpu.linalg import FieldElems, Matrix, RingElems, SparseMatrix
from stark_rings_tpu.mle import DenseMLE, SparseMLE
from stark_rings_tpu.rings import get_ring
from stark_rings_tpu.utils import (
    dense_mle_from_bytes,
    dense_mle_to_bytes,
    matrix_from_bytes,
    matrix_to_bytes,
    sparse_matrix_from_bytes,
    sparse_matrix_to_bytes,
    sparse_mle_from_bytes,
    sparse_mle_to_bytes,
)


def u64(v):
    return struct.pack("<Q", v)


def bb4(v):
    return int(v).to_bytes(4, "little")   # babybear Fq compressed = 4 bytes


def test_matrix_golden_bytes():
    """Vec<Vec<R>>: u64 nrows, then per row u64 ncols + elements."""
    f = get_field("babybear")
    e = FieldElems(f)
    M = Matrix.from_ints(e, [[1, 2], [3, 4]])
    got = matrix_to_bytes(M)
    want = (u64(2)
            + u64(2) + bb4(1) + bb4(2)
            + u64(2) + bb4(3) + bb4(4))
    assert got == want
    back = matrix_from_bytes(e, got)
    assert (np.asarray(back.vals) == np.asarray(M.vals)).all()


def test_sparse_matrix_golden_bytes():
    """u64 nrows, u64 ncols, Vec<Vec<(R, u64 col)>>."""
    f = get_field("babybear")
    e = FieldElems(f)
    S = SparseMatrix.from_entries(e, 2, 3, [(0, 1, 5), (1, 2, 7)])
    got = sparse_matrix_to_bytes(S)
    want = (u64(2) + u64(3)
            + u64(2)                     # outer Vec len == nrows
            + u64(1) + bb4(5) + u64(1)   # row 0: one (R, col) pair
            + u64(1) + bb4(7) + u64(2))  # row 1
    assert got == want
    back = sparse_matrix_from_bytes(e, got)
    a = back.to_dense().decode()
    b = S.to_dense().decode()
    for i in range(2):
        assert list(a[i]) == list(b[i])


def test_dense_mle_golden_bytes():
    """Vec<R> (trailing-zero truncated), u64 num_vars, u64 elen, R zero."""
    f = get_field("babybear")
    e = FieldElems(f)
    m = DenseMLE.from_ints(e, 2, [9, 0, 7, 0])
    got = dense_mle_to_bytes(m)
    want = (u64(3) + bb4(9) + bb4(0) + bb4(7)   # truncated evaluations
            + u64(2) + u64(4)                   # num_vars, elen
            + bb4(0))                           # zero sentinel
    assert got == want
    back = dense_mle_from_bytes(e, got)
    assert back.num_vars == 2
    assert [int(v) for v in back.decode()] == [9, 0, 7, 0]


def test_sparse_mle_golden_bytes():
    """BTreeMap<u64, R> ascending, u64 num_vars, R zero."""
    f = get_field("babybear")
    e = FieldElems(f)
    m = SparseMLE.from_pairs(e, 2, [(3, 8), (1, 5)])
    got = sparse_mle_to_bytes(m)
    want = (u64(2)
            + u64(1) + bb4(5)
            + u64(3) + bb4(8)
            + u64(2) + bb4(0))
    assert got == want
    back = sparse_mle_from_bytes(e, got)
    pt = [0, 0]
    assert int(f.decode(back.evaluate(
        [f.encode(np.array(v, dtype=object)) for v in [1, 0]]))) == \
        int(f.decode(m.evaluate(
            [f.encode(np.array(v, dtype=object)) for v in [1, 0]])))


def test_ring_and_limbed_roundtrips():
    """Ring-element matrices (D base-field values per element) and the
    252-bit stark field (32-byte elements) roundtrip."""
    ring = get_ring("goldilocks")
    er = RingElems(ring)
    rng = random.Random(9)
    M = Matrix(er, np.asarray(ring.rand_ntt((2, 3), rng)))
    back = matrix_from_bytes(er, matrix_to_bytes(M))
    assert (np.asarray(back.vals) == np.asarray(M.vals)).all()

    fs = get_field("stark_prime")
    es = FieldElems(fs)
    from stark_rings_tpu.utils import elem_nbytes

    assert elem_nbytes(fs) == 32
    MS = Matrix.rand(es, 2, 2, rng)
    backs = matrix_from_bytes(es, matrix_to_bytes(MS))
    assert (np.asarray(backs.vals) == np.asarray(MS.vals)).all()

    S = SparseMatrix.from_entries(
        er, 2, 2, [(0, 0, [3] * ring.D), (1, 1, [4] * ring.D)])
    backsp = sparse_matrix_from_bytes(er, sparse_matrix_to_bytes(S))
    a = backsp.to_dense().decode()
    b = S.to_dense().decode()
    for i in range(2):
        for j in range(2):
            assert list(a[i][j]) == list(b[i][j])

    dm = DenseMLE.rand(er, 3, rng)
    backd = dense_mle_from_bytes(er, dense_mle_to_bytes(dm))
    assert (np.asarray(backd.evals) == np.asarray(dm.evals)).all()


def test_symmetric_matrix_golden_bytes():
    """Vec<Vec<F>> of the packed rows: u64 n, then row i = u64 (i+1) +
    its i+1 elements (symmetric_matrix.rs:116-130)."""
    from stark_rings_tpu.linalg import SymmetricMatrix
    from stark_rings_tpu.utils.serialize import (
        symmetric_matrix_from_bytes, symmetric_matrix_to_bytes)

    f = get_field("babybear")
    e = FieldElems(f)
    S = SymmetricMatrix.from_rows(e, [[5], [6, 7], [8, 9, 10]])
    got = symmetric_matrix_to_bytes(S)
    want = (u64(3)
            + u64(1) + bb4(5)
            + u64(2) + bb4(6) + bb4(7)
            + u64(3) + bb4(8) + bb4(9) + bb4(10))
    assert got == want
    back = symmetric_matrix_from_bytes(e, got)
    assert back.n == 3
    assert (np.asarray(back.vals) == np.asarray(S.vals)).all()


def test_modes_compressed_equals_uncompressed_and_validate_gate():
    """arkworks mode parity: for prime-field containers the compressed
    and uncompressed streams are byte-identical (Fp has no point
    compression); Validate::No skips STRUCTURAL checks only — element
    canonicity is always enforced (ark-ff from_bigint rejects >= q
    regardless of the flag)."""
    import pytest

    from stark_rings_tpu.linalg import SymmetricMatrix
    from stark_rings_tpu.utils import (
        deserialize_compressed, deserialize_compressed_unchecked,
        deserialize_uncompressed, deserialize_uncompressed_unchecked,
        serialize_compressed, serialize_uncompressed)

    ring = get_ring("goldilocks")
    er = RingElems(ring)
    f = get_field("goldilocks")
    e = FieldElems(f)
    rng = random.Random(41)

    objs = [
        Matrix.rand(er, 2, 3, rng),
        SymmetricMatrix.from_rows(e, [[5], [6, 7], [8, 9, 10]]),
        SparseMatrix.from_entries(e, 3, 3, [(0, 1, 7), (2, 0, 9)]),
        DenseMLE.rand(er, 3, rng),
        SparseMLE.from_pairs(e, 4, [(3, 11), (9, 12)]),
    ]
    for obj in objs:
        comp = serialize_compressed(obj)
        uncomp = serialize_uncompressed(obj)
        assert comp == uncomp, type(obj).__name__
        elems = obj.e
        for de in (deserialize_compressed, deserialize_compressed_unchecked,
                   deserialize_uncompressed,
                   deserialize_uncompressed_unchecked):
            back = de(type(obj), elems, comp)
            assert serialize_compressed(back) == comp, \
                (type(obj).__name__, de.__name__)

    # structural validate gate: patch the SparseMatrix outer-vec count
    sp = SparseMatrix.from_entries(e, 3, 3, [(0, 1, 7), (2, 0, 9)])
    raw = bytearray(serialize_compressed(sp))
    raw[16:24] = struct.pack("<Q", 99)      # outer != nrows
    with pytest.raises(AssertionError):
        deserialize_compressed(SparseMatrix, e, bytes(raw))
    back = deserialize_compressed_unchecked(SparseMatrix, e, bytes(raw))
    assert back.nrows == 3 and back.ncols == 3

    # element canonicity is enforced even unchecked: q as raw bytes
    bad = bytearray(serialize_compressed(Matrix.from_ints(e, [[1]])))
    bad[16:24] = struct.pack("<Q", f.q)     # first element := q
    with pytest.raises(AssertionError):
        deserialize_compressed_unchecked(Matrix, e, bytes(bad))
