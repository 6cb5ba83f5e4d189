"""Canonical byte serialization (reference: arkworks CanonicalSerialize
derive on ring elements coeff_form.rs:154-189, matrices matrix.rs:111-145,
MLEs dense.rs:17).

Layout matches arkworks for the structures parity tests exercise: a field
element is the little-endian canonical integer in ceil(modulus_bits / 8)
bytes; a Vec is a u64 LE length prefix followed by items; a matrix is
nrows, ncols (u64 LE) then row-major elements.

Serialization MODES (arkworks Compress / Validate, serialize.rs):

* ``compress`` — for prime-field containers the compressed and
  uncompressed byte streams are IDENTICAL (Fp has no point compression;
  arkworks' derive writes the same bytes for both modes on every
  structure here).  The flag is accepted and byte-tested equal, exactly
  matching the reference's observable behavior.
* ``validate`` — arkworks' ``Validate::No`` skips *structural* invariant
  checks; Fp canonicity is ALWAYS enforced (ark-ff Fp deserialization
  goes through ``from_bigint``, which rejects values >= q regardless of
  the flag).  Here ``validate=False`` likewise skips structure-level
  asserts (symmetric row lengths, elen == 2^num_vars, outer-vec count)
  while every element read still asserts canonicity.

The six arkworks entry points (``serialize_compressed``,
``serialize_uncompressed``, ``deserialize_compressed[_unchecked]``,
``deserialize_uncompressed[_unchecked]``) are provided as type-dispatched
wrappers at the bottom."""

from __future__ import annotations

import struct

import numpy as np

from ..fields import Field

__all__ = [
    "elem_nbytes", "elements_to_bytes", "elements_from_bytes",
    "vec_to_bytes", "vec_from_bytes",
    "matrix_to_bytes", "matrix_from_bytes",
    "symmetric_matrix_to_bytes", "symmetric_matrix_from_bytes",
    "sparse_matrix_to_bytes", "sparse_matrix_from_bytes",
    "dense_mle_to_bytes", "dense_mle_from_bytes",
    "sparse_mle_to_bytes", "sparse_mle_from_bytes",
    "serialize_compressed", "serialize_uncompressed",
    "deserialize_compressed", "deserialize_compressed_unchecked",
    "deserialize_uncompressed", "deserialize_uncompressed_unchecked",
]


def elem_nbytes(f: Field) -> int:
    return (f.bits + 7) // 8


def elements_to_bytes(f: Field, x, compress: bool = True) -> bytes:
    """Serialize every element of a storage tensor, row-major, no header."""
    nb = elem_nbytes(f)
    vals = np.asarray(f.decode(x), dtype=object).reshape(-1)
    return b"".join(int(v).to_bytes(nb, "little") for v in vals)


def elements_from_bytes(f: Field, data: bytes, shape,
                        compress: bool = True, validate: bool = True):
    nb = elem_nbytes(f)
    count = int(np.prod(shape, dtype=np.int64)) if shape else 1
    assert len(data) >= count * nb, "short buffer"
    out = np.empty(count, dtype=object)
    for i in range(count):
        v = int.from_bytes(data[i * nb:(i + 1) * nb], "little")
        assert v < f.q, "non-canonical field element"
        out[i] = v
    return f.encode(out.reshape(shape) if shape else out[0])


def vec_to_bytes(f: Field, x, n: int, compress: bool = True) -> bytes:
    """u64 LE length prefix + elements (arkworks Vec layout)."""
    return struct.pack("<Q", n) + elements_to_bytes(f, x)


def vec_from_bytes(f: Field, data: bytes, elem_shape=(),
                   compress: bool = True, validate: bool = True):
    (n,) = struct.unpack_from("<Q", data, 0)
    body = data[8:]
    shape = (n,) + tuple(elem_shape)
    return n, elements_from_bytes(f, body, shape)


# ---------------------------------------------------------------------------
# structure codecs (arkworks compressed layouts)
# ---------------------------------------------------------------------------
#
# arkworks derives serialize fields in declaration order; usize is u64 LE;
# Vec<T> is a u64 LE length then items; BTreeMap<K, V> is a u64 LE length
# then (key, value) pairs in ascending key order; a tuple (R, usize) is R's
# bytes then the u64 index.
#
#   Matrix        = Vec<Vec<R>>                    (matrix.rs:111-145)
#   SparseMatrix  = u64 nrows, u64 ncols,
#                   Vec<Vec<(R, usize)>>           (sparse_matrix.rs:158-199)
#   DenseMLE      = Vec<R> evals (lnze-truncated), u64 num_vars, u64 elen,
#                   R zero                         (dense.rs:17-24)
#   SparseMLE     = BTreeMap<u64, R>, u64 num_vars, R zero  (sparse.rs:24-31)


def _elem_width(elems) -> int:
    """Serialized byte width of one adapter element."""
    ring = getattr(elems, "ring", None)
    nb = elem_nbytes(elems.f)
    return nb * (ring.D if ring is not None else 1)


def _decode_flat(elems, x):
    """Adapter elements -> list of python-int tuples (ring: D ints)."""
    ring = getattr(elems, "ring", None)
    vals = np.asarray(elems.decode(x), dtype=object)
    if ring is not None:
        flat = vals.reshape(-1, ring.D)
        return [tuple(int(v) for v in row) for row in flat]
    return [(int(v),) for v in vals.reshape(-1)]


def _elem_bytes(elems, ints) -> bytes:
    nb = elem_nbytes(elems.f)
    return b"".join(int(v).to_bytes(nb, "little") for v in ints)


def _read_elem(elems, data: bytes, off: int):
    ring = getattr(elems, "ring", None)
    nb = elem_nbytes(elems.f)
    n = ring.D if ring is not None else 1
    out = []
    for i in range(n):
        v = int.from_bytes(data[off + i * nb:off + (i + 1) * nb], "little")
        assert v < elems.f.q, "non-canonical field element"
        out.append(v)
    return out, off + n * nb


def _encode_elems(elems, int_rows):
    """list of element int-tuples -> storage tensor [n(, D)(, L)]."""
    ring = getattr(elems, "ring", None)
    if ring is not None:
        arr = np.array([list(r) for r in int_rows], dtype=object) \
            if int_rows else np.zeros((0, ring.D), dtype=object)
        return elems.encode(arr)
    arr = np.array([r[0] for r in int_rows], dtype=object) \
        if int_rows else np.zeros((0,), dtype=object)
    return elems.encode(arr)


def matrix_to_bytes(mat, compress: bool = True) -> bytes:
    """Matrix -> arkworks Vec<Vec<R>> compressed bytes."""
    rows = _decode_flat(mat.e, mat.vals)
    ncols = mat.ncols
    out = [struct.pack("<Q", mat.nrows)]
    for r in range(mat.nrows):
        out.append(struct.pack("<Q", ncols))
        for c in range(ncols):
            out.append(_elem_bytes(mat.e, rows[r * ncols + c]))
    return b"".join(out)


def matrix_from_bytes(elems, data: bytes,
                      compress: bool = True, validate: bool = True):
    from ..linalg import Matrix

    (nrows,) = struct.unpack_from("<Q", data, 0)
    off = 8
    rows = []
    ncols = 0
    for _ in range(nrows):
        (ncols,) = struct.unpack_from("<Q", data, off)
        off += 8
        for _ in range(ncols):
            e, off = _read_elem(elems, data, off)
            rows.append(tuple(e))
    vals = _encode_elems(elems, rows)
    shape = (nrows, ncols) + vals.shape[1:]
    return Matrix(elems, vals.reshape(shape))


def symmetric_matrix_to_bytes(sym, compress: bool = True) -> bytes:
    """SymmetricMatrix -> arkworks Vec<Vec<F>> compressed bytes.

    The reference serializes the packed lower-triangular rows directly
    (symmetric_matrix.rs:116-130: CanonicalSerialize of the inner
    Vec<Vec<F>>, row i holding i+1 entries)."""
    vals = _decode_flat(sym.e, sym.vals)
    out = [struct.pack("<Q", sym.n)]
    k = 0
    for i in range(sym.n):
        out.append(struct.pack("<Q", i + 1))
        for _ in range(i + 1):
            out.append(_elem_bytes(sym.e, vals[k]))
            k += 1
    return b"".join(out)


def symmetric_matrix_from_bytes(elems, data: bytes,
                                compress: bool = True, validate: bool = True):
    from ..linalg import SymmetricMatrix

    (n,) = struct.unpack_from("<Q", data, 0)
    off = 8
    flat = []
    for i in range(n):
        (rl,) = struct.unpack_from("<Q", data, off)
        if validate:
            assert rl == i + 1, "row i must have i+1 entries"
        off += 8
        for _ in range(rl):
            e, off = _read_elem(elems, data, off)
            flat.append(tuple(e))
    vals = _encode_elems(elems, flat)
    return SymmetricMatrix(elems, n, vals)


def sparse_matrix_to_bytes(sp, compress: bool = True) -> bytes:
    """SparseMatrix -> u64 nrows, u64 ncols, Vec<Vec<(R, u64 col)>>.

    Entries are emitted in (row, col) order; all-zero (padding) entries
    are dropped — the reference never stores structural zeros."""
    vals = _decode_flat(sp.e, sp.data)
    rows_idx = np.asarray(sp.rows)
    cols_idx = np.asarray(sp.cols)
    per_row = [[] for _ in range(sp.nrows)]
    for i in range(sp.nnz):
        if any(vals[i]):
            per_row[int(rows_idx[i])].append((int(cols_idx[i]), vals[i]))
    out = [struct.pack("<QQ", sp.nrows, sp.ncols),
           struct.pack("<Q", sp.nrows)]
    for row in per_row:
        row.sort()
        out.append(struct.pack("<Q", len(row)))
        for col, v in row:
            out.append(_elem_bytes(sp.e, v))
            out.append(struct.pack("<Q", col))
    return b"".join(out)


def sparse_matrix_from_bytes(elems, data: bytes,
                             compress: bool = True, validate: bool = True):
    from ..linalg import SparseMatrix

    nrows, ncols = struct.unpack_from("<QQ", data, 0)
    (outer,) = struct.unpack_from("<Q", data, 16)
    if validate:
        assert outer == nrows
    off = 24
    entries = []
    for r in range(nrows):
        (cnt,) = struct.unpack_from("<Q", data, off)
        off += 8
        for _ in range(cnt):
            e, off = _read_elem(elems, data, off)
            (col,) = struct.unpack_from("<Q", data, off)
            off += 8
            entries.append((r, col, tuple(e)))
    n = max(len(entries), 1)
    rr = np.zeros(n, dtype=np.int32)
    cc = np.zeros(n, dtype=np.int32)
    int_rows = [e[2] for e in entries]
    while len(int_rows) < n:
        ring = getattr(elems, "ring", None)
        int_rows.append((0,) * (ring.D if ring is not None else 1))
    for i, (r, c, _) in enumerate(entries):
        rr[i], cc[i] = r, c
    return SparseMatrix(elems, nrows, ncols,
                        _encode_elems(elems, int_rows), rr, cc)


def dense_mle_to_bytes(mle, compress: bool = True) -> bytes:
    """DenseMLE -> Vec<R> (trailing-zero truncated), u64 num_vars,
    u64 elen, R zero (dense.rs:17-24 field order)."""
    vals = _decode_flat(mle.e, mle.evals)
    last = 0
    for i, v in enumerate(vals):
        if any(v):
            last = i + 1
    ring = getattr(mle.e, "ring", None)
    width = ring.D if ring is not None else 1
    out = [struct.pack("<Q", last)]
    for v in vals[:last]:
        out.append(_elem_bytes(mle.e, v))
    out.append(struct.pack("<QQ", mle.num_vars, 1 << mle.num_vars))
    out.append(_elem_bytes(mle.e, (0,) * width))
    return b"".join(out)


def dense_mle_from_bytes(elems, data: bytes,
                         compress: bool = True, validate: bool = True):
    from ..mle import DenseMLE

    (n,) = struct.unpack_from("<Q", data, 0)
    off = 8
    rows = []
    for _ in range(n):
        e, off = _read_elem(elems, data, off)
        rows.append(tuple(e))
    num_vars, elen = struct.unpack_from("<QQ", data, off)
    if validate:
        assert elen == 1 << num_vars
    ring = getattr(elems, "ring", None)
    width = ring.D if ring is not None else 1
    rows += [(0,) * width] * (elen - n)
    return DenseMLE(elems, num_vars, _encode_elems(elems, rows))


def sparse_mle_to_bytes(mle, compress: bool = True) -> bytes:
    """SparseMLE -> BTreeMap<u64, R> (ascending keys, duplicates summed),
    u64 num_vars, R zero (sparse.rs:24-31 field order)."""
    vals = _decode_flat(mle.e, mle.values)
    q = mle.e.f.q
    acc = {}
    idx = np.asarray(mle.indices)
    for i in range(mle.nnz):
        if any(vals[i]):
            k = int(idx[i])
            cur = acc.get(k)
            acc[k] = tuple((a + b) % q for a, b in zip(cur, vals[i])) \
                if cur else vals[i]
    acc = {k: v for k, v in acc.items() if any(v)}
    ring = getattr(mle.e, "ring", None)
    width = ring.D if ring is not None else 1
    out = [struct.pack("<Q", len(acc))]
    for k in sorted(acc):
        out.append(struct.pack("<Q", k))
        out.append(_elem_bytes(mle.e, acc[k]))
    out.append(struct.pack("<Q", mle.num_vars))
    out.append(_elem_bytes(mle.e, (0,) * width))
    return b"".join(out)


def sparse_mle_from_bytes(elems, data: bytes,
                          compress: bool = True, validate: bool = True):
    from ..mle import SparseMLE

    (n,) = struct.unpack_from("<Q", data, 0)
    off = 8
    pairs = []
    for _ in range(n):
        (k,) = struct.unpack_from("<Q", data, off)
        off += 8
        e, off = _read_elem(elems, data, off)
        pairs.append((k, tuple(e)))
    (num_vars,) = struct.unpack_from("<Q", data, off)
    m = max(len(pairs), 1)
    ring = getattr(elems, "ring", None)
    width = ring.D if ring is not None else 1
    idx = np.zeros(m, dtype=np.int64)
    int_rows = [p[1] for p in pairs] + \
        [(0,) * width] * (m - len(pairs))
    for i, (k, _) in enumerate(pairs):
        idx[i] = k
    return SparseMLE(elems, num_vars, idx, _encode_elems(elems, int_rows))


# ---------------------------------------------------------------------------
# arkworks-style mode entry points (serialize.rs: serialize_compressed /
# serialize_uncompressed / deserialize_{compressed,uncompressed}[_unchecked])
# ---------------------------------------------------------------------------

_TO_BYTES = {
    "Matrix": matrix_to_bytes,
    "SymmetricMatrix": symmetric_matrix_to_bytes,
    "SparseMatrix": sparse_matrix_to_bytes,
    "DenseMLE": dense_mle_to_bytes,
    "SparseMLE": sparse_mle_to_bytes,
}

_FROM_BYTES = {
    "Matrix": matrix_from_bytes,
    "SymmetricMatrix": symmetric_matrix_from_bytes,
    "SparseMatrix": sparse_matrix_from_bytes,
    "DenseMLE": dense_mle_from_bytes,
    "SparseMLE": sparse_mle_from_bytes,
}


def _dispatch_to(obj, compress: bool) -> bytes:
    fn = _TO_BYTES.get(type(obj).__name__)
    if fn is None:
        raise TypeError(f"no codec for {type(obj).__name__}")
    return fn(obj, compress=compress)


def _dispatch_from(cls, elems, data: bytes, compress: bool, validate: bool):
    name = cls if isinstance(cls, str) else cls.__name__
    fn = _FROM_BYTES.get(name)
    if fn is None:
        raise TypeError(f"no codec for {name}")
    return fn(elems, data, compress=compress, validate=validate)


def serialize_compressed(obj) -> bytes:
    return _dispatch_to(obj, compress=True)


def serialize_uncompressed(obj) -> bytes:
    return _dispatch_to(obj, compress=False)


def deserialize_compressed(cls, elems, data: bytes):
    return _dispatch_from(cls, elems, data, compress=True, validate=True)


def deserialize_compressed_unchecked(cls, elems, data: bytes):
    return _dispatch_from(cls, elems, data, compress=True, validate=False)


def deserialize_uncompressed(cls, elems, data: bytes):
    return _dispatch_from(cls, elems, data, compress=False, validate=True)


def deserialize_uncompressed_unchecked(cls, elems, data: bytes):
    return _dispatch_from(cls, elems, data, compress=False, validate=False)
