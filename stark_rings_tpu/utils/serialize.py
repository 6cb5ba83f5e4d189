"""Canonical byte serialization (reference: arkworks CanonicalSerialize
derive on ring elements coeff_form.rs:154-189, matrices matrix.rs:111-145,
MLEs dense.rs:17).

Layout matches arkworks' compressed mode for the structures parity tests
exercise: a field element is the little-endian canonical integer in
ceil(modulus_bits / 8) bytes; a Vec is a u64 LE length prefix followed by
items; a matrix is nrows, ncols (u64 LE) then row-major elements."""

from __future__ import annotations

import struct

import numpy as np

from ..fields import Field

__all__ = [
    "elem_nbytes", "elements_to_bytes", "elements_from_bytes",
    "vec_to_bytes", "vec_from_bytes",
]


def elem_nbytes(f: Field) -> int:
    return (f.bits + 7) // 8


def elements_to_bytes(f: Field, x) -> bytes:
    """Serialize every element of a storage tensor, row-major, no header."""
    nb = elem_nbytes(f)
    vals = np.asarray(f.decode(x), dtype=object).reshape(-1)
    return b"".join(int(v).to_bytes(nb, "little") for v in vals)


def elements_from_bytes(f: Field, data: bytes, shape):
    nb = elem_nbytes(f)
    count = int(np.prod(shape, dtype=np.int64)) if shape else 1
    assert len(data) >= count * nb, "short buffer"
    out = np.empty(count, dtype=object)
    for i in range(count):
        v = int.from_bytes(data[i * nb:(i + 1) * nb], "little")
        assert v < f.q, "non-canonical field element"
        out[i] = v
    return f.encode(out.reshape(shape) if shape else out[0])


def vec_to_bytes(f: Field, x, n: int) -> bytes:
    """u64 LE length prefix + elements (arkworks Vec layout)."""
    return struct.pack("<Q", n) + elements_to_bytes(f, x)


def vec_from_bytes(f: Field, data: bytes, elem_shape=()):
    (n,) = struct.unpack_from("<Q", data, 0)
    body = data[8:]
    shape = (n,) + tuple(elem_shape)
    return n, elements_from_bytes(f, body, shape)
