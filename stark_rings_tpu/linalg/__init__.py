"""Ring linear algebra (the stark-rings-linalg crate, L1 of the reference):
dense / sparse / symmetric matrices over ring elements, transpose and
rounded division — as batched JAX tensor ops."""

from .elems import FieldElems, RingCoeffElems, RingElems
from .matrix import Matrix
from .ops import pad_ragged, rounded_div_jnp, transpose
from .sparse import SparseMatrix
from .symmetric import SymmetricMatrix, recompose_left_right_symmetric_matrix

__all__ = [
    "Matrix", "SparseMatrix", "SymmetricMatrix",
    "FieldElems", "RingElems", "RingCoeffElems",
    "transpose", "rounded_div_jnp", "pad_ragged",
    "recompose_left_right_symmetric_matrix", "AlgebraError",
]


class AlgebraError(ValueError):
    """Mirror of AlgebraError::DifferentLengths
    (linear_algebra/src/error.rs:4-8)."""
