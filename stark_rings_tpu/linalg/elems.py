"""Element-ops adapters: one protocol for 'a matrix/vector of THINGS'.

The reference's linalg crate is generic over any ``R: Clone + Mul + Sum``
(linear_algebra/src/lib.rs); here the genericity is an adapter exposing
``mul/add/sub/neg/sum`` plus the element's trailing-axis count, so the same
Matrix/SparseMatrix code runs over

* base-field scalars            (``FieldElems(field)``),
* NTT-form ring elements        (``RingElems(ring)`` — slotwise mul),
* coeff-form ring elements      (``RingCoeffElems(ring)`` — schoolbook mul).
"""

from __future__ import annotations

from ..fields import Field
from ..rings import RingModel

__all__ = ["FieldElems", "RingElems", "RingCoeffElems"]


class FieldElems:
    def __init__(self, field: Field):
        self.f = field
        self.elem_ndim = 1 if field.limbed else 0
        self.elem_shape = field.limb_shape

    def mul(self, a, b):
        return self.f.mul(a, b)

    def add(self, a, b):
        return self.f.add(a, b)

    def sub(self, a, b):
        return self.f.sub(a, b)

    def neg(self, a):
        return self.f.neg(a)

    def sum(self, x, axis):
        return self.f.sum(x, axis)

    def zeros(self, shape):
        return self.f.zeros(shape)

    def encode(self, ints):
        return self.f.encode(ints)

    def decode(self, x):
        return self.f.decode(x)

    def one(self):
        return self.f.ones(())

    def rand(self, shape, rng):
        return self.f.rand(shape, rng)


class RingElems(FieldElems):
    """NTT-form ring elements: shape [..., D(,L)], slotwise multiply."""

    def __init__(self, ring: RingModel):
        super().__init__(ring.field)
        self.ring = ring
        self.elem_ndim = 1 + (1 if ring.field.limbed else 0)
        self.elem_shape = (ring.D,) + ring.field.limb_shape

    def mul(self, a, b):
        return self.ring.ntt_mul(a, b)

    def zeros(self, shape):
        return self.f.zeros(tuple(shape) + (self.ring.D,))

    def one(self):
        return self.ring.from_scalar_ntt(1)

    def rand(self, shape, rng):
        return self.ring.rand_ntt(shape, rng)


class RingCoeffElems(RingElems):
    """Coefficient-form ring elements: schoolbook multiply."""

    def mul(self, a, b):
        return self.ring.coeff_mul(a, b)

    def one(self):
        return self.ring.from_scalar_coeff(1)

    def rand(self, shape, rng):
        return self.ring.rand_coeff(shape, rng)
