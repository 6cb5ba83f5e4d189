"""Operator-level ring elements: the reference's `RqPoly` / `RqNTT`
ergonomics on top of the functional batched API.

The reference exposes per-model type aliases and full operator impls
(`coeff_form.rs:608-711`, `ntt_form.rs`); this wrapper gives migrating
users the same surface — ``a * b``, ``a + b``, ``-a``, ``a * 3``,
``a == b`` — over ONE element or a whole batch (leading axes), carrying
the form ("coeff" / "ntt") so form errors are caught at the API instead
of producing silently-wrong slotwise products.

The wrapper is host-side sugar: each operator calls the corresponding
traced kernel (so chains of operators jit-fuse only per-op).  Inside a
``jax.jit`` region, prefer the functional `RingModel` methods; `Rq`
methods are trace-safe but the form bookkeeping is python-level.

    >>> R = get_ring("goldilocks")
    >>> a = Rq.rand(R, (), random.Random(0))        # coeff form
    >>> b = Rq.from_ints(R, [1] + [0] * (R.D - 1))  # the constant 1
    >>> (a * b) == a
    True
    >>> an = a.crt()                                 # NTT form
    >>> (an * an).icrt() == a * a
    True
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["Rq"]


class Rq:
    """One ring element or a batch ([..., D(, L)] storage) with a form."""

    __slots__ = ("ring", "form", "data")

    def __init__(self, ring, form: str, data):
        assert form in ("coeff", "ntt")
        self.ring = ring
        self.form = form
        self.data = data

    # -- constructors ------------------------------------------------------
    @classmethod
    def coeff(cls, ring, data):
        return cls(ring, "coeff", data)

    @classmethod
    def ntt(cls, ring, data):
        return cls(ring, "ntt", data)

    @classmethod
    def from_ints(cls, ring, ints, form: str = "coeff"):
        """From python ints; lists longer than D reduce mod Phi(X)
        (From<Vec> semantics, coeff_form.rs:568-578)."""
        if form == "coeff":
            return cls(ring, form, ring.from_coeff_list(list(ints)))
        arr = np.asarray(ints, dtype=object)
        return cls(ring, form, ring.encode_coeffs(arr))

    @classmethod
    def from_scalar(cls, ring, v: int, form: str = "coeff", shape=()):
        data = (ring.from_scalar_coeff(v, shape) if form == "coeff"
                else ring.from_scalar_ntt(v, shape))
        return cls(ring, form, data)

    @classmethod
    def zero(cls, ring, shape=(), form: str = "coeff"):
        return cls(ring, form, ring.zeros(shape))

    @classmethod
    def one(cls, ring, shape=(), form: str = "coeff"):
        return cls.from_scalar(ring, 1, form, shape)

    @classmethod
    def rand(cls, ring, shape, rng, form: str = "coeff"):
        return cls(ring, form, ring.rand_coeff(shape, rng))

    # -- views ---------------------------------------------------------------
    def crt(self) -> "Rq":
        assert self.form == "coeff", "crt() needs coefficient form"
        return Rq(self.ring, "ntt", self.ring.crt(self.data))

    def icrt(self) -> "Rq":
        assert self.form == "ntt", "icrt() needs NTT form"
        return Rq(self.ring, "coeff", self.ring.icrt(self.data))

    def decode(self):
        """Canonical python-int coefficients (host)."""
        return self.ring.decode(self.data)

    def coeffs(self):
        """PolyRing::coeffs view — the storage tensor itself."""
        return self.data

    def ct(self):
        """Constant term (CoeffRing::ct)."""
        assert self.form == "coeff"
        f = self.ring.field
        return f.take_coeff(self.data, np.arange(1, dtype=np.int32))

    # -- arithmetic ------------------------------------------------------
    def _like(self, data):
        return Rq(self.ring, self.form, data)

    def _check(self, other):
        assert isinstance(other, Rq) and other.ring is self.ring
        assert other.form == self.form, \
            f"form mismatch: {self.form} vs {other.form}"

    def __add__(self, other):
        self._check(other)
        return self._like(self.ring.add(self.data, other.data))

    def __sub__(self, other):
        self._check(other)
        return self._like(self.ring.sub(self.data, other.data))

    def __neg__(self):
        return self._like(self.ring.neg(self.data))

    def __mul__(self, other):
        if isinstance(other, Rq):
            self._check(other)
            mul = (self.ring.ntt_mul if self.form == "ntt"
                   else self.ring.coeff_mul)
            return self._like(mul(self.data, other.data))
        if isinstance(other, (int, np.integer)):
            s = jnp.asarray(self.ring.field.const(int(other)))
            return self._like(self.ring.scalar_mul(s, self.data))
        # base-field scalar in storage form
        return self._like(self.ring.scalar_mul(other, self.data))

    __rmul__ = __mul__

    def square(self) -> "Rq":
        """self * self; coeff form saves one forward transform when the
        ring provides coeff_square (PowerRing)."""
        if self.form == "ntt":
            return self._like(self.ring.ntt_mul(self.data, self.data))
        sq = getattr(self.ring, "coeff_square", None)
        if sq is not None:
            return self._like(sq(self.data))
        return self._like(self.ring.coeff_mul(self.data, self.data))

    def __pow__(self, e: int):
        """Ring::pow (ring.rs:13-117 default: square-and-multiply) on
        either form: coeff-form elements route through CRT — identical
        result, one transform round trip instead of log2(e) schoolbook
        multiplies (the reference computes pow directly on RqPoly; the
        results agree by test_mul_crt-style equivalence)."""
        assert e >= 0, "negative exponents: use inv() then pow"
        if self.form == "coeff":
            n = self.ring.ntt_pow(self.ring.crt(self.data), e)
            return self._like(self.ring.icrt(n))
        return self._like(self.ring.ntt_pow(self.data, e))

    def inv(self):
        assert self.form == "ntt", "inverse is slotwise (NTT form)"
        return self._like(self.ring.ntt_inv(self.data))

    def rot(self):
        """Multiply by X in place-semantics (Cyclotomic::rot)."""
        assert self.form == "coeff"
        return self._like(self.ring.rot(self.data))

    def __eq__(self, other):
        if not isinstance(other, Rq):
            return NotImplemented
        if other.ring is not self.ring or other.form != self.form:
            return False
        return bool(jnp.array_equal(jnp.asarray(self.data),
                                    jnp.asarray(other.data)))

    def __hash__(self):  # storage tensors are unhashable; identity hash
        return id(self)

    # -- decomposition / norms --------------------------------------------
    def decompose(self, b: int, k: int):
        """Balanced digits along a new axis (Decompose trait); coeff
        form, returns raw digit storage [..., k, D(, L)]."""
        from ..decomp import decompose_ring

        assert self.form == "coeff"
        return decompose_ring(self.ring.field, self.data, b, k)

    @classmethod
    def recompose(cls, ring, digits, b: int):
        from ..decomp import recompose_ring

        return cls(ring, "coeff", recompose_ring(ring.field, digits, b))

    def linf_norm(self):
        from ..decomp import linf_norm

        assert self.form == "coeff"
        return linf_norm(self.ring.field, self.data)

    def l2_norm_squared_words(self):
        """Traced exact ||.||_2^2 over ALL coefficients (WithL2Norm,
        traits.rs:6-56) as little-endian base-2^32 words; decode with
        decomp.words_to_int."""
        from ..decomp import l2_norm_squared_words

        assert self.form == "coeff"
        return l2_norm_squared_words(self.ring.field, self.data)

    def l2_check(self, bound_sq: int):
        """Traced ||.||_2^2 <= bound_sq (no host round trip)."""
        from ..decomp import l2_check

        assert self.form == "coeff"
        return l2_check(self.ring.field, self.data, bound_sq)

    # -- misc ---------------------------------------------------------------
    @property
    def shape(self):
        """Batch shape (leading axes before the coefficient axis)."""
        nd = 2 if self.ring.field.limbed else 1
        return jnp.asarray(self.data).shape[:-nd]

    def __repr__(self):
        return (f"Rq({self.ring.name}, {self.form}, "
                f"batch={tuple(self.shape)})")
