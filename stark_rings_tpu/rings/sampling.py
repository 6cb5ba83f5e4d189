"""Random ring-element sampling: uniform, short, and short *invertible*
elements.

The eprint 2017/523 design point of the reference's ring choices
(README.md:1-5) is that each ring has a ~2^128-size set of short
invertible elements; this module provides the samplers a folding-scheme
prover needs on top of that guarantee:

* ``rand_uniform``    — uniform coefficients (reference ``rand``).
* ``sample_short``    — coefficients from the balanced range [-bound, bound].
* ``is_invertible``   — all CRT slots nonzero (a unit iff no slot is 0).
* ``sample_short_invertible`` — rejection loop (terminates fast by the
  2017/523 bound).
"""

from __future__ import annotations

import numpy as np

__all__ = ["rand_uniform", "sample_short", "is_invertible",
           "sample_short_invertible"]


def rand_uniform(ring, shape, rng):
    return ring.rand_coeff(shape, rng)


def sample_short(ring, shape, rng, bound: int):
    """Coefficient-form elements with coefficients in [-bound, bound]."""
    q = ring.q
    out = np.empty(tuple(shape) + (ring.D,), dtype=object)
    for i in np.ndindex(*out.shape):
        out[i] = rng.randint(-bound, bound) % q
    return ring.encode_coeffs(out)


def is_invertible(ring, x_coeff) -> np.ndarray:
    """True where the element is a unit: every CRT slot is nonzero.

    x_coeff: [..., D(,L)] coefficient form; returns bool [...]."""
    f = ring.field
    ntt = ring.crt(x_coeff)
    nd = 1 if f.limbed else 0
    batch = ntt.shape[: ntt.ndim - 1 - nd]
    slots = np.asarray(ntt).reshape(batch + (ring.N, ring.E) + f.limb_shape)
    zero_coord = slots == 0
    # slot is zero iff all E (and limb) coordinates are zero
    ax = tuple(range(len(batch) + 1, zero_coord.ndim))
    slot_zero = zero_coord.all(axis=ax)
    return ~slot_zero.any(axis=-1)


def sample_short_invertible(ring, rng, bound: int, max_tries: int = 256):
    """Rejection-sample one short invertible element."""
    for _ in range(max_tries):
        x = sample_short(ring, (), rng, bound)
        if bool(np.asarray(is_invertible(ring, x))):
            return x
    raise RuntimeError("no short invertible element found "
                       f"(bound={bound}, tries={max_tries})")
