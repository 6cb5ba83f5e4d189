"""Norms over signed representatives (reference traits.rs:6-56:
WithL2Norm -> BigUint, WithLinfNorm -> BigUint; blanket impls for slices).

Exact norms are host-side python ints (the reference returns BigUint —
arbitrary precision); ``linf_norm`` in `.balanced` gives the traced
device variant for scalar fields."""

from __future__ import annotations

import numpy as np

from ..fields import Field
from ..spec.field import to_signed

__all__ = ["l2_norm_squared", "linf_norm_exact"]


def _signed_iter(f: Field, x):
    vals = f.decode(x)
    for v in np.asarray(vals, dtype=object).reshape(-1):
        yield to_signed(int(v), f.q)


def l2_norm_squared(f: Field, x) -> int:
    """sum of squared signed representatives (WithL2Norm)."""
    return sum(s * s for s in _signed_iter(f, x))


def linf_norm_exact(f: Field, x) -> int:
    """max |signed representative| (WithLinfNorm)."""
    return max((abs(s) for s in _signed_iter(f, x)), default=0)
