"""Prime-field layer (L0): vectorized modular arithmetic for the four
STARK-friendly primes of the reference (goldilocks, babybear, frog,
stark_prime).  Replaces arkworks' MontBackend (reference
crates/ring/src/cyclotomic_ring/models/*/mod.rs field declarations)."""

from .field import BABYBEAR, FIELDS, FROG, GOLDILOCKS, STARK, Field, get_field

__all__ = [
    "Field", "get_field", "FIELDS",
    "GOLDILOCKS", "BABYBEAR", "FROG", "STARK",
]
