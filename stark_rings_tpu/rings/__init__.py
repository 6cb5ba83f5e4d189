"""Cyclotomic ring layer (L2): the four models of the reference
(crates/ring/src/cyclotomic_ring/models/) as batched JAX ring kernels."""

from .ring import RINGS, RingModel, get_ring

__all__ = ["RingModel", "get_ring", "RINGS"]
