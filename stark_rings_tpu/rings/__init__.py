"""Cyclotomic ring layer (L2): the four models of the reference
(crates/ring/src/cyclotomic_ring/models/) as batched JAX ring kernels,
plus power-of-two scale-ups, monomial algebra and sampling."""

from . import absorb, monomial, sampling
from .element import Rq
from .power import PowerRing, get_power_ring
from .ring import RINGS, RingModel, get_ring

__all__ = ["RingModel", "get_ring", "RINGS", "Rq", "PowerRing",
           "get_power_ring", "monomial", "sampling", "absorb"]
