"""Utilities: serialization, profiling helpers."""

from .checkpoint import load_tensors, save_tensors
from .serialize import (
    elem_nbytes,
    elements_from_bytes,
    elements_to_bytes,
    vec_from_bytes,
    vec_to_bytes,
)
from .trace import trace_span

__all__ = [
    "elem_nbytes", "elements_to_bytes", "elements_from_bytes",
    "vec_to_bytes", "vec_from_bytes", "trace_span",
    "save_tensors", "load_tensors",
]
