"""Mesh helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    """1-D device mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert len(devs) >= n_devices, \
        f"need {n_devices} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n_devices]), (axis,))
