"""Model registry (template-conformant alias of `rings`).

The four reference ring models (crates/ring/src/cyclotomic_ring/models/)
plus the power-of-two scale-ups:

    >>> from stark_rings_tpu.models import goldilocks, babybear
    >>> goldilocks.D, goldilocks.N, goldilocks.E
    (24, 8, 3)
"""

from ..rings import PowerRing, RingModel, get_power_ring, get_ring

goldilocks = get_ring("goldilocks")
babybear = get_ring("babybear")
frog = get_ring("frog")
stark_prime = get_ring("stark_prime")

MODELS = {
    "goldilocks": goldilocks,
    "babybear": babybear,
    "frog": frog,
    "stark_prime": stark_prime,
}

__all__ = ["goldilocks", "babybear", "frog", "stark_prime", "MODELS",
           "RingModel", "PowerRing", "get_ring", "get_power_ring"]
