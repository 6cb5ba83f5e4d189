"""stark-rings-tpu: a TPU-native cyclotomic-ring algebra framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
NethermindEth/stark-rings (cyclotomic rings Fp[X]/Phi(X) for STARK-friendly
primes, balanced decomposition, ring linear algebra, multilinear
extensions), redesigned for TPU:

* ring elements are tensors; vectors of ring elements are batch axes
* the CRT/NTT butterfly dataflow is data (2-term linear stage tables)
  applied as fused vector ops
* rayon loops of the reference become vmap/batch axes on one chip and
  shard_map + collectives (all_to_all / psum) across chips
* unsafe transmute casts of the reference are free reshapes

Layer map (mirrors SURVEY.md §1):
    fields/    L0  prime-field kernels (replaces arkworks MontBackend)
    rings/     L2  four ring models: goldilocks, babybear, frog, stark_prime
    decomp/    L2  balanced/gadget decomposition
    linalg/    L1  dense/sparse/symmetric matrices over ring elements
    mle/       L3  dense/sparse multilinear extensions + helpers
    ops/       derived kernels: CRT stage tables, large power-of-two NTTs
    parallel/  multi-chip: mesh + four-step sharded NTT
    spec/      integer-exact oracle (bit-exactness anchor vs the Rust crate)
"""

from . import decomp, fields, linalg, mle, ops, parallel, rings, spec
from .fields import FIELDS, get_field
from .rings import RINGS, RingModel, get_ring

__version__ = "0.1.0"

__all__ = [
    "fields", "rings", "decomp", "linalg", "mle", "ops", "parallel", "spec",
    "get_field", "get_ring", "FIELDS", "RINGS", "RingModel",
]
