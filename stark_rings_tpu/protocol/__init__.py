"""Protocol layer: composed folding-step pipelines.

The reference is the algebra toolkit under lattice folding schemes
(README.md:1-5); this package composes its pieces — challenge multiply,
gadget decomposition, range/norm checks, Ajtai commitment — into ONE
jitted module per step, so a prover pays the layout transposes and
dispatch latency once per step instead of once per stage."""

from .folding import FoldingStep, ntt_matvec
from .tree import FoldingTree

__all__ = ["FoldingStep", "FoldingTree", "ntt_matvec"]
