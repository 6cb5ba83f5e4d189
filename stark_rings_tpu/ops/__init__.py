"""Derived kernel tables and generic ops (CRT stage tables, large-degree
NTTs).  The CRT dataflow of the reference's hand-unrolled kernels
(goldilocks/ntt.rs etc.) is represented here as data — 2-term sparse linear
stages — applied as batched gathers + modular muls."""

from .stages import StageTable, derive_linear_table, derive_stage_tables

__all__ = ["StageTable", "derive_linear_table", "derive_stage_tables"]
