"""Multilinear extension layer (the stark-rings-poly crate, L3 of the
reference): dense/sparse MLEs + HyperPlonk-derived helpers."""

from .dense import DenseMLE
from .polynomials import (
    evaluate_opt,
    fix_last_variables,
    fix_variables,
    identity_permutation,
    identity_permutation_mles,
    merge_polynomials,
    random_mle_list,
    random_permutation,
    random_permutation_mles,
    random_zero_mle_list,
)
from .sparse import SparseMLE
from .util import (
    bit_decompose,
    gen_eval_point_bits,
    get_batched_nv,
    get_index,
    project,
    swap_bits,
)

__all__ = [
    "DenseMLE", "SparseMLE",
    "random_mle_list", "random_zero_mle_list",
    "identity_permutation", "identity_permutation_mles",
    "random_permutation", "random_permutation_mles",
    "evaluate_opt", "fix_variables", "fix_last_variables",
    "merge_polynomials",
    "bit_decompose", "project", "get_index", "get_batched_nv",
    "gen_eval_point_bits", "swap_bits",
]


class ArithError(ValueError):
    """Mirror of ArithErrors (polynomials/errors.rs:13-21)."""
