"""BabyBear Pallas fold epilogues (ops/pallas_fold_bb.py) are bit-exact
vs the XLA-fold MxuBBNTT (itself exact vs the radix NTT / spec chain,
tests/test_mxu_bb.py lineage) — interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stark_rings_tpu.ops.mxu_bb import MxuBBNTT, _Q
from stark_rings_tpu.ops.pallas_fold_bb import MxuBBPallasNTT


@pytest.mark.parametrize("fuse_transpose,fuse_pointwise,stack_forward",
                         [(False, False, False), (True, False, False),
                          (True, True, False), (True, True, True)])
def test_bb_pallas_mul_matches_xla_fold(fuse_transpose, fuse_pointwise,
                                        stack_forward):
    N, B = 1 << 12, 2
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.integers(0, _Q, size=(B, N), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, _Q, size=(B, N), dtype=np.uint32))
    want = np.asarray(jax.jit(MxuBBNTT(N).mul)(a, b))
    tp = MxuBBPallasNTT(N, interpret=True, fuse_transpose=fuse_transpose,
                        fuse_pointwise=fuse_pointwise,
                        stack_forward=stack_forward)
    got = np.asarray(jax.jit(tp.mul)(a, b))
    assert (got == want).all()


def test_bb_pallas_mul_cached_and_square():
    """Fixed-operand multiply (cached un-folded bucket planes through
    bb_fold_end2_mul_dma) and square must match the full multiply."""
    N, B = 1 << 10, 3
    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.integers(0, _Q, size=(B, N), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, _Q, size=(B, N), dtype=np.uint32))
    base = MxuBBNTT(N)
    want = np.asarray(jax.jit(base.mul)(a, b))
    sq_want = np.asarray(jax.jit(base.mul)(a, a))
    # XLA base path (inherited from Mxu2NTT)
    fb = base.precompute(b)
    assert (np.asarray(base.mul_cached(a, fb)) == want).all()
    assert (np.asarray(base.square(a)) == sq_want).all()
    # fused Pallas path (interpret)
    tp = MxuBBPallasNTT(N, interpret=True, fuse_transpose=True,
                        fuse_pointwise=True)
    vb = tp.precompute(b)
    assert (np.asarray(tp.mul_cached(a, vb)) == want).all()
    assert (np.asarray(tp.square(a)) == sq_want).all()
    # batch-1 cached operand broadcast (challenge-multiply pattern)
    c1 = b[:1]
    want1 = np.asarray(jax.jit(base.mul)(a, jnp.broadcast_to(c1, a.shape)))
    assert (np.asarray(tp.mul_cached(a, tp.precompute(c1))) == want1).all()


def test_bb_pallas_odd_batch_and_small_degree():
    """Odd batch (3) and a smaller power-of-two degree exercise the fold
    kernels' chunk-splitting edge cases (cols not a multiple of the
    default chunk)."""
    for N, B in ((1 << 10, 3), (1 << 12, 5)):
        rng = np.random.default_rng(N + B)
        a = jnp.asarray(rng.integers(0, _Q, size=(B, N), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, _Q, size=(B, N), dtype=np.uint32))
        want = np.asarray(jax.jit(MxuBBNTT(N).mul)(a, b))
        tp = MxuBBPallasNTT(N, interpret=True, fuse_transpose=True,
                            fuse_pointwise=True)
        got = np.asarray(jax.jit(tp.mul)(a, b))
        assert (got == want).all(), (N, B)
