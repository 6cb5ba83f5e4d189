"""MXU two-contraction dense-MLE evaluation (mle/mxu_eval.py) equals
DenseMLE.evaluate (the reference's fix_variables halving loop,
dense.rs:107-113) element-exactly."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stark_rings_tpu.fields import GOLDILOCKS as f
from stark_rings_tpu.linalg import FieldElems
from stark_rings_tpu.mle import DenseMLE
from stark_rings_tpu.mle.mxu_eval import evaluate_goldilocks_mxu


@pytest.mark.parametrize("nv", [2, 3, 6, 11, 14])
def test_mxu_eval_matches_dense(nv):
    fe = FieldElems(f)
    rng = np.random.default_rng(nv)
    r = random.Random(nv)
    ev = jnp.asarray(rng.integers(0, f.q, size=(1 << nv,), dtype=np.uint64))
    pts = [np.uint64(r.randrange(f.q)) for _ in range(nv)]
    want = int(np.asarray(DenseMLE(fe, nv, ev).evaluate(list(pts))))
    got = int(np.asarray(jax.jit(
        lambda e: evaluate_goldilocks_mxu(e, pts))(ev)))
    assert want == got


@pytest.mark.parametrize("nv,h", [(8, 3), (11, 6), (12, 1)])
def test_fix_last_variables_mxu_matches_dense(nv, h):
    from stark_rings_tpu.mle.mxu_eval import fix_last_variables_mxu

    fe = FieldElems(f)
    rng = np.random.default_rng(nv * 31 + h)
    r = random.Random(nv * 31 + h)
    ev = jnp.asarray(rng.integers(0, f.q, size=(1 << nv,), dtype=np.uint64))
    pts = [np.uint64(r.randrange(f.q)) for _ in range(h)]
    want = np.asarray(DenseMLE(fe, nv, ev).fix_last_variables(pts).evals)
    got = np.asarray(jax.jit(
        lambda e: fix_last_variables_mxu(e, pts))(ev))
    assert (want == got).all()


def test_mxu_eval_boolean_point_reads_table():
    """At a boolean point the evaluation must be the table entry."""
    nv = 6
    rng = np.random.default_rng(0)
    ev = jnp.asarray(rng.integers(0, f.q, size=(1 << nv,), dtype=np.uint64))
    idx = 0b101101
    pts = [np.uint64((idx >> j) & 1) for j in range(nv)]
    got = int(np.asarray(evaluate_goldilocks_mxu(ev, pts)))
    assert got == int(np.asarray(ev[idx]))


@pytest.mark.parametrize("nv", [3, 9, 14])
def test_evaluate_many_matches_per_point(nv):
    """Point-batched evaluation (one shared table contraction for all W
    points) equals evaluate_goldilocks_mxu applied per point."""
    from stark_rings_tpu.mle.mxu_eval import evaluate_many_goldilocks_mxu

    rng = np.random.default_rng(nv)
    ev = jnp.asarray(rng.integers(0, f.q, size=(1 << nv,), dtype=np.uint64))
    P = rng.integers(0, f.q, size=(5, nv), dtype=np.uint64)
    many = np.asarray(jax.jit(
        lambda e, p: evaluate_many_goldilocks_mxu(e, p))(ev, P))
    for w in range(P.shape[0]):
        pts = [np.uint64(x) for x in P[w]]
        assert int(many[w]) == int(np.asarray(
            evaluate_goldilocks_mxu(ev, pts)))
