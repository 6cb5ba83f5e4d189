"""One executable check per BASELINE.json config.

1. Goldilocks power-of-two ring add/mul + NTT roundtrip vs oracle (CPU).
2. BabyBear deg-2^12 batched NTT mul + invertibility checks.
3. Stark-prime multi-limb partially-splitting CRT (golden vectors).
4. 20-variable MLE evaluation + fix-variables + mat-vec.
5. Deg-2^20-capable sharded NTT (all_to_all) — smoke at 2^12 here; the
   full 2^20 roundtrip runs under the slow marker in test_sharded_ntt.
"""

import random

import numpy as np
import pytest

import jax

from stark_rings_tpu.fields import get_field
from stark_rings_tpu.linalg import FieldElems, SparseMatrix
from stark_rings_tpu.mle import DenseMLE
from stark_rings_tpu.ops.ntt import get_ntt
from stark_rings_tpu.parallel import ShardedNTT, make_mesh
from stark_rings_tpu.rings import get_ring, get_power_ring
from stark_rings_tpu.spec import MODELS


def test_config1_goldilocks_pow2_ring():
    """X^64+1-style ring ops + NTT roundtrip vs the rust-semantics spec
    machinery (CPU-runnable)."""
    ring = get_power_ring("goldilocks", 6)
    q = ring.q
    rng = random.Random(90)
    a_i = [rng.randrange(q) for _ in range(64)]
    b_i = [rng.randrange(q) for _ in range(64)]
    a = ring.encode_coeffs(np.array(a_i, dtype=object))
    b = ring.encode_coeffs(np.array(b_i, dtype=object))
    s = ring.decode(ring.add(a, b))
    assert [int(v) for v in s] == [(x + y) % q for x, y in zip(a_i, b_i)]
    assert [int(v) for v in ring.decode(ring.icrt(ring.crt(a)))] == a_i
    want = [0] * 64
    for i, x in enumerate(a_i):
        for j, y in enumerate(b_i):
            k = i + j
            if k < 64:
                want[k] = (want[k] + x * y) % q
            else:
                want[k - 64] = (want[k - 64] - x * y) % q
    got = [int(v) for v in ring.decode(ring.coeff_mul(a, b))]
    assert got == want


def test_config2_babybear_deg_2_12_batched_mul_invertibility():
    ring = get_power_ring("babybear", 12)
    f = ring.field
    N = ring.D
    rng = np.random.default_rng(91)
    B = 4
    a = f.from_canon(jax.device_put(
        rng.integers(0, f.q, size=(B, N), dtype=np.uint32)))
    b = f.from_canon(jax.device_put(
        rng.integers(0, f.q, size=(B, N), dtype=np.uint32)))
    mul = jax.jit(lambda x, y: ring.icrt(ring.ntt_mul(ring.crt(x),
                                                      ring.crt(y))))
    prod = mul(a, b)
    # invertibility: random NTT-form elements have all slots nonzero whp;
    # check a * a^-1 == 1 slotwise
    na = ring.crt(a)
    inv = jax.jit(ring.ntt_inv)(na)
    one = ring.decode(ring.ntt_mul(na, inv))
    # every slot of every batch element must invert (fully-splitting
    # ring: slotwise field inverses) — not just a prefix
    assert all(int(v) == 1 for v in np.asarray(one).reshape(-1))
    # and the product roundtrips through icrt/crt
    back = ring.decode(ring.crt(ring.icrt(ring.ntt_mul(ring.crt(a),
                                                       ring.crt(b)))))
    direct = ring.decode(ring.ntt_mul(ring.crt(a), ring.crt(b)))
    assert (np.asarray(back) == np.asarray(direct)).all()


def test_config3_stark_prime_partially_splitting_crt():
    """252-bit multi-limb CRT: golden vectors + roundtrip (the reference's
    fully-splitting D=16 model) and the eprint-2017/523 partially
    splitting structure of the other models."""
    sp = MODELS["stark_prime"]
    ring = get_ring("stark_prime")
    rng = random.Random(92)
    coeffs = [rng.randrange(sp.q) for _ in range(sp.D)]
    x = ring.encode_coeffs(np.array(coeffs, dtype=object))
    ntt = ring.crt(x)
    assert [int(v) for v in ring.decode(ntt)] == sp.crt(coeffs)
    assert [int(v) for v in ring.decode(ring.icrt(ntt))] == coeffs
    # partially-splitting models expose N slots of degree E > 1
    for name in ("goldilocks", "babybear", "frog"):
        m = MODELS[name]
        assert m.E > 1 and m.N * m.E == m.D


def test_config4_20var_mle_eval_fix_matvec():
    f = get_field("goldilocks")
    e = FieldElems(f)
    nv = 20
    rng = np.random.default_rng(93)
    evals = f.from_canon(jax.device_put(
        rng.integers(0, f.q, size=(1 << nv,), dtype=np.uint64)))
    mle = DenseMLE(e, nv, evals)
    pr = random.Random(94)
    point = [f.encode(np.array(pr.randrange(f.q), dtype=object))
             for _ in range(nv)]
    val = mle.evaluate(point)
    # partial fix then finish must agree
    part = mle.fix_variables(point[:8])
    val2 = part.evaluate(point[8:])
    assert int(f.decode(val)) == int(f.decode(val2))
    # mat-vec over a sparse matrix against the MLE's evaluation table,
    # value-checked against a python int oracle
    S = SparseMatrix.rand(e, 64, 1024, 0.02, pr)
    v = evals[:1024]
    out = S.mul_vec(v)
    assert out.shape[0] == 64
    vd = [int(x) for x in f.decode(v)]
    rows = np.asarray(S.rows)
    cols = np.asarray(S.cols)
    data = [int(x) for x in f.decode(S.data)]
    want = [0] * 64
    for i in range(S.nnz):
        want[int(rows[i])] = (want[int(rows[i])]
                              + data[i] * vd[int(cols[i])]) % f.q
    got = [int(x) for x in f.decode(out)]
    assert got == want


def test_config5_sharded_ntt_smoke():
    Pn = 8
    if len(jax.devices()) < Pn:
        pytest.skip("not enough devices")
    f = get_field("goldilocks")
    N = 1 << 12
    sn = ShardedNTT("goldilocks", N, Pn)
    mesh = make_mesh(Pn)
    fwd, inv, mul = sn.make_fns(mesh)
    rng = np.random.default_rng(95)
    a_np = rng.integers(0, f.q, size=(N,), dtype=np.uint64)
    a = sn.to_matrix(a_np)
    back = sn.from_matrix(np.asarray(jax.device_get(inv(fwd(a)))))
    assert (back == a_np).all()
