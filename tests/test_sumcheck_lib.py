"""Library sumcheck prover arithmetic (mle/sumcheck.py): round messages
satisfy the verifier invariants and the final bound values equal
DenseMLE.evaluate at the challenge point."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stark_rings_tpu.fields import GOLDILOCKS as F
from stark_rings_tpu.linalg import FieldElems
from stark_rings_tpu.mle import DenseMLE
from stark_rings_tpu.mle.sumcheck import sumcheck_prove_with_challenges


def _interp_at(f, p0, p1, p2, r):
    inv2 = jnp.asarray(f.const(pow(2, f.q - 2, f.q)))
    one, two = jnp.asarray(f.const(1)), jnp.asarray(f.const(2))
    r = jnp.asarray(r)
    l0 = f.mul(f.mul(f.sub(r, one), f.sub(r, two)), inv2)
    l1 = f.mul(r, f.sub(two, r))
    l2 = f.mul(f.mul(r, f.sub(r, one)), inv2)
    return f.add(f.add(f.mul(p0, l0), f.mul(p1, l1)), f.mul(p2, l2))


def test_sumcheck_prover_verifies():
    nv = 10
    rng = random.Random(5)
    e = FieldElems(F)
    g = DenseMLE.rand(e, nv, rng)
    h = DenseMLE.rand(e, nv, rng)
    G = jnp.asarray(g.evals)
    H = jnp.asarray(h.evals)
    chals = [jnp.asarray(np.uint64(rng.randrange(F.q))) for _ in range(nv)]

    msgs, gv, hv = jax.jit(
        lambda G, H: sumcheck_prove_with_challenges(F, G, H, chals))(G, H)
    msgs = np.asarray(msgs)

    claim = F.sum(F.mul(G, H), axis=0)
    for i in range(nv):
        p0, p1, p2 = (jnp.asarray(msgs[i, j]) for j in range(3))
        assert int(F.decode(F.add(p0, p1))) == int(F.decode(claim)), i
        claim = _interp_at(F, p0, p1, p2, chals[i])

    # final check: claim == g(r) * h(r), and the returned bound values
    # equal DenseMLE.evaluate
    want_g = g.evaluate(list(chals))
    want_h = h.evaluate(list(chals))
    assert int(F.decode(gv)) == int(F.decode(want_g))
    assert int(F.decode(hv)) == int(F.decode(want_h))
    assert int(F.decode(claim)) == int(F.decode(F.mul(gv, hv)))


def test_sumcheck_verifier_rejects_perturbed_message():
    """Red test: corrupting any single round message must break the
    verifier's p0+p1 == claim chain (guards against a prover bug that a
    prover-vs-replica equality test would replicate on both sides)."""
    nv = 6
    rng = random.Random(11)
    e = FieldElems(F)
    g = DenseMLE.rand(e, nv, rng)
    h = DenseMLE.rand(e, nv, rng)
    G, H = jnp.asarray(g.evals), jnp.asarray(h.evals)
    chals = [jnp.asarray(np.uint64(rng.randrange(F.q))) for _ in range(nv)]
    msgs, gv, hv = jax.jit(
        lambda G, H: sumcheck_prove_with_challenges(F, G, H, chals))(G, H)
    msgs = np.asarray(msgs)

    def verify(msgs):
        claim = F.sum(F.mul(G, H), axis=0)
        for i in range(nv):
            p0, p1, p2 = (jnp.asarray(msgs[i, j]) for j in range(3))
            if int(F.decode(F.add(p0, p1))) != int(F.decode(claim)):
                return False
            claim = _interp_at(F, p0, p1, p2, chals[i])
        return int(F.decode(claim)) == int(F.decode(F.mul(gv, hv)))

    assert verify(msgs)
    for i in (0, nv // 2, nv - 1):
        for j in range(3):
            bad = msgs.copy()
            bad[i, j] = (int(bad[i, j]) + 1) % F.q
            assert not verify(bad), (i, j)


def test_sumcheck_msb_order_is_lsb_on_bit_reversed_tables():
    """The two binding orders are the same protocol through one
    permutation: msb-order proving on bit_reverse_table(T) produces
    exactly the lsb-order messages and finals for T (the identity the
    Pallas prover's layout rests on)."""
    from stark_rings_tpu.mle.sumcheck import bit_reverse_table

    nv = 8
    rng = np.random.default_rng(3)
    G = jnp.asarray(rng.integers(0, F.q, size=(1 << nv,), dtype=np.uint64))
    H = jnp.asarray(rng.integers(0, F.q, size=(1 << nv,), dtype=np.uint64))
    chals = [jnp.asarray(np.uint64(int(v)))
             for v in rng.integers(0, F.q, size=(nv,), dtype=np.uint64)]
    m_lsb, g_l, h_l = jax.jit(lambda G, H: sumcheck_prove_with_challenges(
        F, G, H, chals))(G, H)
    m_msb, g_m, h_m = jax.jit(lambda G, H: sumcheck_prove_with_challenges(
        F, bit_reverse_table(G), bit_reverse_table(H), chals,
        order="msb"))(G, H)
    assert np.array_equal(np.asarray(m_lsb), np.asarray(m_msb))
    assert int(g_l) == int(g_m) and int(h_l) == int(h_m)


def _check_pallas_vs_oracle(rng, nv, k, chunk, field="goldilocks"):
    from stark_rings_tpu.fields import get_field
    from stark_rings_tpu.mle.pallas_sumcheck import (
        sumcheck_prove_goldilocks_pallas, sumcheck_prove_many_pallas)
    from stark_rings_tpu.mle.sumcheck import (
        sumcheck_prove_many_with_challenges)

    f = get_field(field)
    dt = np.uint32 if field == "babybear" else np.uint64
    # frog/babybear tables are MONTGOMERY storage; random u32/u64 values
    # below q are valid storage either way (uniform in the field)
    tables = [jnp.asarray(rng.integers(0, f.q, size=(1 << nv,), dtype=dt))
              for _ in range(k)]
    chals = [jnp.asarray(dt(int(v)))
             for v in rng.integers(0, f.q, size=(nv,), dtype=dt)]
    want_m, want_f = jax.jit(
        lambda ts: sumcheck_prove_many_with_challenges(
            f, ts, chals, order="msb"))(tables)
    got_m, got_f = jax.jit(
        lambda ts: sumcheck_prove_many_pallas(
            ts, chals, chunk=chunk, interpret=True, field=field))(tables)
    assert np.array_equal(np.asarray(want_m), np.asarray(got_m)), (nv, k)
    for j in range(k):
        assert int(want_f[j]) == int(got_f[j]), (nv, k, j)
    if k == 2 and field == "goldilocks":
        m2, gv, hv = jax.jit(
            lambda G, H: sumcheck_prove_goldilocks_pallas(
                G, H, chals, interpret=True))(tables[0], tables[1])
        assert np.array_equal(np.asarray(m2), np.asarray(want_m))
        assert int(gv) == int(want_f[0]) and int(hv) == int(want_f[1])


def test_sumcheck_pallas_kernel_matches_oracle():
    """The one-kernel Pallas prover (mle/pallas_sumcheck.py, interpret
    mode on CPU) equals the msb-order XLA oracle message-for-message
    (2-ary, nv=12; the k-ary / multi-chunk / W-batched variants run in
    the slow twin below)."""
    _check_pallas_vs_oracle(np.random.default_rng(9), 12, 2, 256)


def test_sumcheck_pallas_kernel_babybear():
    """The field-parametric kernel on babybear: ONE u32 Montgomery plane
    whose in-kernel ops are the field's storage ops — exact vs the
    msb-order XLA oracle on the same storage."""
    _check_pallas_vs_oracle(np.random.default_rng(5), 12, 2, 256,
                            field="babybear")


@pytest.mark.slow
def test_sumcheck_pallas_kernel_kary_multichunk_batch():
    """Slow twin: 3-ary product (nv=13), the multi-chunk accumulator
    path in both the streamed and in-scratch rounds (nv=14, chunk=16),
    and the W-batched wrapper vs per-claim proofs."""
    from stark_rings_tpu.mle.pallas_sumcheck import (
        sumcheck_prove_batch_goldilocks_pallas)
    from stark_rings_tpu.mle.sumcheck import (
        sumcheck_prove_many_with_challenges)

    rng = np.random.default_rng(9)
    _check_pallas_vs_oracle(rng, 13, 3, 256)
    _check_pallas_vs_oracle(rng, 14, 2, 16)
    # frog: u64 Montgomery storage, in-kernel 64-bit REDC multiply
    _check_pallas_vs_oracle(np.random.default_rng(17), 12, 2, 256,
                            field="frog")

    # W-batched wrapper == per-claim proofs
    nv, k, W = 12, 2, 3
    stk = [jnp.asarray(rng.integers(0, F.q, size=(W, 1 << nv),
                                    dtype=np.uint64)) for _ in range(k)]
    chals = [jnp.asarray(np.uint64(int(v)))
             for v in rng.integers(0, F.q, size=(nv,), dtype=np.uint64)]
    bm, bf = jax.jit(lambda ts: sumcheck_prove_batch_goldilocks_pallas(
        ts, chals, interpret=True))(stk)
    for w in range(W):
        wm, wf = jax.jit(
            lambda ts: sumcheck_prove_many_with_challenges(
                F, ts, chals, order="msb"))([T[w] for T in stk])
        assert np.array_equal(np.asarray(bm[w]), np.asarray(wm)), w
        for j in range(k):
            assert int(bf[j][w]) == int(wf[j]), (w, j)


def test_sumcheck_kary_product_soundness_and_completeness():
    """Degree-k product sumcheck (sumcheck_prove_many_with_challenges):
    for k = 2, 3, 4 the messages satisfy the verifier recurrence
    p(0) + p(1) == running claim (with p interpolated from its k+1
    points at the challenge), and the final claim equals the product of
    the individual MLE evaluations at the challenge point.  k = 2 also
    cross-checks the dedicated 2-ary prover."""
    import jax

    from stark_rings_tpu.fields import get_field
    from stark_rings_tpu.linalg import FieldElems
    from stark_rings_tpu.mle import DenseMLE
    from stark_rings_tpu.mle.sumcheck import (
        sumcheck_prove_many_with_challenges, sumcheck_prove_with_challenges)

    f = get_field("goldilocks")
    fe = FieldElems(f)
    nv = 5
    rng = random.Random(71)
    q = f.q

    def lagrange_eval(points_y, x):
        """Interpolate p from p(0..k) (ints) and evaluate at x, mod q."""
        k = len(points_y) - 1
        acc = 0
        for i in range(k + 1):
            num, den = 1, 1
            for j in range(k + 1):
                if i == j:
                    continue
                num = num * ((x - j) % q) % q
                den = den * ((i - j) % q) % q
            acc = (acc + points_y[i] * num * pow(den, q - 2, q)) % q
        return acc

    for k in (2, 3, 4):
        tables = [np.asarray(f.encode(np.array(
            [rng.randrange(q) for _ in range(1 << nv)], dtype=object)))
            for _ in range(k)]
        chals = [np.asarray(f.encode(np.array(rng.randrange(q),
                                              dtype=object)))
                 for _ in range(nv)]
        msgs, finals = jax.jit(
            lambda ts, cs: sumcheck_prove_many_with_challenges(f, ts, cs)
        )(tables, chals)
        msgs_i = [[int(v) for v in f.decode(m)] for m in msgs]
        chal_i = [int(f.decode(c)) for c in chals]

        # claim recurrence (exact python-int products — np.prod wraps)
        def prod_mod(ints):
            acc = 1
            for v in ints:
                acc = acc * v % q
            return acc

        claim = sum(prod_mod(int(f.decode(jnp.asarray(T[x])))
                             for T in tables)
                    for x in range(1 << nv)) % q
        for rd in range(nv):
            assert (msgs_i[rd][0] + msgs_i[rd][1]) % q == claim, (k, rd)
            claim = lagrange_eval(msgs_i[rd], chal_i[rd])
        # final check: claim == prod of MLE evals at the challenge point
        evs = []
        for T in tables:
            m = DenseMLE(fe, nv, jnp.asarray(T))
            evs.append(int(f.decode(m.evaluate(
                [jnp.asarray(c) for c in chals]))))
        want = prod_mod(evs)
        assert claim == want, k
        assert want == prod_mod(int(f.decode(v)) for v in finals), k

        if k == 2:
            m2, gv, hv = jax.jit(
                lambda G, H, cs: sumcheck_prove_with_challenges(
                    f, G, H, cs))(tables[0], tables[1], chals)
            assert (np.asarray(m2) == np.asarray(msgs)).all()
