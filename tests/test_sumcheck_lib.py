"""Library sumcheck prover arithmetic (mle/sumcheck.py): round messages
satisfy the verifier invariants and the final bound values equal
DenseMLE.evaluate at the challenge point."""

import random

import numpy as np

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
