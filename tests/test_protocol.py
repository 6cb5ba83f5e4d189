"""Composed folding-step module (stark_rings_tpu.protocol) vs the same
pipeline assembled stage-by-stage from the public batch-leading surface.

The protocol layer composes reference components (challenge fold,
icrt, gadget decompose mod.rs:163-175, Ajtai commit matrix.rs:148-188,
norm/psi checks traits.rs:6-56 + monomial.rs:82-93) into one jit module;
these tests pin each output to the independently-computed stage result."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stark_rings_tpu.decomp import gadget_decompose, l2_norm_squared
from stark_rings_tpu.linalg import Matrix, RingElems
from stark_rings_tpu.protocol import FoldingStep
from stark_rings_tpu.rings import get_ring


def _run_step(name, W=2, L=3, n=2, base=None, psi=False):
    ring = get_ring(name)
    f = ring.field
    if base is None:
        # 2^16 digits halve k for the 252-bit field (CPU test cost)
        base = 65536 if f.limbed else 256
    fs = FoldingStep(ring, n_rows=n, wit_len=L, base=base, psi_check=psi)
    rng = random.Random(51)
    c = jax.device_put(fs.init_tables(rng))
    r = ring.rand_coeff((), rng)
    rt = fs.precompute_challenge(r)
    s0t = fs.rand_witness(W, rng)
    s1t = fs.rand_witness(W, rng)
    # commitments of the inputs (any [D, W, n] tensors fold linearly)
    c0t = fs.tm.to_t(jnp.asarray(np.asarray(ring.rand_ntt((W, n), rng))))
    c1t = fs.tm.to_t(jnp.asarray(np.asarray(ring.rand_ntt((W, n), rng))))
    out = jax.jit(fs.step)(c, s0t, s1t, c0t, c1t, rt)
    return ring, f, fs, (s0t, s1t, c0t, c1t, r), out


@pytest.mark.parametrize("name", [
    "goldilocks", "babybear",
    pytest.param("stark_prime", marks=pytest.mark.slow)])
def test_folding_step_stages_match_public_surface(name):
    ring, f, fs, (s0t, s1t, c0t, c1t, r), out = _run_step(name)
    tm = fs.tm
    # stage 1: challenge fold == batch-leading ntt_mul with broadcast
    s0 = np.asarray(tm.from_t(s0t))
    s1 = np.asarray(tm.from_t(s1t))
    r_ntt = np.asarray(ring.crt(jnp.asarray(r)[None]))[0]
    want_s = np.asarray(ring.add(
        jnp.asarray(s0),
        ring.ntt_mul(jnp.asarray(s1), jnp.broadcast_to(
            jnp.asarray(r_ntt), s1.shape))))
    got_s = np.asarray(tm.from_t(out["s"]))
    assert (got_s == want_s).all(), name
    # folded commitment by the same linearity
    c0 = np.asarray(tm.from_t(c0t))
    c1 = np.asarray(tm.from_t(c1t))
    want_c = np.asarray(ring.add(
        jnp.asarray(c0),
        ring.ntt_mul(jnp.asarray(c1), jnp.broadcast_to(
            jnp.asarray(r_ntt), c1.shape))))
    assert (np.asarray(tm.from_t(out["c"])) == want_c).all(), name

    # stage 2+3: digits == gadget_decompose of the icrt'd fold
    coeff = np.asarray(ring.icrt(jnp.asarray(want_s)))
    want_d = np.asarray(gadget_decompose(f, jnp.asarray(coeff),
                                         fs.base, fs.k))  # [W, M, D(,l)]
    got_d = np.asarray(tm.from_t(out["digits"]))
    assert (got_d == want_d).all(), name

    # stage 4: the traced L2 bit == the host norm vs the same bound
    for w in range(got_d.shape[0]):
        host = l2_norm_squared(f, jnp.asarray(want_d[w]))
        assert bool(out["ok_l2"][w]) == (host <= fs.l2_bound_sq), name

    # stage 5+6: digit commitment == Matrix.mul_vec per witness
    e = RingElems(ring)
    Agt = np.asarray(fs.tm.from_t(jnp.asarray(
        np.asarray(fs.init_tables(random.Random(51))["Agt"]))))
    A = Matrix(e, jnp.asarray(Agt))
    got_cd = np.asarray(tm.from_t(out["cd"]))
    for w in range(got_cd.shape[0]):
        dn = ring.crt(jnp.asarray(want_d[w]))
        want_cd = np.asarray(A.mul_vec(dn))
        assert (got_cd[w] == want_cd).all(), (name, w)


def test_folding_step_psi_check_frog():
    """psi range check inside the composed module (power-of-two
    cyclotomic: completeness holds, monomial.rs:120-134): balanced
    digits of base 4 are in (-2, 2) ... base/2 = 2 <= d' bound."""
    ring, f, fs, _, out = _run_step("frog", base=4, psi=True)
    assert bool(np.asarray(out["ok_psi"]).all())


@pytest.mark.parametrize("name", ["goldilocks", "stark_prime"])
def test_commit_blocked_accumulation_matches_unblocked(name):
    """FoldingStep.commit with a forced tiny block (widened-word
    M-blocked accumulation, the Matrix.mul_mat pattern) is bit-equal to
    the full [D, W, n, M] product-and-sum path, for both the E > 1
    matvec_t path and the E == 1 limbed field path."""
    ring = get_ring(name)
    limbed = ring.field.limbed
    base = 65536 if limbed else 256
    # the limbed CIOS compile dominates this test's cost: one forced
    # block and a length-1 witness exercise the E==1 widened branch
    fs = FoldingStep(ring, n_rows=3, wit_len=1 if limbed else 2,
                     base=base)
    rng = random.Random(77)
    c = jax.device_put(fs.init_tables(rng))
    dt = fs.tm.crt_t(fs.tm.to_t(jnp.asarray(np.asarray(
        ring.rand_coeff((4, fs.M), rng)))))
    full = np.asarray(jax.jit(
        lambda c, d: fs.commit(c, d, block=fs.M))(c, dt))
    for blk in ((7,) if limbed else (1, 3, 7)):
        got = np.asarray(jax.jit(
            lambda c, d: fs.commit(c, d, block=blk))(c, dt))
        assert (got == full).all(), (name, blk)


def test_folding_step_chains():
    """Output shapes feed the next step (the dependent-chain protocol
    shape benchmarks measure)."""
    ring, f, fs, (s0t, s1t, c0t, c1t, r), out = _run_step("goldilocks")
    rt = fs.precompute_challenge(ring.rand_coeff((), random.Random(5)))
    c = jax.device_put(fs.init_tables(random.Random(51)))
    out2 = jax.jit(fs.step)(c, out["s"], s1t, out["cd"], c1t, rt)
    assert out2["s"].shape == out["s"].shape
    assert out2["cd"].shape == out["cd"].shape


def test_folding_tree_prove_verify_and_tamper():
    """FoldingTree (protocol/tree.py): 8 goldilocks witnesses fold to
    one; the host verifier accepts the honest transcript and rejects a
    tampered folded witness.  psi auto-disables on the non-power-of-two
    cyclotomic (negative digits honestly fail there)."""
    from stark_rings_tpu.protocol import FoldingTree

    ring = get_ring("goldilocks")
    ft = FoldingTree(ring, n_rows=2, wit_len=2, base=8)
    assert not ft.fs.psi_check
    rng = random.Random(3)
    c = jax.device_put(ft.init_tables(rng))
    W = 8
    wt = ft.rand_witnesses(W, rng)
    ct = jax.jit(ft.commit_witnesses)(c, wt)
    rts = ft.precompute_challenges(
        [jnp.asarray(ring.rand_coeff((), rng)) for _ in range(3)])
    levels, rw, rc = jax.jit(
        lambda c, wt, ct: ft.prove(c, wt, ct, rts))(c, wt, ct)
    assert rw.shape[1] == 1 and rc.shape[1] == 1
    assert ft.verify(c, wt, ct, levels, rts)
    bad = [dict(o) for o in levels]
    v = np.asarray(bad[0]["s"]).copy()
    v.reshape(-1)[0] = np.uint64((int(v.reshape(-1)[0]) + 1) % ring.q)
    bad[0]["s"] = jnp.asarray(v)
    assert not ft.verify(c, wt, ct, bad, rts)


def test_folding_tree_sharded_matches_local():
    """prove_sharded == prove bit-for-bit: the 16-leaf tree's first
    level runs witness-sharded on the 8-device mesh (8 pairs), the
    smaller levels fall back to the local step."""
    from stark_rings_tpu.parallel import make_mesh
    from stark_rings_tpu.protocol import FoldingTree

    Pn = 8
    if len(jax.devices()) < Pn:
        pytest.skip("not enough devices")
    ring = get_ring("goldilocks")
    ft = FoldingTree(ring, n_rows=2, wit_len=2, base=8)
    rng = random.Random(9)
    c = jax.device_put(ft.init_tables(rng))
    W = 16
    wt = np.asarray(ft.rand_witnesses(W, rng))
    ct = np.asarray(jax.jit(ft.commit_witnesses)(c, jnp.asarray(wt)))
    rts = [np.asarray(r) for r in ft.precompute_challenges(
        [jnp.asarray(ring.rand_coeff((), rng)) for _ in range(4)])]
    lv_l, rw_l, rc_l = jax.jit(
        lambda c, wt, ct: ft.prove(c, wt, ct, rts))(c, wt, ct)
    lv_s, rw_s, rc_s = ft.prove_sharded(make_mesh(Pn), c, wt, ct, rts)
    assert np.array_equal(np.asarray(rw_l), np.asarray(rw_s))
    assert np.array_equal(np.asarray(rc_l), np.asarray(rc_s))
    for ol, os_ in zip(lv_l, lv_s):
        for key in ol:
            assert np.array_equal(np.asarray(ol[key]),
                                  np.asarray(os_[key])), key


def test_folding_step_sharded_matches_local():
    """make_sharded_step_fn (witness-sharded, zero collectives) produces
    bit-identical outputs to the local composed step on an 8-dev mesh."""
    from stark_rings_tpu.parallel import make_mesh

    Pn = 8
    if len(jax.devices()) < Pn:
        pytest.skip("not enough devices")
    ring = get_ring("goldilocks")
    fs = FoldingStep(ring, n_rows=2, wit_len=2, base=256)
    rng = random.Random(61)
    c = jax.device_put(fs.init_tables(rng))
    rt = np.asarray(fs.precompute_challenge(ring.rand_coeff((), rng)))
    W = Pn
    s0 = np.asarray(fs.rand_witness(W, rng))
    s1 = np.asarray(fs.rand_witness(W, rng))
    c0 = np.asarray(fs.tm.to_t(jnp.asarray(
        np.asarray(ring.rand_ntt((W, 2), rng)))))
    c1 = np.asarray(fs.tm.to_t(jnp.asarray(
        np.asarray(ring.rand_ntt((W, 2), rng)))))
    o_sh = fs.make_sharded_step_fn(make_mesh(Pn))(c, s0, s1, c0, c1, rt)
    o_lc = jax.jit(fs.step)(c, s0, s1, c0, c1, rt)
    for key in ("s", "c", "digits", "cd", "ok_l2"):
        assert np.array_equal(np.asarray(o_sh[key]),
                              np.asarray(o_lc[key])), key
