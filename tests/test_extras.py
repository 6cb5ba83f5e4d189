"""Tests for power rings, sampling, monomials, norms, serialization,
matrix gadget ops, and representatives."""

import random

import numpy as np
import pytest

from stark_rings_tpu.decomp.norms import l2_norm_squared, linf_norm_exact
from stark_rings_tpu.decomp.representatives import (
    SignedRepresentative,
    UnsignedRepresentative,
)
from stark_rings_tpu.fields import get_field
from stark_rings_tpu.linalg import FieldElems, Matrix, RingElems, SparseMatrix
from stark_rings_tpu.rings import get_ring
from stark_rings_tpu.rings.monomial import (
    exp,
    exp_signed,
    monomial,
    psi,
    psi_range_check,
    unit_monomial,
)
from stark_rings_tpu.rings.power import get_power_ring
from stark_rings_tpu.rings.sampling import (
    is_invertible,
    sample_short,
    sample_short_invertible,
)
from stark_rings_tpu.spec.decomp import to_signed
from stark_rings_tpu.utils import (
    elements_from_bytes,
    elements_to_bytes,
    vec_from_bytes,
    vec_to_bytes,
)


# -- monomials (reference monomial.rs:95-135) ---------------------------

def test_monomial_ops():
    """frog RqPoly monomial test (monomial.rs:101-118): X^2 * X^15 = -X."""
    ring = get_ring("frog")
    q = ring.q
    x2 = unit_monomial(ring, 2)
    x15 = unit_monomial(ring, 15)
    prod = ring.decode(ring.coeff_mul(x2, x15))
    want = [0] * 16
    want[1] = q - 1
    assert [int(v) for v in prod] == want
    two_x2 = ring.decode(ring.add(x2, x2))
    assert int(two_x2[2]) == 2


def test_monomial_range_check():
    """monomial.rs:120-134: psi range check passes iff a in (-d', d')."""
    ring = get_ring("frog")  # D = 16, d' = 8
    q = ring.q
    assert psi_range_check(ring, 1)
    assert psi_range_check(ring, 7)
    assert not psi_range_check(ring, 8)
    assert psi_range_check(ring, q - 1)      # -1
    assert not psi_range_check(ring, q - 8)  # -8


def test_exp_signed():
    ring = get_ring("frog")
    q = ring.q
    # exp(-3) = X^{d-3}
    e = ring.decode(exp(ring, q - 3))
    assert int(e[ring.D - 3]) == 1
    es = ring.decode(exp_signed(ring, q - 3))
    assert int(es[3]) == q - 1


# -- power rings ---------------------------------------------------------

@pytest.mark.parametrize("name,logN", [("goldilocks", 6), ("babybear", 7)])
def test_power_ring_mul_and_linalg(name, logN):
    ring = get_power_ring(name, logN)
    q = ring.q
    rng = random.Random(60)
    a_i = [rng.randrange(q) for _ in range(ring.D)]
    b_i = [rng.randrange(q) for _ in range(ring.D)]
    a = ring.encode_coeffs(np.array(a_i, dtype=object))
    b = ring.encode_coeffs(np.array(b_i, dtype=object))
    # negacyclic oracle
    want = [0] * ring.D
    for i, x in enumerate(a_i):
        for j, y in enumerate(b_i):
            k = i + j
            if k < ring.D:
                want[k] = (want[k] + x * y) % q
            else:
                want[k - ring.D] = (want[k - ring.D] - x * y) % q
    got = [int(v) for v in ring.decode(ring.coeff_mul(a, b))]
    assert got == want
    # ntt roundtrip + matvec over power-ring elements
    na = ring.crt(a)
    assert [int(v) for v in ring.decode(ring.icrt(na))] == a_i
    e = RingElems(ring)
    M = Matrix.identity(e, 2)
    v = np.stack([np.asarray(na), np.asarray(na)])
    out = M.mul_vec(v)
    assert (np.asarray(out) == np.asarray(v)).all()


def test_power_ring_rot():
    ring = get_power_ring("goldilocks", 4)
    q = ring.q
    one_x = np.zeros(16, dtype=object)
    one_x[15] = 1
    r = ring.decode(ring.rot(ring.encode_coeffs(one_x)))
    assert int(r[0]) == q - 1  # X * X^15 = -1


# -- sampling ------------------------------------------------------------

@pytest.mark.parametrize("name", ["goldilocks", "frog"])
def test_sample_short_and_invertible(name):
    ring = get_ring(name)
    rng = random.Random(61)
    x = sample_short(ring, (5,), rng, 2)
    dec = ring.decode(x)
    q = ring.q
    for row in dec:
        for v in row:
            assert abs(to_signed(int(v), q)) <= 2
    inv_mask = is_invertible(ring, x)
    assert inv_mask.shape == (5,)
    y = sample_short_invertible(ring, rng, 3)
    assert bool(np.asarray(is_invertible(ring, y)))
    # zero is not invertible
    z = ring.zeros(())
    assert not bool(np.asarray(is_invertible(ring, z)))


# -- norms ---------------------------------------------------------------

@pytest.mark.parametrize("name", ["goldilocks", "stark_prime"])
def test_norms(name):
    f = get_field(name)
    q = f.q
    vals = [1, q - 2, (q - 1) // 2, 0]
    x = f.encode(np.array(vals, dtype=object))
    signed = [to_signed(v, q) for v in vals]
    assert l2_norm_squared(f, x) == sum(s * s for s in signed)
    assert linf_norm_exact(f, x) == max(abs(s) for s in signed)


# -- serialization -------------------------------------------------------

@pytest.mark.parametrize("name", ["goldilocks", "babybear", "frog",
                                  "stark_prime"])
def test_serialize_roundtrip(name):
    f = get_field(name)
    rng = random.Random(62)
    vals = [rng.randrange(f.q) for _ in range(7)]
    x = f.encode(np.array(vals, dtype=object))
    data = vec_to_bytes(f, x, 7)
    n, back = vec_from_bytes(f, data)
    assert n == 7
    assert [int(v) for v in f.decode(back)] == vals
    raw = elements_to_bytes(f, x)
    back2 = elements_from_bytes(f, raw, (7,))
    assert [int(v) for v in f.decode(back2)] == vals


# -- matrix gadget -------------------------------------------------------

def test_dense_matrix_gadget_roundtrip():
    ring = get_ring("goldilocks")
    e = RingElems(ring)
    rng = random.Random(63)
    M = Matrix(e, np.asarray(ring.rand_ntt((3, 2), rng)))
    G = M.gadget_decompose(256, 9)
    assert G.ncols == 18
    back = G.gadget_recompose(256, 9)
    assert (np.asarray(back.vals) == np.asarray(M.vals)).all()


def test_sparse_matrix_gadget_roundtrip():
    ring = get_ring("goldilocks")
    e = RingElems(ring)
    rng = random.Random(64)
    S = SparseMatrix.from_entries(
        e, 3, 4,
        [(0, 1, [5] * ring.D), (2, 3, [7] * ring.D)])
    G = S.gadget_decompose(256, 9)
    assert G.ncols == 36 and G.nnz == 2 * 9
    back = G.gadget_recompose(256, 9)
    got = back.to_dense().decode()
    want = S.to_dense().decode()
    for i in range(3):
        for j in range(4):
            assert list(got[i][j]) == list(want[i][j])


def test_sparse_field_gadget_roundtrip():
    f = get_field("babybear")
    e = FieldElems(f)
    rng = random.Random(65)
    S = SparseMatrix.rand(e, 4, 3, 0.6, rng)
    G = S.gadget_decompose(16, 8)
    back = G.gadget_recompose(16, 8)
    got = back.to_dense().decode()
    want = S.to_dense().decode()
    for i in range(4):
        assert list(got[i]) == list(want[i])


# -- representatives -----------------------------------------------------

def test_representatives():
    f = get_field("goldilocks")
    s = SignedRepresentative.from_field(f, f.q - 3)
    assert int(s) == -3
    assert s.to_field_int(f) == f.q - 3
    assert int(s + SignedRepresentative(5)) == 2
    assert int(abs(s)) == 3
    u = UnsignedRepresentative(7)
    assert int(u * u) == 49
    assert int(u ^ UnsignedRepresentative(1)) == 6


def test_sparse_mle_relabel_and_ring_elements():
    from stark_rings_tpu.mle import SparseMLE, swap_bits

    ring = get_ring("goldilocks")
    e = RingElems(ring)
    rng = random.Random(70)
    nv = 5
    pairs = []
    used = set()
    for _ in range(6):
        i = rng.randrange(1 << nv)
        if i in used:
            continue
        used.add(i)
        pairs.append((i, [rng.randrange(ring.q) for _ in range(ring.D)]))
    sm = SparseMLE.from_pairs(e, nv, pairs)
    rl = sm.relabel(0, 3, 2)
    dense = rl.to_dense().decode()
    for i, v in pairs:
        j = swap_bits(i, 0, 3, 2)
        assert [int(x) for x in dense[j]] == [x % ring.q for x in v]
    # ring-element sparse evaluate matches densified dense MLE
    from stark_rings_tpu.mle import DenseMLE

    point = [ring.rand_ntt((), rng) for _ in range(nv)]
    got = ring.decode(sm.evaluate(point))
    dm = sm.to_dense()
    want = ring.decode(dm.evaluate(point))
    assert list(got) == list(want)


def test_checkpoint_roundtrip(tmp_path):
    from stark_rings_tpu.utils import load_tensors, save_tensors

    for name in ("goldilocks", "stark_prime"):
        f = get_field(name)
        rng = random.Random(71)
        x = f.rand((4, 3), rng)
        p = save_tensors(tmp_path / f"ck_{name}.npz", name, x=x)
        back_name, tensors = load_tensors(p)
        assert back_name == name
        assert (np.asarray(f.decode(tensors["x"])) ==
                np.asarray(f.decode(x))).all()


def test_algebra_error_and_frobenius():
    import pytest as _pytest

    from stark_rings_tpu.linalg import AlgebraError

    ring = get_ring("goldilocks")
    e = RingElems(ring)
    rng = random.Random(72)
    M = Matrix.rand(e, 2, 3, rng)
    v_bad = np.asarray(ring.rand_ntt((4,), rng))
    with _pytest.raises(AlgebraError):
        M.mul_vec(v_bad)
    # frobenius: x^(q^E) == x (full orbit), and frob(ab) = frob(a)frob(b)
    a = ring.crt(np.asarray(ring.rand_coeff((), rng)))
    b = ring.crt(np.asarray(ring.rand_coeff((), rng)))
    x = a
    for _ in range(ring.E):
        x = ring.ntt_frobenius(x, 1)
    assert (np.asarray(x) == np.asarray(a)).all()
    lhs = ring.ntt_frobenius(ring.ntt_mul(a, b), 1)
    rhs = ring.ntt_mul(ring.ntt_frobenius(a, 1), ring.ntt_frobenius(b, 1))
    assert (np.asarray(lhs) == np.asarray(rhs)).all()


def test_dense_field_matrix_gadget_shape_and_roundtrip():
    """Matrix<R: Decompose> over scalar field elements: n x m must become
    n x (k*m) with column c*k+j = digit j of column c (mod.rs:276-309 via
    the per-row slice decompose mod.rs:163-175) — regression for the
    wrong-axis decomposition (rows were expanded instead of columns)."""
    f = get_field("goldilocks")
    e = FieldElems(f)
    rng = random.Random(77)
    M = Matrix.rand(e, 3, 2, rng)
    G = M.gadget_decompose(256, 9)
    assert (G.nrows, G.ncols) == (3, 18)
    back = G.gadget_recompose(256, 9)
    assert (np.asarray(back.vals) == np.asarray(M.vals)).all()
    # cross-check digit placement against the sparse path (same layout)
    dense_ints = M.decode()
    S = SparseMatrix.from_entries(
        e, 3, 2,
        [(i, j, int(dense_ints[i][j])) for i in range(3) for j in range(2)])
    GS = S.gadget_decompose(256, 9).to_dense().decode()
    GD = G.decode()
    for i in range(3):
        assert list(GS[i]) == list(GD[i])


def test_exp_out_of_range_negative_raises():
    """exp() must reject out-of-range *negative* exponents too: for
    sign(a) = -1 and center(a) > D the reference panics on the usize
    underflow in unit_monomial(d - center) (monomial.rs:55-65); the old
    guard let numpy wrap the negative index and returned X^{D-1}."""
    from stark_rings_tpu.rings.monomial import MonomialError

    ring = get_ring("goldilocks")  # D = 24
    q = ring.q
    with pytest.raises(MonomialError):
        exp(ring, q - (ring.D + 1))   # center = D+1, sign = -1
    # boundary: a = -D  ->  X^{D-D} = X^0 = 1 (reference returns this)
    out = ring.decode(exp(ring, q - ring.D))
    assert int(out[0]) == 1 and all(int(v) == 0 for v in out[1:])
    # in-range negative still fine
    e3 = ring.decode(exp(ring, q - 3))
    assert int(e3[ring.D - 3]) == 1


def test_sparse_mle_windowed_fix_and_index():
    """Windowed fix (sparse.rs:170-207,381-394) equals the eq-factor path
    and the dense oracle; index() is the log-time point lookup
    (sparse.rs:348-366)."""
    from stark_rings_tpu.mle import SparseMLE

    f = get_field("goldilocks")
    e = FieldElems(f)
    rng = random.Random(11)
    nv, nnz = 8, 20
    m = SparseMLE.rand_with_config(e, nv, nnz, rng)
    pts = [f.rand((), rng) for _ in range(3)]
    a = m.fix_variables(pts)
    b = m.fix_variables_windowed(pts)
    c = m.fix_variables_windowed(pts, window=2)
    dense = m.to_dense().fix_variables(pts)
    for got in (a, b, c):
        gd = got.to_dense().decode()
        wd = dense.decode()
        assert [int(v) for v in gd] == [int(v) for v in wd]
    # index(): present, absent, and duplicate-summing entries
    m2 = SparseMLE.from_pairs(e, 4, [(3, 7), (9, 11), (3, 5)])
    assert int(f.decode(m2.index(3))) == 12
    assert int(f.decode(m2.index(9))) == 11
    assert int(f.decode(m2.index(4))) == 0


def test_psi_range_check_batched():
    """Batched psi range check mirrors the scalar reference semantics
    (monomial.rs:82-93,120-134) over a whole tensor, incl. the 252-bit
    limbed field."""
    from stark_rings_tpu.rings.monomial import (
        psi_range_check, psi_range_check_batched)

    for name in ("goldilocks", "stark_prime"):
        ring = get_ring(name)
        q, D = ring.q, ring.D
        d_prime = D // 2
        vals = [0, 1, d_prime - 1, d_prime, D - 1, D, D + 1,
                q - 1, q - (d_prime - 1), q - d_prime, q - D, q - (D + 1)]
        enc = ring.field.encode(np.array(vals, dtype=object))
        got = np.asarray(psi_range_check_batched(ring, enc))
        want = [psi_range_check(ring, v) for v in vals]
        assert got.tolist() == want, (name, got.tolist(), want)
        assert want[0] and want[1] and want[2] and not want[3]
        if name == "stark_prime":
            # the (-d', d') property needs a power-of-two cyclotomic
            # (X^D + 1, where X^{-i} = -X^{D-i}); cf. monomial.rs:120-134
            assert want[7] and want[8] and not want[9]


def test_psi_range_check_gather_equals_coeff_mul_formulation():
    """The table-gather range check (ct(psi * X^p) precomputed per ring)
    equals the direct onehot + coeff_mul formulation on every input —
    in-range, boundary, and far-out-of-range values — on all four
    models.  Guards the gather rewrite against semantic drift."""
    import jax.numpy as jnp

    from stark_rings_tpu.rings.monomial import (
        ct, exp_batched, psi, psi_range_check_batched)

    for name in ("goldilocks", "babybear", "frog", "stark_prime"):
        ring = get_ring(name)
        f, q, D = ring.field, ring.q, ring.D
        rng = random.Random(hash(name) & 0xFFFF)
        vals = ([0, 1, D // 2 - 1, D // 2, D, q - 1, q - D // 2, q - D,
                 (q - 1) // 2, (q + 1) // 2, 1 << 32, (1 << 32) + 3,
                 q - (1 << 32)]
                + [rng.randrange(q) for _ in range(10)]
                + [rng.randrange(D) for _ in range(6)]
                + [q - rng.randrange(1, D) for _ in range(6)])
        enc = f.encode(np.array(vals, dtype=object))
        got = np.asarray(psi_range_check_batched(ring, enc))

        # old formulation: build exp(a) as a onehot monomial and run the
        # full schoolbook product, reading its constant term
        mono, valid = exp_batched(ring, enc)
        prod = ring.coeff_mul(np.asarray(psi(ring)), mono)
        c = ct(ring, prod)
        eq = jnp.asarray(c == jnp.asarray(enc))
        if f.limbed:
            eq = jnp.all(eq, axis=-1)
        want = np.asarray(jnp.asarray(valid) & eq)
        assert got.tolist() == want.tolist(), name


def test_ntt_pow_and_pow_rot():
    """Direct tests for ntt_pow (slotwise square&multiply) and pow_rot
    (iterated Cyclotomic::rot, traits.rs:58-84 / ring.rs pow)."""
    ring = get_ring("goldilocks")
    rng = random.Random(41)
    a = ring.rand_coeff((), rng)
    na = ring.crt(a)
    # ntt_pow vs repeated ntt_mul
    p3 = ring.ntt_pow(na, 3)
    want3 = ring.ntt_mul(ring.ntt_mul(na, na), na)
    assert (np.asarray(p3) == np.asarray(want3)).all()
    p1 = ring.ntt_pow(na, 1)
    assert (np.asarray(p1) == np.asarray(na)).all()
    p0 = ring.decode(ring.icrt(ring.ntt_pow(na, 0)))
    assert int(p0[0]) == 1 and all(int(v) == 0 for v in p0[1:])
    # pow_rot(a, k) == a * X^k (coeff_mul with a monomial)
    for k in (1, 5, ring.D - 1):
        got = ring.pow_rot(a, k)
        want = ring.coeff_mul(a, monomial(ring, k))
        assert (np.asarray(got) == np.asarray(want)).all(), k


def test_absorb_transcript():
    """Absorb/transcript surface (OverField bound, poly_ring.rs:19-30):
    canonical base-field absorption + deterministic Fiat-Shamir
    squeezing with rejection sampling, incl. ring elements and the
    limbed field."""
    from stark_rings_tpu.rings.absorb import Transcript, to_absorb

    ring = get_ring("goldilocks")
    rng = random.Random(19)
    x = ring.rand_coeff((2,), rng)
    f = ring.field
    raw = to_absorb(f, x)
    assert len(raw) == 2 * ring.D * 8
    # deterministic: same absorbs -> same challenges
    t1, t2 = Transcript(), Transcript()
    for t in (t1, t2):
        t.absorb(b"x", f, x)
    c1 = f.decode(t1.squeeze_field_elements(f, 4))
    c2 = f.decode(t2.squeeze_field_elements(f, 4))
    assert [int(v) for v in c1] == [int(v) for v in c2]
    assert all(0 <= int(v) < f.q for v in c1)
    # different absorbs -> different challenges
    t3 = Transcript()
    t3.absorb(b"x", f, ring.rand_coeff((2,), rng))
    c3 = f.decode(t3.squeeze_field_elements(f, 4))
    assert [int(v) for v in c3] != [int(v) for v in c1]
    # squeezing twice advances the state
    c4 = f.decode(t1.squeeze_field_elements(f, 4))
    assert [int(v) for v in c4] != [int(v) for v in c1]
    # limbed field: 32-byte elements, rejection keeps them canonical
    fs = get_field("stark_prime")
    t5 = Transcript()
    t5.absorb_bytes(b"seed", b"42")
    cs = fs.decode(t5.squeeze_field_elements(fs, 3))
    assert all(0 <= int(v) < fs.q for v in cs)
    # ring element squeeze has the right shape
    el = t5.squeeze_ring_element(ring)
    assert el.shape == (ring.D,)


def test_limbed_linf_norm_axis():
    """Tree-reduction linf norm for the 252-bit field, with axis support
    (was: python loop, full reduction only)."""
    from stark_rings_tpu.decomp.balanced import linf_norm
    from stark_rings_tpu.spec.decomp import to_signed

    f = get_field("stark_prime")
    q = f.q
    vals = [[1, q - 5, 3], [q - 2, 7, 0]]
    x = f.encode(np.array(vals, dtype=object))
    # full reduction
    full = linf_norm(f, x)
    want_full = max(abs(to_signed(v, q)) for row in vals for v in row)
    got_full = int(f.decode(f.from_canon(full)))
    assert got_full == want_full
    # per-row reduction (axis=-1 over the value axis)
    per_row = linf_norm(f, x, axis=1)
    want_rows = [max(abs(to_signed(v, q)) for v in row) for row in vals]
    got_rows = [int(v) for v in f.decode(f.from_canon(per_row))]
    assert got_rows == want_rows
