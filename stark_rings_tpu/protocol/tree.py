"""Multi-level folding tree: 2^t witnesses folded pairwise to one.

Chains the composed :class:`~stark_rings_tpu.protocol.FoldingStep`
(challenge fold + icrt + gadget decompose + traced L2 + crt + Ajtai
digit commitment + psi range check) over a binary tree of witnesses —
the shape a LatticeFold-line accumulation scheme actually runs
(reference components being composed: gadget matrices
/root/reference/crates/ring/src/balanced_decomposition/mod.rs:276-309,
commitment mat-vec /root/reference/crates/linear_algebra/src/matrix.rs:148-188,
range check /root/reference/crates/ring/src/monomial.rs:79-93).

Each level folds witness pairs (2i, 2i+1) with one fresh challenge and
emits the step's proof artifacts (digit tensor, digit commitment, L2 /
psi bits); :meth:`FoldingTree.verify` re-checks every level on the host
through INDEPENDENT paths (batch-leading Matrix.mul_vec for the
commitments, host gadget_recompose for the digits, exact python-int L2)
plus the commitment homomorphism that links levels.  The prover runs in
one jit module per tree (examples/folding_tree.py drives it with a
Fiat-Shamir transcript); `prove_sharded` runs witness-sharded levels on
a mesh while the pair count divides the axis, certified equal to the
local tree by ``dryrun_multichip``."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .folding import FoldingStep, ntt_matvec

__all__ = ["FoldingTree"]


def _is_negacyclic(ring) -> bool:
    """True iff X^D == -1 in the ring (power-of-two cyclotomic)."""
    xd = ring.spec.reduce([0] * ring.D + [1] + [0] * (ring.D - 2))
    want = [(ring.q - 1) % ring.q] + [0] * (ring.D - 1)
    return list(xd) == want


class FoldingTree:
    """Pairwise folding of a power-of-two witness batch down to one.

    Parameters mirror :class:`FoldingStep`; ``base`` defaults to 8 so
    balanced digits (|d| <= 4) sit inside every model's monomial range
    (-D/2, D/2).  ``psi_check=None`` enables the range check exactly on
    power-of-two cyclotomics (X^D = -1), where ct(psi * exp(a)) == a
    holds on the full (-d', d') window incl. negatives (the reference's
    completeness domain, monomial.rs:120-134; on goldilocks/babybear
    negative digits honestly fail the check, so the tree's verify would
    reject an honest prover there)."""

    def __init__(self, ring, n_rows: int, wit_len: int, base: int = 8,
                 k: int | None = None, l2_bound_sq: int | None = None,
                 psi_check: bool | None = None):
        if psi_check is None:
            psi_check = _is_negacyclic(ring)
        self.fs = FoldingStep(ring, n_rows, wit_len, base=base, k=k,
                              l2_bound_sq=l2_bound_sq,
                              psi_check=psi_check)
        self.ring, self.f, self.tm = ring, ring.field, self.fs.tm
        self.n, self.L, self.M = self.fs.n, self.fs.L, self.fs.M

    # -- host-side setup --------------------------------------------------
    def init_tables(self, rng):
        """Step tables + the witness commitment matrix A_w [n, L] (the
        leaves' commitment scheme; digit commitments use the step's
        A_g [n, M])."""
        c = self.fs.init_tables(rng)
        Aw = np.asarray(self.ring.rand_ntt((self.n, self.L), rng))
        c["Awt"] = np.moveaxis(Aw, -2 if self.f.limbed else -1, 0)
        return c

    def commit_witnesses(self, c, wt, block: int | None = None):
        """cw = A_w @ w per witness: [D, W, L] -> [D, W, n]."""
        return ntt_matvec(self.f, self.tm, self.ring.E,
                          jnp.asarray(c["Awt"]), wt, block)

    def rand_witnesses(self, W: int, rng):
        return self.fs.rand_witness(W, rng)

    def precompute_challenges(self, rs):
        """One folding challenge per level (coeff-form storage in)."""
        return [self.fs.precompute_challenge(r) for r in rs]

    # -- the composed prover (call under jit) -----------------------------
    def prove(self, c, wt, ct, rts):
        """Fold W = 2^len(rts) witnesses to one.

        ``wt [D, W, L(,l)]`` NTT-form witnesses, ``ct [D, W, n(,l)]``
        their commitments, ``rts`` per-level challenges from
        :meth:`precompute_challenges`.  Returns (levels, wt, ct): the
        per-level step outputs and the root witness/commitment
        [D, 1, ...]."""
        levels = []
        for rt in rts:
            out = self.fs.step(c, wt[:, 0::2], wt[:, 1::2],
                               ct[:, 0::2], ct[:, 1::2], rt)
            levels.append(out)
            wt, ct = out["s"], out["c"]
        return levels, wt, ct

    def prove_sharded(self, mesh, c, wt, ct, rts, axis: str = "x"):
        """Witness-sharded tree: levels whose PAIR count divides the
        mesh axis run through make_sharded_step_fn (zero collectives);
        smaller levels near the root fall back to the local step.
        Bit-equal to :meth:`prove` (certified in dryrun_multichip)."""
        P = int(mesh.shape[axis])
        sfn = self.fs.make_sharded_step_fn(mesh, axis)
        lfn = jax.jit(self.fs.step)
        levels = []
        for rt in rts:
            pairs = wt.shape[1] // 2
            fn = sfn if pairs % P == 0 else lfn
            out = fn(c, wt[:, 0::2], wt[:, 1::2],
                     ct[:, 0::2], ct[:, 1::2], rt)
            levels.append(out)
            wt, ct = out["s"], out["c"]
        return levels, wt, ct

    # -- host verifier ----------------------------------------------------
    def verify(self, c, wt0, ct0, levels, rts) -> bool:
        """Re-check every level through independent host paths:

        1. the traced L2 and psi bits are all set;
        2. the digit commitment cd equals A_g @ digits recomputed via
           the batch-leading Matrix.mul_vec oracle;
        3. the digits gadget-recompose to icrt(folded witness);
        4. commitment homomorphism: the folded commitment equals
           A_w @ (folded witness), linking each level to the last;
        5. the level inputs chain: level i folds level i-1's outputs.
        """
        from ..decomp import gadget_recompose
        from ..linalg import Matrix, RingElems

        ring, f, tm = self.ring, self.f, self.tm
        e = RingElems(ring)
        Aw = Matrix(e, np.moveaxis(np.asarray(c["Awt"]), 0,
                                   -2 if f.limbed else -1))
        Ag = Matrix(e, np.moveaxis(np.asarray(c["Agt"]), 0,
                                   -2 if f.limbed else -1))
        wt, ct = wt0, ct0
        for lvl, (out, rt) in enumerate(zip(levels, rts)):
            st, cf = out["s"], out["c"]
            dt, cd = out["digits"], out["cd"]
            if not bool(np.asarray(out["ok_l2"]).all()):
                return False
            if "ok_psi" in out and not bool(
                    np.asarray(out["ok_psi"]).all()):
                return False
            # challenge fold recomputed from the level INPUTS
            want_s = f.add(wt[:, 0::2], tm.ntt_mul_bt(wt[:, 1::2], rt))
            want_c = f.add(ct[:, 0::2], tm.ntt_mul_bt(ct[:, 1::2], rt))
            if not (np.asarray(want_s) == np.asarray(st)).all():
                return False
            if not (np.asarray(want_c) == np.asarray(cf)).all():
                return False
            W = np.asarray(st).shape[1]
            dig_lead = np.asarray(tm.from_t(dt))         # [W, M, D(,l)]
            cd_lead = np.asarray(tm.from_t(cd))          # [W, n, D(,l)]
            s_lead = np.asarray(tm.from_t(st))           # [W, L, D(,l)]
            for w in range(W):
                # digit commitment vs the independent linalg oracle
                dn = np.asarray(ring.crt(jnp.asarray(dig_lead[w])))
                want_cd = np.asarray(Ag.mul_vec(dn))
                if not (cd_lead[w] == want_cd).all():
                    return False
                # digits recompose to the folded coefficient witness
                rec = np.asarray(gadget_recompose(
                    f, jnp.asarray(dig_lead[w]), self.fs.base, self.fs.k))
                coeff = np.asarray(ring.icrt(jnp.asarray(s_lead[w])))
                if not (rec == coeff).all():
                    return False
                # homomorphism: folded commitment commits the folded
                # witness under A_w
                want_cw = np.asarray(Aw.mul_vec(jnp.asarray(s_lead[w])))
                got_cw = np.asarray(tm.from_t(cf))[w]
                if not (got_cw == want_cw).all():
                    return False
            wt, ct = st, cf
        return True
