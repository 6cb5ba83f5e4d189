"""Vectorized multilinear-sumcheck prover arithmetic.

The reference's poly crate exists to serve sumcheck-style provers (its
HyperPlonk helper set,
/root/reference/crates/poly/src/polynomials/multilinear_polynomial.rs);
this module is the TPU-shaped device side of that protocol for the
product claim S = sum_x g(x) h(x): each round's degree-2 message
(p(0), p(1), p(2)) and table fold are pure batched field ops on the
halved eval tables — no per-point loops.

The Fiat-Shamir transcript stays host-side (rings/absorb.Transcript);
``sumcheck_prove_with_challenges`` runs the WHOLE prover inside one jit
module for pre-supplied challenges — the arithmetic-throughput shape a
pipelined prover hits on device (examples/sumcheck.py drives the same
round function interactively with a real transcript).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["sumcheck_round", "sumcheck_fold", "sumcheck_prove_with_challenges"]


def sumcheck_round(f, G, H):
    """One round's message for the product claim over tables G, H.

    Variable x_0 (the LSB of the little-endian index) is bound this
    round: returns (p0, p1, p2, G0, H0, dG, dH) with p(t) evaluated at
    t = 0, 1, 2 and the ingredients the fold needs."""
    G0, G1 = G[0::2], G[1::2]
    H0, H1 = H[0::2], H[1::2]
    dG, dH = f.sub(G1, G0), f.sub(H1, H0)
    p0 = f.sum(f.mul(G0, H0), axis=0)
    p1 = f.sum(f.mul(G1, H1), axis=0)
    p2 = f.sum(f.mul(f.add(G1, dG), f.add(H1, dH)), axis=0)
    return p0, p1, p2, G0, H0, dG, dH


def sumcheck_fold(f, r, G0, H0, dG, dH):
    """Bind the round variable to the challenge r: the halved tables."""
    r = jnp.asarray(r)
    return f.add(G0, f.mul(r, dG)), f.add(H0, f.mul(r, dH))


def sumcheck_prove_with_challenges(f, G, H, challenges):
    """Full prover arithmetic for known challenges, one traceable graph.

    Returns (msgs [nv, 3] field storage, g(r), h(r)) — the per-round
    degree-2 messages and the fully-bound table values the verifier's
    final check consumes."""
    msgs = []
    for r in challenges:
        p0, p1, p2, G0, H0, dG, dH = sumcheck_round(f, G, H)
        G, H = sumcheck_fold(f, r, G0, H0, dG, dH)
        msgs.append(jnp.stack([p0, p1, p2]))
    return jnp.stack(msgs), G[0], H[0]
