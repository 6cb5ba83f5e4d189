"""Power-of-two (nega)cyclic NTT for large degrees (2^12 .. 2^20+).

The reference's ring models stop at hand-unrolled 2-4 butterfly layers for
D <= 72 (e.g. goldilocks/ntt.rs:135-319); the BASELINE configs demand
degree-2^16..2^20 rings.  This module generalizes the same recursion --

    X^{2t} - z^2  =  (X^t - z)(X^t + z),   z = psi^{e/2}

-- into a log2(N)-stage radix-2 kernel where every stage is one reshape +
one broadcast multiply + add/sub over the whole batch (VPU-shaped, no
scalar loops).  Outputs are in **leaf order** (the recursion's natural
permutation); pointwise multiplication and the inverse transform use the
same order, so ring multiplication is exact without any bit-reversal
shuffles.  ``leaf_exponents`` exposes the order for the four-step sharded
NTT (stark_rings_tpu.parallel).

Twiddle tables are built **on device** by log-doubling powers of psi (one
host encode of a single scalar), so a 2^20 context costs ~20 device ops,
not a million-element host loop.

Negacyclic (Phi = X^N + 1) requires a 2N-th root of unity: fine for
goldilocks (2-adicity 32), babybear (27) and stark_prime (192) at all
target sizes.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from ..fields import Field, get_field

__all__ = ["NTTContext", "get_ntt", "find_primitive_root"]


def _factorize(n: int):
    fs = []
    d = 2
    while d * d <= n:
        while n % d == 0:
            if not fs or fs[-1] != d:
                fs.append(d)
            n //= d
        d += 1
    if n > 1:
        fs.append(n)
    return fs


@lru_cache(maxsize=None)
def find_primitive_root(q: int) -> int:
    """Smallest generator of F_q^* (host, cached)."""
    fs = _factorize(q - 1)
    g = 2
    while True:
        if all(pow(g, (q - 1) // p, q) != 1 for p in fs):
            return g
        g += 1


class NTTContext:
    """(Nega)cyclic NTT of fixed size N over one field."""

    def __init__(self, field: Field, N: int, negacyclic: bool = True):
        assert N & (N - 1) == 0, "N must be a power of two"
        order = 2 * N
        assert (field.q - 1) % order == 0, \
            f"{field.name}: 2N={order} must divide q-1"
        self.f = field
        self.N = N
        self.negacyclic = negacyclic
        self.logN = N.bit_length() - 1
        g = find_primitive_root(field.q)
        self.psi_int = pow(g, (field.q - 1) // order, field.q)
        self.psi_inv_int = pow(self.psi_int, order - 1, field.q)

        # stage exponent lists (host ints; exponents are mod 2N)
        e_init = N if negacyclic else 0
        blocks = [e_init]
        self.stage_exps: List[List[int]] = []
        while len(blocks) < N:
            tw = [e // 2 for e in blocks]
            self.stage_exps.append(tw)
            nxt = []
            for e in blocks:
                nxt.append(e // 2)
                nxt.append(e // 2 + N)
            blocks = nxt
        # leaf i evaluates at psi^{blocks[i]} (for cyclic: omega^{b/2})
        self.leaf_exps = blocks

        self._tables = None  # built lazily (device)

    # -- device tables ----------------------------------------------------
    def _pow_table(self, base_int: int):
        """[2N] powers of base, built by log-doubling on device."""
        f = self.f
        tab = jnp.stack([jnp.asarray(f.const(1)),
                         jnp.asarray(f.const(base_int))], axis=0)
        while tab.shape[0] < 2 * self.N:
            top = f.mul(tab, jnp.asarray(f.const(
                pow(base_int, tab.shape[0], f.q))))
            tab = jnp.concatenate([tab, top], axis=0)
        return tab[: 2 * self.N]

    def tables(self):
        if self._tables is None:
            # force eager eval so cached tables never capture a tracer
            with jax.ensure_compile_time_eval():
                f = self.f
                fwd_pows = self._pow_table(self.psi_int)
                inv_pows = self._pow_table(self.psi_inv_int)
                fwd = [f.take_coeff(fwd_pows, np.asarray(e, dtype=np.int32))
                       for e in self.stage_exps]
                inv = [f.take_coeff(inv_pows, np.asarray(e, dtype=np.int32))
                       for e in self.stage_exps]
                n_inv = f.const(pow(self.N, f.q - 2, f.q))
                self._tables = (jax.device_get(fwd), jax.device_get(inv),
                                n_inv)
        return self._tables

    # -- shape helpers -----------------------------------------------------
    def _split(self, x, m: int):
        """[..., N(,L)] -> (a, b) halves of each of the m blocks."""
        f = self.f
        nd = 1 if f.limbed else 0
        t = self.N // (2 * m)
        view = x.reshape(x.shape[: x.ndim - 1 - nd] + (m, 2, t)
                         + f.limb_shape)
        axis = view.ndim - 2 - nd
        a = jax.lax.index_in_dim(view, 0, axis, keepdims=False)
        b = jax.lax.index_in_dim(view, 1, axis, keepdims=False)
        return a, b

    def _merge(self, a, b, m: int):
        f = self.f
        nd = 1 if f.limbed else 0
        axis = a.ndim - 1 - nd
        view = jnp.stack([a, b], axis=axis)
        return view.reshape(view.shape[: axis - 1] + (self.N,)
                            + f.limb_shape)

    def _w_shape(self, w):
        """stage table [m(,L)] -> broadcastable [m, 1(,L)]."""
        if self.f.limbed:
            return w[:, None, :]
        return w[:, None]

    # -- radix-4 helpers ---------------------------------------------------
    # Two adjacent radix-2 levels fused into one pass: same modular-mult
    # count, HALF the array materializations — the dominant cost of the
    # XLA path is HBM traffic per stage, so this is ~2x fewer passes.
    def _split4(self, x, m: int):
        f = self.f
        nd = 1 if f.limbed else 0
        t = self.N // (4 * m)
        view = x.reshape(x.shape[: x.ndim - 1 - nd] + (m, 4, t)
                         + f.limb_shape)
        axis = view.ndim - 2 - nd
        return tuple(jax.lax.index_in_dim(view, i, axis, keepdims=False)
                     for i in range(4))

    def _merge4(self, qs, m: int):
        f = self.f
        nd = 1 if f.limbed else 0
        axis = qs[0].ndim - 1 - nd
        view = jnp.stack(qs, axis=axis)
        return view.reshape(view.shape[: axis - 1] + (self.N,)
                            + f.limb_shape)

    def _w4(self, tab, lo: int, hi: int, stride: int = 1):
        """slice [lo:hi:stride] of a stage table, broadcast-shaped."""
        w = tab[lo:hi:stride] if stride != 1 else tab[lo:hi]
        return self._w_shape(w)

    # -- transforms --------------------------------------------------------
    def forward(self, x):
        """coeff -> leaf-order evaluations; batched over leading axes."""
        f = self.f
        fwd, _, _ = self.tables()
        s = 0
        logN = self.logN
        if logN % 2:
            m = 1
            a, b = self._split(x, m)
            wb = f.mul(self._w_shape(fwd[0]), b)
            x = self._merge(f.add(a, wb), f.sub(a, wb), m)
            s = 1
        while s < logN:
            m = 1 << s
            w = fwd[s]
            w01 = fwd[s + 1]
            p0, p1, p2, p3 = self._split4(x, m)
            wsh = self._w_shape(w)
            w0 = self._w4(jnp.asarray(w01), 0, 2 * m, 2)
            w1 = self._w4(jnp.asarray(w01), 1, 2 * m, 2)
            wb0 = f.mul(wsh, p2)
            wb1 = f.mul(wsh, p3)
            u0a = f.add(p0, wb0)
            u0b = f.add(p1, wb1)
            u1a = f.sub(p0, wb0)
            u1b = f.sub(p1, wb1)
            t0 = f.mul(w0, u0b)
            t1 = f.mul(w1, u1b)
            x = self._merge4((f.add(u0a, t0), f.sub(u0a, t0),
                              f.add(u1a, t1), f.sub(u1a, t1)), m)
            s += 2
        return x

    def inverse(self, x):
        """leaf-order evaluations -> coeff."""
        f = self.f
        _, inv, n_inv = self.tables()
        logN = self.logN
        s = logN - 2
        while s >= (1 if logN % 2 else 0):
            m = 1 << s
            w = self._w_shape(inv[s])
            w01 = jnp.asarray(inv[s + 1])
            w0 = self._w4(w01, 0, 2 * m, 2)
            w1 = self._w4(w01, 1, 2 * m, 2)
            y0, y1, y2, y3 = self._split4(x, m)
            u0a = f.add(y0, y1)
            u0b = f.mul(w0, f.sub(y0, y1))
            u1a = f.add(y2, y3)
            u1b = f.mul(w1, f.sub(y2, y3))
            p0 = f.add(u0a, u1a)
            p2 = f.mul(w, f.sub(u0a, u1a))
            p1 = f.add(u0b, u1b)
            p3 = f.mul(w, f.sub(u0b, u1b))
            x = self._merge4((p0, p1, p2, p3), m)
            s -= 2
        if logN % 2:
            a, b = self._split(x, 1)
            x = self._merge(f.add(a, b),
                            f.mul(self._w_shape(inv[0]), f.sub(a, b)), 1)
        return f.mul(x, jnp.asarray(n_inv))

    def mul(self, a, b):
        """Negacyclic/cyclic ring multiply: NTT -> pointwise -> INTT."""
        return self.inverse(self.f.mul(self.forward(a), self.forward(b)))

    def square(self, a):
        """a*a with ONE forward transform."""
        fa = self.forward(a)
        return self.inverse(self.f.mul(fa, fa))

    def pointwise(self, fa, fb):
        return self.f.mul(fa, fb)


_CTX = {}


def get_ntt(field_name: str, N: int, negacyclic: bool = True) -> NTTContext:
    key = (field_name, N, negacyclic)
    if key not in _CTX:
        _CTX[key] = NTTContext(get_field(field_name), N, negacyclic)
    return _CTX[key]
