"""ctypes loader + wrapper for the native host library.

Compiles csrc/stark_rings_host.cpp with g++ on first use (cached in
build/); falls back with a clear error if no toolchain is available."""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess

import numpy as np

__all__ = ["get_host_lib", "HostGoldilocks", "HostRing"]

_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _ROOT / "csrc" / "stark_rings_host.cpp"
_BUILD = _ROOT / "build"

_lib = None


def _so_path() -> pathlib.Path:
    """Cache path keyed on a hash of the source: the oracle is ALWAYS
    built from the checked-in csrc on this machine — a stale or foreign
    binary (e.g. from a different host's -march=native) can never load."""
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    return _BUILD / f"libstark_rings_host.{digest}.so"


def get_host_lib():
    global _lib
    if _lib is not None:
        return _lib
    so = _so_path()
    if not so.exists():
        _BUILD.mkdir(exist_ok=True)
        tmp = so.with_suffix(".tmp.so")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(tmp)],
            check=True)
        os.replace(tmp, so)
    lib = ctypes.CDLL(str(so))
    u64 = ctypes.c_uint64
    p64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.srh_goldilocks_q.restype = u64
    lib.srh_mul.restype = u64
    lib.srh_mul.argtypes = [u64, u64]
    lib.srh_pow.restype = u64
    lib.srh_pow.argtypes = [u64, u64]
    lib.srh_ntt_forward.argtypes = [p64, p64, u64, u64]
    lib.srh_ntt_inverse.argtypes = [p64, p64, u64, u64, u64]
    lib.srh_pointwise_mul.argtypes = [p64, p64, p64, u64]
    lib.srh_negacyclic_mul_schoolbook.argtypes = [p64, p64, p64, u64]
    lib.srh_decompose_balanced.argtypes = [p64, pi64, u64, u64, u64]
    lib.srh_ntt_forward_q.argtypes = [p64, p64, u64, u64, u64]
    lib.srh_ntt_inverse_q.argtypes = [p64, p64, u64, u64, u64, u64]
    lib.srh_pointwise_mul_q.argtypes = [p64, p64, p64, u64, u64]
    lib.srh_negacyclic_mul_schoolbook_q.argtypes = [p64, p64, p64, u64,
                                                    u64]
    _lib = lib
    return lib


class HostGoldilocks:
    """Host-side Goldilocks NTT with the same stage tables / leaf order as
    the device kernels (bit-exact oracle)."""

    def __init__(self, N: int):
        from ..fields import GOLDILOCKS
        from ..ops.ntt import NTTContext

        self.N = N
        self.lib = get_host_lib()
        ctx = NTTContext(GOLDILOCKS, N, negacyclic=True)
        fwd, inv, n_inv = ctx.tables()
        self.wf = np.zeros(N, dtype=np.uint64)
        self.wi = np.zeros(N, dtype=np.uint64)
        for s, tab in enumerate(fwd):
            self.wf[(1 << s):(2 << s)] = np.asarray(tab)
        for s, tab in enumerate(inv):
            self.wi[(1 << s):(2 << s)] = np.asarray(tab)
        self.ninv = int(n_inv)

    def forward(self, x: np.ndarray) -> np.ndarray:
        out = np.ascontiguousarray(x, dtype=np.uint64).copy()
        flat = out.reshape(-1, self.N)
        self.lib.srh_ntt_forward(flat, self.wf, flat.shape[0], self.N)
        return out

    def inverse(self, x: np.ndarray) -> np.ndarray:
        out = np.ascontiguousarray(x, dtype=np.uint64).copy()
        flat = out.reshape(-1, self.N)
        self.lib.srh_ntt_inverse(flat, self.wi, np.uint64(self.ninv),
                                 flat.shape[0], self.N)
        return out

    def mul(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        fa = self.forward(a)
        fb = self.forward(b)
        prod = np.empty_like(fa)
        self.lib.srh_pointwise_mul(fa.reshape(-1), fb.reshape(-1),
                                   prod.reshape(-1), fa.size)
        return self.inverse(prod)

    def mul_schoolbook(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Independent O(N^2) oracle."""
        a = np.ascontiguousarray(a, dtype=np.uint64)
        b = np.ascontiguousarray(b, dtype=np.uint64)
        c = np.empty_like(a)
        self.lib.srh_negacyclic_mul_schoolbook(a, b, c, self.N)
        return c


class HostRing:
    """Host-side power-of-two negacyclic NTT oracle for ANY u64-word
    prime in the registry (babybear; goldilocks routes here too for
    cross-checks).  Works in the CANONICAL domain: Montgomery-storage
    fields (babybear) are decoded at the boundary, so every value the C
    kernels touch is a plain integer in [0, q) — same tables and leaf
    order as the device NTTContext."""

    def __init__(self, field_name: str, N: int):
        from ..fields import get_field
        from ..ops.ntt import NTTContext

        f = get_field(field_name)
        assert not f.limbed, "HostRing covers single-word fields"
        self.f = f
        self.q = f.q
        self.N = N
        self.lib = get_host_lib()
        ctx = NTTContext(f, N, negacyclic=True)
        fwd, inv, n_inv = ctx.tables()
        self.wf = np.zeros(N, dtype=np.uint64)
        self.wi = np.zeros(N, dtype=np.uint64)
        for s, tab in enumerate(fwd):
            self.wf[(1 << s):(2 << s)] = np.asarray(
                f.decode(np.asarray(tab)), dtype=np.uint64)
        for s, tab in enumerate(inv):
            self.wi[(1 << s):(2 << s)] = np.asarray(
                f.decode(np.asarray(tab)), dtype=np.uint64)
        self.ninv = int(f.decode(np.asarray(n_inv)))

    def _canon(self, x) -> np.ndarray:
        """Storage array -> canonical uint64 (contiguous copy)."""
        return np.ascontiguousarray(
            np.asarray(self.f.decode(np.asarray(x)), dtype=np.uint64))

    def forward(self, x: np.ndarray) -> np.ndarray:
        out = np.ascontiguousarray(x, dtype=np.uint64).copy()
        flat = out.reshape(-1, self.N)
        self.lib.srh_ntt_forward_q(flat, self.wf, flat.shape[0], self.N,
                                   np.uint64(self.q))
        return out

    def inverse(self, x: np.ndarray) -> np.ndarray:
        out = np.ascontiguousarray(x, dtype=np.uint64).copy()
        flat = out.reshape(-1, self.N)
        self.lib.srh_ntt_inverse_q(flat, self.wi, np.uint64(self.ninv),
                                   flat.shape[0], self.N, np.uint64(self.q))
        return out

    def mul(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Canonical uint64 in, canonical uint64 out."""
        fa = self.forward(a)
        fb = self.forward(b)
        prod = np.empty_like(fa)
        self.lib.srh_pointwise_mul_q(fa.reshape(-1), fb.reshape(-1),
                                     prod.reshape(-1), fa.size,
                                     np.uint64(self.q))
        return self.inverse(prod)

    def mul_storage(self, a, b) -> np.ndarray:
        """Storage-form operands -> canonical product (the gate shape:
        compare against field.decode of the device result)."""
        return self.mul(self._canon(a), self._canon(b))

    def mul_schoolbook(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        a = np.ascontiguousarray(a, dtype=np.uint64)
        b = np.ascontiguousarray(b, dtype=np.uint64)
        c = np.empty_like(a)
        self.lib.srh_negacyclic_mul_schoolbook_q(a, b, c, self.N,
                                                 np.uint64(self.q))
        return c
