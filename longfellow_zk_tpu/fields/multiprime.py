"""Multi-prime CRT "field" for convolutions over fields without big
2-adic roots of unity.

TPU-native redesign of the reference CRT class (lib/algebra/crt.h:56-299
+ crt.cc): the reference uses 17 fixed 64-bit primes with 2^22-order
roots and scalar Montgomery lanes; TPU has no 64-bit scalar units, so we
use a basis of 32-bit primes p = c*2^22 + 1 (found deterministically at
import by Miller–Rabin, largest first) and represent a CRT element as a
planar tensor ``uint32[2, VS, ...batch]`` of 16-bit limbs — the VS prime
axis and the batch axes both ride the vector lanes, and the Montgomery
multiply is the same lazy-column CIOS as fields/fp.py with per-lane
(per-prime) constants.

Host scalars are numpy object arrays of VS residues so the generic NTT
machinery (transforms/ntt.py) can precompute twiddle tables unchanged.

Garner reconstruction (crt.h:171-207) runs on device: residues are kept
in *natural* form, and multiplying a natural value by a Montgomery-form
constant with the Montgomery multiplier yields a natural product — the
same domain trick the reference uses to avoid of_scalar/from_montgomery
in the inner loop.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

MASK16 = np.uint32(0xFFFF)

K_OMEGA_LOG_ORDER = 22  # kOmegaOrder = 2^22 (crt.h:41)


def _is_prime(n: int) -> bool:
    """Deterministic Miller–Rabin for n < 2^64."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = (x * x) % n
            if x == n - 1:
                break
        else:
            return False
    return True


@functools.lru_cache(maxsize=None)
def crt_primes(vs: int) -> tuple:
    """The `vs` largest primes c*2^22+1 below 2^32, descending."""
    out = []
    for c in range(1023, 0, -1):
        p = (c << K_OMEGA_LOG_ORDER) + 1
        if _is_prime(p):
            out.append(p)
            if len(out) == vs:
                return tuple(out)
    raise ValueError(f"not enough CRT primes for vs={vs}")


def _find_omega(p: int) -> int:
    """Element of exact order 2^22 in F_p (p = c*2^22+1)."""
    e = (p - 1) >> K_OMEGA_LOG_ORDER
    for g in range(2, 1000):
        w = pow(g, e, p)
        if pow(w, 1 << (K_OMEGA_LOG_ORDER - 1), p) != 1:
            return w
    raise ValueError("no omega found")


def basis_size_for(field_bits: int, log_n: int = K_OMEGA_LOG_ORDER) -> int:
    """Primes needed so prod p_b > n * p^2 (the convolution coefficient
    bound; crt.h:49-53).  32-bit primes => ~1 prime per 31 bits."""
    need = 2 * field_bits + log_n + 2
    primes = crt_primes(40)
    total, vs = 0, 0
    for p in primes:
        total += p.bit_length() - 1
        vs += 1
        if total >= need:
            return vs
    raise ValueError("basis too small")


class MultiPrimeField:
    """VS independent 32-bit prime fields in planar uint32[2, VS, ...]
    16-bit-limb Montgomery lanes (R = 2^32 per lane)."""

    kCharacteristicTwo = False
    L = 2
    kNLead = 2  # leading axes of the planar layout: (L, VS)

    def __init__(self, vs: int):
        self.vs = vs
        self.primes = list(crt_primes(vs))
        self.omegas = np.array([_find_omega(p) for p in self.primes],
                               dtype=object)
        self.omega_order = 1 << K_OMEGA_LOG_ORDER
        ps = np.array(self.primes, dtype=np.uint64)
        self.p_np = [np.uint32(ps & 0xFFFF), np.uint32(ps >> 16)]
        self.n0inv_np = np.uint32(
            [(-pow(p, -1, 1 << 16)) % (1 << 16) for p in self.primes])
        self.R = 1 << 32
        self.r2 = np.array([(self.R * self.R) % p for p in self.primes],
                           dtype=object)

    # -- host scalar ops: numpy object arrays of VS residues ---------------

    def _vec(self, a) -> np.ndarray:
        if isinstance(a, (int, np.integer)):
            return np.array([int(a) % p for p in self.primes], dtype=object)
        return a

    def of_scalar(self, a) -> np.ndarray:
        return self._vec(a)

    def add_i(self, a, b):
        a, b = self._vec(a), self._vec(b)
        return np.array([(int(x) + int(y)) % p for x, y, p in
                         zip(a, b, self.primes)], dtype=object)

    def sub_i(self, a, b):
        a, b = self._vec(a), self._vec(b)
        return np.array([(int(x) - int(y)) % p for x, y, p in
                         zip(a, b, self.primes)], dtype=object)

    def mul_i(self, a, b):
        a, b = self._vec(a), self._vec(b)
        return np.array([(int(x) * int(y)) % p for x, y, p in
                         zip(a, b, self.primes)], dtype=object)

    def neg_i(self, a):
        return np.array([(-int(x)) % p for x, p in
                         zip(self._vec(a), self.primes)], dtype=object)

    def inv_i(self, a):
        return np.array([pow(int(x), -1, p) for x, p in
                         zip(self._vec(a), self.primes)], dtype=object)

    def to_crt(self, x: int) -> np.ndarray:
        return self._vec(int(x))

    # -- host <-> device ----------------------------------------------------

    def to_limbs(self, xs) -> np.ndarray:
        """Residue vector(s) (natural) -> uint32[2, VS] or [2, VS, n]
        Montgomery limbs."""
        if isinstance(xs, np.ndarray) and xs.dtype == object and \
                xs.ndim == 1:
            xs = [xs]
            single = True
        else:
            single = False
        n = len(xs)
        out = np.zeros((2, self.vs, n), dtype=np.uint32)
        for j, v in enumerate(xs):
            v = self._vec(v)
            for b, p in enumerate(self.primes):
                m = (int(v[b]) << 32) % p
                out[0, b, j] = m & 0xFFFF
                out[1, b, j] = m >> 16
        return out[..., 0] if single else out

    def from_limbs(self, arr) -> np.ndarray:
        """uint32[2, VS, ...] Montgomery -> object array [VS, ...] natural."""
        a = np.asarray(arr)
        vals = (a[0].astype(np.uint64) |
                (a[1].astype(np.uint64) << np.uint64(16)))
        out = np.empty(vals.shape, dtype=object)
        rinv = [pow(1 << 32, -1, p) for p in self.primes]
        for b in range(self.vs):
            pb, rb = self.primes[b], rinv[b]
            flat = vals[b].reshape(-1)
            res = [int(v) * rb % pb for v in flat]
            out[b] = np.array(res, dtype=object).reshape(vals[b].shape)
        return out

    # -- device ops ----------------------------------------------------------

    def zeros(self, shape=()) -> jax.Array:
        return jnp.zeros((2, self.vs) + tuple(shape), jnp.uint32)

    def _pc(self, arr_np, nb: int):
        """[VS] per-lane constant -> broadcastable [VS, 1*nb]."""
        return jnp.asarray(arr_np).reshape((self.vs,) + (1,) * nb)

    def _cond_sub_p(self, t: List[jax.Array], top: jax.Array, nb: int):
        p0, p1 = self._pc(self.p_np[0], nb), self._pc(self.p_np[1], nb)
        d0 = t[0] - p0
        bor = d0 >> np.uint32(31)
        d1 = t[1] - p1 - bor
        bor = d1 >> np.uint32(31)
        ge = (top != 0) | (bor == 0)
        return [jnp.where(ge, d0 & MASK16, t[0]),
                jnp.where(ge, d1 & MASK16, t[1])]

    def add(self, a: jax.Array, b: jax.Array) -> jax.Array:
        nb = a.ndim - 2
        s0 = a[0] + b[0]
        c = s0 >> np.uint32(16)
        s1 = a[1] + b[1] + c
        c = s1 >> np.uint32(16)
        return jnp.stack(
            self._cond_sub_p([s0 & MASK16, s1 & MASK16], c, nb), axis=0)

    def sub(self, a: jax.Array, b: jax.Array) -> jax.Array:
        nb = a.ndim - 2
        d0 = a[0] - b[0]
        bor = d0 >> np.uint32(31)
        d1 = a[1] - b[1] - bor
        bor = d1 >> np.uint32(31)
        p0, p1 = self._pc(self.p_np[0], nb), self._pc(self.p_np[1], nb)
        addp = bor != 0
        s0 = (d0 & MASK16) + jnp.where(addp, p0, np.uint32(0))
        c = s0 >> np.uint32(16)
        s1 = (d1 & MASK16) + jnp.where(addp, p1, np.uint32(0)) + c
        return jnp.stack([s0 & MASK16, s1 & MASK16], axis=0)

    def mul(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Per-lane Montgomery product, 2-limb unrolled CIOS (same lazy
        column scheme as fields/fp.PrimeField._mont_mul_limbs)."""
        shp = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        nb = len(shp) - 1
        a = jnp.broadcast_to(a, (2,) + shp)
        b = jnp.broadcast_to(b, (2,) + shp)
        al, bl = [a[0], a[1]], [b[0], b[1]]
        zero = jnp.zeros(shp, jnp.uint32)
        T = [zero] * 5
        for i in range(2):
            for j in range(2):
                pr = al[i] * bl[j]
                T[i + j] = T[i + j] + (pr & MASK16)
                T[i + j + 1] = T[i + j + 1] + (pr >> np.uint32(16))
        p = [self._pc(self.p_np[0], nb), self._pc(self.p_np[1], nb)]
        n0inv = self._pc(self.n0inv_np, nb)
        carry = zero
        for i in range(2):
            cur = T[i] + carry
            m = ((cur & MASK16) * n0inv) & MASK16
            for j in range(2):
                pr = m * p[j]
                lo = pr & MASK16
                hi = pr >> np.uint32(16)
                if j == 0:
                    cur = cur + lo
                else:
                    T[i + j] = T[i + j] + lo
                T[i + j + 1] = T[i + j + 1] + hi
            carry = cur >> np.uint32(16)
        res = []
        c = carry
        for k in range(2, 4):
            cur = T[k] + c
            res.append(cur & MASK16)
            c = cur >> np.uint32(16)
        top = T[4] + c
        return jnp.stack(self._cond_sub_p(res, top, nb), axis=0)

    def select(self, cond: jax.Array, a: jax.Array, b: jax.Array):
        return jnp.where(cond[None], a, b)
