"""Fp24 (small 24-bit prime field) and its sextic extension Fp24_6.

Semantic twins of reference lib/algebra/fp24.h:34-360 and fp24_6.h
(the small-field experiments used by the SHA3 and ML-DSA circuits; the
canonical instance is the Dilithium prime q = 8380417 with x^6 - 7
irreducible).  The reference stores Fp24 directly in 32-bit words; here
Fp24 is simply PrimeField(q) — two 16-bit planar limbs — so every
device kernel is shared, and the extension is a planar [6, L, ...]
stack with the x^6 = beta fold.

Host elements of the extension are 6-tuples of ints (hashable, as the
compiler's CSE requires).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .fp import PrimeField

FP24_P = 8380417  # = 2^23 - 2^13 + 1, the ML-DSA modulus (fp24_test.cc)


def fp24(p: int = FP24_P) -> PrimeField:
    F = PrimeField(p, f"fp24({p})", nbytes=4)
    return F


Elt6 = Tuple[int, int, int, int, int, int]


class Fp24_6:
    """Sextic extension F_p[x]/(x^6 - beta) (fp24_6.h:33-315)."""

    kCharacteristicTwo = False
    kNPolyEvaluationPoints = 6
    kNLead = 2  # planar leading axes: (6, L)

    def __init__(self, base: PrimeField, beta: int = 7):
        self.f = base
        self.beta = beta
        self.char = base.p
        self.order = base.p ** 6
        self.kBytes = 6 * base.kBytes
        self.kSubFieldBytes = base.kBytes
        self.L = base.L
        self.exact_bits = 6 * base.bits

    # -- host ops (6-tuples, natural form) -----------------------------------

    def _t(self, a) -> Elt6:
        if isinstance(a, tuple):
            return a
        return (int(a) % self.f.p, 0, 0, 0, 0, 0)

    def of_scalar(self, a) -> Elt6:
        return self._t(a)

    def of_base(self, a: int) -> Elt6:
        return (a, 0, 0, 0, 0, 0)

    def add_i(self, a, b) -> Elt6:
        a, b = self._t(a), self._t(b)
        return tuple((x + y) % self.f.p for x, y in zip(a, b))

    def sub_i(self, a, b) -> Elt6:
        a, b = self._t(a), self._t(b)
        return tuple((x - y) % self.f.p for x, y in zip(a, b))

    def neg_i(self, a) -> Elt6:
        return tuple((-x) % self.f.p for x in self._t(a))

    def mul_i(self, a, b) -> Elt6:
        a, b = self._t(a), self._t(b)
        p = self.f.p
        # subfield fast paths (most circuit values live in Fp24)
        if not any(a[1:]):
            a0 = a[0]
            return tuple((a0 * x) % p for x in b)
        if not any(b[1:]):
            b0 = b[0]
            return tuple((x * b0) % p for x in a)
        m = [0] * 11
        for i in range(6):
            for j in range(6):
                m[i + j] += a[i] * b[j]
        return tuple((m[k] + self.beta * m[k + 6]) % p if k < 5
                     else m[5] % p for k in range(6))

    def inv_i(self, a) -> Elt6:
        """Extended Euclid over F_p[x] mod (x^6 - beta): maintain
        s_i * a == r_i (mod x^6 - beta)."""
        p = self.f.p
        a = self._t(a)
        assert any(a), "inverse of zero"

        def pdeg(u):
            for d in range(len(u) - 1, -1, -1):
                if u[d] % p:
                    return d
            return -1

        def pdivmod(num, den):
            num = list(num)
            dd = pdeg(den)
            dinv = pow(den[dd], -1, p)
            q = [0] * (max(pdeg(num) - dd, -1) + 1)
            while pdeg(num) >= dd:
                dn = pdeg(num)
                c = num[dn] * dinv % p
                q[dn - dd] = c
                for i in range(dd + 1):
                    num[i + dn - dd] = (num[i + dn - dd] - c * den[i]) % p
            return q, num

        def psub_mul(s, q, t):
            """s - q*t."""
            out = list(s) + [0] * max(0, pdeg(q) + pdeg(t) + 1 - len(s) + 1)
            for i, qc in enumerate(q):
                if qc == 0:
                    continue
                for j, tc in enumerate(t):
                    out[i + j] = (out[i + j] - qc * tc) % p
            return out

        r0 = [(-self.beta) % p, 0, 0, 0, 0, 0, 1]
        r1 = list(a)
        s0, s1 = [0], [1]
        while pdeg(r1) > 0:
            q, r = pdivmod(r0, r1)
            r0, r1 = r1, r
            s0, s1 = s1, psub_mul(s0, q, s1)
        assert pdeg(r1) == 0, "not invertible"
        cinv = pow(r1[0], -1, p)
        out = [(x * cinv) % p for x in s1[:6]]
        out += [0] * (6 - len(out))
        res = tuple(out)
        assert self.mul_i(res, a) == self.of_scalar(1)
        return res

    def poly_evaluation_point(self, i: int) -> Elt6:
        assert i < self.kNPolyEvaluationPoints
        return self.of_scalar(i)

    def newton_denominator(self, k: int, i: int) -> Elt6:
        return self.of_scalar(pow(i, -1, self.f.p))

    # -- serialization (little-endian, coefficient-major; fp24_6.h) ----------

    def to_bytes(self, x) -> bytes:
        return b"".join(self.f.to_bytes(c) for c in self._t(x))

    def of_bytes(self, b: bytes) -> Optional[Elt6]:
        assert len(b) == self.kBytes
        nb = self.f.kBytes
        out = []
        for i in range(6):
            v = self.f.of_bytes(b[i * nb : (i + 1) * nb])
            if v is None:
                return None
            out.append(v)
        return tuple(out)

    def to_bytes_subfield(self, x) -> bytes:
        t = self._t(x)
        assert all(c == 0 for c in t[1:])
        return self.f.to_bytes(t[0])

    def of_bytes_subfield(self, b: bytes) -> Optional[Elt6]:
        v = self.f.of_bytes(b)
        return None if v is None else self.of_base(v)

    def in_subfield(self, e) -> bool:
        return all(c == 0 for c in self._t(e)[1:])

    def sample(self, fill_bytes) -> Elt6:
        return tuple(self.f.sample(fill_bytes) for _ in range(6))

    def sample_subfield(self, fill_bytes) -> Elt6:
        return self.of_base(self.f.sample(fill_bytes))

    # -- host <-> device ------------------------------------------------------

    def to_limbs(self, xs) -> np.ndarray:
        if isinstance(xs, (int, tuple)):
            t = self._t(xs)
            return np.stack([self.f.to_limbs(c) for c in t], axis=0)
        cols = [self._t(x) for x in xs]
        return np.stack(
            [self.f.to_limbs([c[i] for c in cols]) for i in range(6)], axis=0)

    def from_limbs(self, arr):
        a = np.asarray(arr)
        assert a.shape[0] == 6
        parts = [self.f.from_limbs(a[i]) for i in range(6)]
        if a.ndim == 2:
            return tuple(int(p) for p in parts)
        out = np.empty(parts[0].shape, dtype=object)
        for idx in np.ndindex(parts[0].shape):
            out[idx] = tuple(int(p[idx]) for p in parts)
        return out

    # -- device ops ------------------------------------------------------------

    def zeros(self, shape=()) -> jax.Array:
        return jnp.zeros((6, self.L) + tuple(shape), jnp.uint32)

    def broadcast_const(self, x, shape=()) -> jax.Array:
        c = jnp.asarray(self.to_limbs(self._t(x)))
        return jnp.broadcast_to(
            c.reshape((6, self.L) + (1,) * len(shape)),
            (6, self.L) + tuple(shape))

    def add(self, a: jax.Array, b: jax.Array) -> jax.Array:
        return jnp.stack([self.f.add(a[i], b[i]) for i in range(6)], axis=0)

    def sub(self, a: jax.Array, b: jax.Array) -> jax.Array:
        return jnp.stack([self.f.sub(a[i], b[i]) for i in range(6)], axis=0)

    def neg(self, a: jax.Array) -> jax.Array:
        return jnp.stack([self.f.neg(a[i]) for i in range(6)], axis=0)

    def mul(self, a: jax.Array, b: jax.Array) -> jax.Array:
        f = self.f
        m = [None] * 11
        for i in range(6):
            for j in range(6):
                pr = f.mul(a[i], b[j])
                m[i + j] = pr if m[i + j] is None else f.add(m[i + j], pr)
        out = []
        for k in range(6):
            c = m[k]
            if k < 5:
                c = f.add(c, f.mul_const(m[k + 6], self.beta))
            out.append(c)
        return jnp.stack(out, axis=0)

    def sqr(self, a: jax.Array) -> jax.Array:
        return self.mul(a, a)

    def inv(self, a: jax.Array) -> jax.Array:
        """a^(p^6 - 2) by square-and-multiply scan."""
        e = self.order - 2
        nb = e.bit_length()
        bits = jnp.asarray(np.array(
            [(e >> (nb - 1 - i)) & 1 for i in range(nb)], np.uint32))
        one = self.broadcast_const(1, a.shape[2:])

        def step(r, bit):
            r2 = self.sqr(r)
            r3 = self.mul(r2, a)
            return jnp.where(bit != 0, r3, r2), None

        r, _ = jax.lax.scan(step, one, bits)
        return r

    def eq(self, a: jax.Array, b: jax.Array) -> jax.Array:
        return jnp.all(a == b, axis=(0, 1))

    def is_zero(self, a: jax.Array) -> jax.Array:
        return jnp.all(a == 0, axis=(0, 1))

    def select(self, cond: jax.Array, a: jax.Array, b: jax.Array):
        return jnp.where(cond[None, None], a, b)

    def lazy_sum(self, a: jax.Array, axis: int) -> jax.Array:
        return jnp.stack([self.f.lazy_sum(a[i], axis) for i in range(6)],
                         axis=0)
