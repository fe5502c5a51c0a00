"""Quadratic extension field Fp2 = Fp[i]/(i^2 - nonresidue).

Semantic twin of the reference Fp2 (lib/algebra/fp2.h:35-250): default
nonresidue is -1 (fast path), used to obtain 2^31-order roots of unity
over the P-256 base field for Reed-Solomon encoding
(lib/circuits/mdoc/mdoc_zk.cc:82-88).  The "subfield" of an Fp2 is the
base field: subfield serialization writes only the real part
(fp2.h:44,216-218).

Host scalars are (re, im) int tuples; device elements are
``uint32[2, L, ...batch]`` stacking the base-field planar limb arrays.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fp import PrimeField

Array = jax.Array
Elt2 = Tuple[int, int]


class Fp2:
    kCharacteristicTwo = False
    kNPolyEvaluationPoints = 6

    def __init__(self, base: PrimeField, nonresidue: int = -1):
        self.f = base
        self.name = base.name + "^2"
        self.nonresidue = nonresidue % base.p
        self.kBytes = 2 * base.kBytes
        self.kSubFieldBytes = base.kBytes
        self.L = base.L
        # -1 nonresidue enables the (ac - bd, ad + bc) fast path
        self.neg_one_nonresidue = self.nonresidue == base.p - 1

    # ------------------------------------------------------------------
    # host ops on (re, im) int tuples
    # ------------------------------------------------------------------

    def add_i(self, a: Elt2, b: Elt2) -> Elt2:
        return (self.f.add_i(a[0], b[0]), self.f.add_i(a[1], b[1]))

    def sub_i(self, a: Elt2, b: Elt2) -> Elt2:
        return (self.f.sub_i(a[0], b[0]), self.f.sub_i(a[1], b[1]))

    def neg_i(self, a: Elt2) -> Elt2:
        return (self.f.neg_i(a[0]), self.f.neg_i(a[1]))

    def mul_i(self, a: Elt2, b: Elt2) -> Elt2:
        p = self.f.p
        p0 = a[0] * b[0] % p
        p1 = a[1] * b[1] % p
        re = (p0 + p1 * self.nonresidue) % p
        im = ((a[0] + a[1]) * (b[0] + b[1]) - p0 - p1) % p
        return (re, im)

    def inv_i(self, a: Elt2) -> Elt2:
        p = self.f.p
        denom = (a[0] * a[0] - self.nonresidue * a[1] * a[1]) % p
        dinv = pow(denom, -1, p)
        return (a[0] * dinv % p, (-a[1]) * dinv % p)

    def of_scalar(self, a) -> Elt2:
        if isinstance(a, tuple):
            return a
        return (int(a) % self.f.p, 0)

    of_scalar_field = of_scalar

    def of_base(self, re: int) -> Elt2:
        return (re, 0)

    def poly_evaluation_point(self, i: int) -> Elt2:
        return (self.f.poly_evaluation_point(i), 0)

    def newton_denominator(self, k: int, i: int) -> Elt2:
        return (self.f.newton_denominator(k, i), 0)

    def to_bytes(self, x: Elt2) -> bytes:
        return self.f.to_bytes(x[0]) + self.f.to_bytes(x[1])

    def of_bytes(self, b: bytes) -> Optional[Elt2]:
        assert len(b) == self.kBytes
        re = self.f.of_bytes(b[: self.f.kBytes])
        im = self.f.of_bytes(b[self.f.kBytes :])
        if re is None or im is None:
            return None
        return (re, im)

    def to_bytes_subfield(self, x: Elt2) -> bytes:
        assert x[1] == 0, "element not in base subfield"
        return self.f.to_bytes(x[0])

    def of_bytes_subfield(self, b: bytes) -> Optional[Elt2]:
        re = self.f.of_bytes(b)
        return None if re is None else (re, 0)

    def in_subfield(self, e: Elt2) -> bool:
        return e[1] == 0

    def sample(self, fill_bytes) -> Elt2:
        return (self.f.sample(fill_bytes), self.f.sample(fill_bytes))

    def sample_subfield(self, fill_bytes) -> Elt2:
        return (self.f.sample(fill_bytes), 0)

    # ------------------------------------------------------------------
    # host <-> device
    # ------------------------------------------------------------------

    def to_limbs(self, xs) -> np.ndarray:
        if isinstance(xs, tuple) and len(xs) == 2 and isinstance(xs[0], (int, np.integer)):
            return np.stack([self.f.to_limbs(xs[0]), self.f.to_limbs(xs[1])])
        res = np.stack([self.f.to_limbs([x[0] for x in xs]),
                        self.f.to_limbs([x[1] for x in xs])])
        return res  # [2, L, n]

    def from_limbs(self, arr):
        a = np.asarray(arr)
        re = self.f.from_limbs(a[0])
        im = self.f.from_limbs(a[1])
        if a.ndim == 2:
            return (re, im)
        flat_re = np.ravel(re)
        flat_im = np.ravel(im)
        out = np.array([(int(r), int(i)) for r, i in zip(flat_re, flat_im)],
                       dtype=object)
        return out.reshape(a.shape[2:] + (2,))

    # ------------------------------------------------------------------
    # device ops on uint32[2, L, ...]
    # ------------------------------------------------------------------

    def zeros(self, shape=()) -> Array:
        return jnp.zeros((2, self.L) + tuple(shape), dtype=jnp.uint32)

    def broadcast_const(self, x, shape=()) -> Array:
        x = self.of_scalar(x) if not isinstance(x, tuple) else x
        return jnp.stack([
            self.f.broadcast_const(x[0], shape),
            self.f.broadcast_const(x[1], shape),
        ])

    def add(self, a: Array, b: Array) -> Array:
        return jnp.stack([self.f.add(a[0], b[0]), self.f.add(a[1], b[1])])

    def sub(self, a: Array, b: Array) -> Array:
        return jnp.stack([self.f.sub(a[0], b[0]), self.f.sub(a[1], b[1])])

    def neg(self, a: Array) -> Array:
        return jnp.stack([self.f.neg(a[0]), self.f.neg(a[1])])

    def mul(self, a: Array, b: Array) -> Array:
        F = self.f
        p0 = F.mul(a[0], b[0])
        p1 = F.mul(a[1], b[1])
        if self.neg_one_nonresidue:
            re = F.sub(p0, p1)
        else:
            re = F.add(p0, F.mul_const(p1, self.nonresidue))
        # Karatsuba imaginary part
        im = F.sub(F.sub(F.mul(F.add(a[0], a[1]), F.add(b[0], b[1])), p0), p1)
        return jnp.stack([re, im])

    def mul_base(self, a: Array, s: Array) -> Array:
        """Multiply by a base-field element (scalar per lane)."""
        return jnp.stack([self.f.mul(a[0], s), self.f.mul(a[1], s)])

    def sqr(self, a: Array) -> Array:
        return self.mul(a, a)

    def mul_const(self, a: Array, c) -> Array:
        return self.mul(a, self.broadcast_const(c, a.shape[2:]))

    def inv(self, a: Array) -> Array:
        F = self.f
        if self.neg_one_nonresidue:
            denom = F.add(F.mul(a[0], a[0]), F.mul(a[1], a[1]))
        else:
            denom = F.sub(F.mul(a[0], a[0]),
                          F.mul_const(F.mul(a[1], a[1]), self.nonresidue))
        dinv = F.inv(denom)
        return jnp.stack([F.mul(a[0], dinv), F.neg(F.mul(a[1], dinv))])

    batch_inverse = inv

    def eq(self, a: Array, b: Array) -> Array:
        return jnp.all(a == b, axis=(0, 1))

    def is_zero(self, a: Array) -> Array:
        return jnp.all(a == 0, axis=(0, 1))

    def select(self, cond: Array, a: Array, b: Array) -> Array:
        return jnp.where(cond[None, None, ...], a, b)

    def from_mont_device(self, a: Array) -> Array:
        return jnp.stack([self.f.from_mont_device(a[0]),
                          self.f.from_mont_device(a[1])])

    def natural_limbs_to_bytes_np(self, arr) -> np.ndarray:
        a = np.asarray(arr)
        re = self.f.natural_limbs_to_bytes_np(a[0])
        im = self.f.natural_limbs_to_bytes_np(a[1])
        return np.concatenate([re, im], axis=-1)

    def natural_limbs_to_bytes_dev(self, arr: Array) -> Array:
        re = self.f.natural_limbs_to_bytes_dev(arr[0])
        im = self.f.natural_limbs_to_bytes_dev(arr[1])
        return jnp.concatenate([re, im], axis=-1)

    def lazy_sum(self, a: Array, axis: int) -> Array:
        return jnp.stack([self.f.lazy_sum(a[0], axis),
                          self.f.lazy_sum(a[1], axis)])

    def lazy_segment_sum(self, a: Array, seg_ids, num_segments: int) -> Array:
        return jnp.stack([
            self.f.lazy_segment_sum(a[0], seg_ids, num_segments),
            self.f.lazy_segment_sum(a[1], seg_ids, num_segments),
        ])
