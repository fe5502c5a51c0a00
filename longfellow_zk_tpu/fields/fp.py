"""Vectorized prime-field arithmetic for TPU.

TPU-native re-design of the reference Montgomery field
(lib/algebra/fp_generic.h): instead of scalar 64-bit limb carry chains,
field elements are **planar limb tensors** ``uint32[L, ...batch]`` holding
16-bit limbs, so the batch axis rides the TPU vector lanes and every op is
a fixed, unrolled sequence of uint32 ops that XLA fuses into surrounding
kernels.  The multiply uses lazy column accumulation (the analogue of the
reference's ``Accum`` lazy-reduction trick, fp_generic.h:424-458): 16x16
partial products are split into lo/hi halves and accumulated carry-free in
uint32 columns (column sums stay < 2^22), with a single interleaved
Montgomery reduction pass.

Elements are stored in Montgomery form with R = 2^(16*L).  Host-side
control-plane arithmetic uses plain Python ints (natural form).

Serialization matches the reference: little-endian bytes of the natural
(non-Montgomery) value, width kBytes (fp_generic.h:344-388).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

MASK16 = np.uint32(0xFFFF)

Array = jax.Array
Limbs = List[Array]  # python list of uint32[...] arrays, one per limb


def _int_to_limbs16(x: int, nlimbs: int) -> np.ndarray:
    out = np.zeros(nlimbs, dtype=np.uint32)
    for i in range(nlimbs):
        out[i] = x & 0xFFFF
        x >>= 16
    assert x == 0
    return out


def _limbs16_to_int(limbs: Sequence[int]) -> int:
    x = 0
    for i, v in enumerate(limbs):
        x |= int(v) << (16 * i)
    return x


class PrimeField:
    """A prime field Fp with vectorized device ops and host int ops.

    Device representation: ``uint32[L, ...]`` arrays of 16-bit limbs in
    Montgomery form (R = 2^(16 L)).  The limb axis is axis 0 ("planar"),
    so batch axes map onto TPU lanes.
    """

    kCharacteristicTwo = False
    kNPolyEvaluationPoints = 6

    def __init__(self, p: int, name: str, nbytes: Optional[int] = None):
        self.p = p
        self.char = p  # field characteristic (generic packing basis)
        self.name = name
        self.bits = p.bit_length()
        self.L = (self.bits + 15) // 16
        self.kBytes = nbytes if nbytes is not None else self.L * 2
        # Reference kSubFieldBytes == kBytes for prime fields
        # (fp_generic.h:47); there is no proper subfield.
        self.kSubFieldBytes = self.kBytes
        self.exact_bits = self.bits
        self.R = 1 << (16 * self.L)
        assert p % 2 == 1 and p < self.R
        self.Rinv = pow(self.R, -1, p)
        self.R2 = (self.R * self.R) % p
        # n0inv = -p^{-1} mod 2^16 (CIOS m-factor)
        self.n0inv = np.uint32((-pow(p, -1, 1 << 16)) % (1 << 16))
        self.p_np = _int_to_limbs16(p, self.L)
        self.r2_np = _int_to_limbs16(self.R2, self.L)
        self.one_mont_np = _int_to_limbs16(self.R % p, self.L)
        self.mont_one_int = self.R % p

    # ------------------------------------------------------------------
    # host scalar (python int, natural form) ops
    # ------------------------------------------------------------------

    def add_i(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub_i(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def mul_i(self, a: int, b: int) -> int:
        return (a * b) % self.p

    def neg_i(self, a: int) -> int:
        return (-a) % self.p

    def inv_i(self, a: int) -> int:
        return pow(a, -1, self.p)

    def of_scalar(self, a: int) -> int:
        assert 0 <= a < self.p, "of_scalar must be less than m"
        return a

    def poly_evaluation_point(self, i: int) -> int:
        # Reference: points are 0, 1, ..., 5 (fp_generic.h:114-115)
        assert i < self.kNPolyEvaluationPoints
        return i % self.p

    def newton_denominator(self, k: int, i: int) -> int:
        # (X[k] - X[k-i])^{-1} = 1/i for integer evaluation points
        return pow(i, -1, self.p)

    def to_bytes(self, x: int) -> bytes:
        return int(x).to_bytes(self.kBytes, "little")

    def of_bytes(self, b: bytes) -> Optional[int]:
        assert len(b) == self.kBytes
        v = int.from_bytes(b, "little")
        return v if v < self.p else None

    def of_bytes_subfield(self, b: bytes) -> Optional[int]:
        return self.of_bytes(b)

    def to_bytes_subfield(self, x: int) -> bytes:
        return self.to_bytes(x)

    def sample(self, fill_bytes) -> int:
        """Rejection sampling exactly as the reference (fp_generic.h:360)."""
        total_l = (self.exact_bits + 7) // 8
        mask = (1 << self.exact_bits) - 1
        while True:
            buf = fill_bytes(total_l)
            v = int.from_bytes(buf, "little") & mask
            if v < self.p:
                return v

    sample_subfield = sample

    def in_subfield(self, e: int) -> bool:
        return True

    # ------------------------------------------------------------------
    # host <-> device conversion
    # ------------------------------------------------------------------

    def to_mont_int(self, x: int) -> int:
        return (x * self.R) % self.p

    def from_mont_int(self, x: int) -> int:
        return (x * self.Rinv) % self.p

    def to_limbs(self, xs: Union[int, Sequence[int], np.ndarray]) -> np.ndarray:
        """ints (natural form) -> uint32[L] or [L, n] Montgomery limbs.

        Bulk path via bytes + frombuffer (fast for large witnesses)."""
        if isinstance(xs, (int, np.integer)):
            return _int_to_limbs16(self.to_mont_int(int(xs)), self.L)
        R, p, nb = self.R, self.p, 2 * self.L
        buf = b"".join(
            ((int(x) * R) % p).to_bytes(nb, "little") for x in xs
        )
        arr = np.frombuffer(buf, dtype="<u2").reshape(len(xs), self.L)
        return np.ascontiguousarray(arr.T).astype(np.uint32)

    def from_limbs(self, arr) -> Union[int, np.ndarray]:
        """uint32[L, ...] Montgomery limbs -> natural-form ints."""
        a = np.asarray(arr)
        assert a.shape[0] == self.L
        flat = a.reshape(self.L, -1).T.astype("<u2")  # [n, L]
        raw = flat.tobytes()
        nb = 2 * self.L
        Rinv, p = self.Rinv, self.p
        vals = [
            (int.from_bytes(raw[j * nb : (j + 1) * nb], "little") * Rinv) % p
            for j in range(flat.shape[0])
        ]
        if a.ndim == 1:
            return vals[0]
        return np.array(vals, dtype=object).reshape(a.shape[1:])

    # -- natural-form device serialization (for hashing/serialization) --

    def from_mont_device(self, a: Array) -> Array:
        """Montgomery limbs -> natural-value limbs, on device."""
        nat_one = np.zeros(self.L, dtype=np.uint32)
        nat_one[0] = 1
        one = jnp.asarray(nat_one).reshape((self.L,) + (1,) * (a.ndim - 1))
        return self.mul(a, jnp.broadcast_to(one, a.shape))

    def natural_limbs_to_bytes_np(self, arr) -> np.ndarray:
        """np uint32[L, ...] natural limbs -> uint8[..., kBytes] LE bytes."""
        a = np.asarray(arr)
        moved = np.moveaxis(a, 0, -1).astype("<u2")  # [..., L]
        raw = np.frombuffer(moved.tobytes(), dtype=np.uint8)
        out = raw.reshape(moved.shape[:-1] + (2 * self.L,))
        return out[..., : self.kBytes]

    def natural_limbs_to_bytes_dev(self, arr: Array) -> Array:
        """Device twin of natural_limbs_to_bytes_np:
        uint32[L, ...] natural limbs -> uint8[..., kBytes] LE bytes."""
        moved = jnp.moveaxis(arr, 0, -1)  # [..., L] 16-bit limbs
        lo = (moved & jnp.uint32(0xFF)).astype(jnp.uint8)
        hi = ((moved >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.uint8)
        out = jnp.stack([lo, hi], axis=-1).reshape(
            moved.shape[:-1] + (2 * self.L,))
        return out[..., : self.kBytes]

    # ------------------------------------------------------------------
    # device ops (uint32[L, ...] Montgomery form)
    # ------------------------------------------------------------------

    def _unstack(self, a: Array) -> Limbs:
        return [a[i] for i in range(self.L)]

    def _stack(self, limbs: Limbs) -> Array:
        return jnp.stack(limbs, axis=0)

    def zeros(self, shape=()) -> Array:
        return jnp.zeros((self.L,) + tuple(shape), dtype=jnp.uint32)

    def broadcast_const(self, x: int, shape=()) -> Array:
        """Natural-form int -> broadcast Montgomery device constant."""
        c = self.to_limbs(x)  # [L]
        return jnp.broadcast_to(
            jnp.asarray(c).reshape((self.L,) + (1,) * len(shape)),
            (self.L,) + tuple(shape),
        )

    def _cond_sub_p(self, t: Limbs, top: Array) -> Limbs:
        """value = top*2^(16L) + t (< 2p) -> canonical value < p."""
        p = self.p_np
        borrow = jnp.zeros_like(t[0])
        d = []
        for i in range(self.L):
            di = t[i] - np.uint32(p[i]) - borrow
            borrow = di >> np.uint32(31)
            d.append(di & MASK16)
        ge = (top != 0) | (borrow == 0)
        return [jnp.where(ge, d[i], t[i]) for i in range(self.L)]

    def add(self, a: Array, b: Array) -> Array:
        al, bl = self._unstack(a), self._unstack(b)
        carry = jnp.zeros_like(al[0])
        s = []
        for i in range(self.L):
            si = al[i] + bl[i] + carry
            carry = si >> np.uint32(16)
            s.append(si & MASK16)
        return self._stack(self._cond_sub_p(s, carry))

    def sub(self, a: Array, b: Array) -> Array:
        al, bl = self._unstack(a), self._unstack(b)
        borrow = jnp.zeros_like(al[0])
        d = []
        for i in range(self.L):
            di = al[i] - bl[i] - borrow
            borrow = di >> np.uint32(31)
            d.append(di & MASK16)
        # if borrow: add p
        p = self.p_np
        carry = jnp.zeros_like(borrow)
        out = []
        addp = borrow  # 0 or 1
        for i in range(self.L):
            si = d[i] + jnp.where(addp != 0, np.uint32(p[i]), np.uint32(0)) + carry
            carry = si >> np.uint32(16)
            out.append(si & MASK16)
        return self._stack(out)

    def neg(self, a: Array) -> Array:
        return self.sub(self.zeros(a.shape[1:]), a)

    def _mont_mul_limbs(self, al: Limbs, bl: Limbs) -> Limbs:
        """Core CIOS-style Montgomery product with lazy column accumulation.

        Inputs: canonical Montgomery limbs (< 2^16 each, value < p).
        Output: canonical limbs of (a*b*R^{-1}) mod p.
        """
        L = self.L
        p = self.p_np
        n0inv = self.n0inv
        zero = jnp.zeros_like(al[0])
        # lazy product columns: T[k] = sum lo/hi parts, < 2L * 2^16 < 2^22
        T = [zero] * (2 * L + 1)
        for i in range(L):
            ai = al[i]
            for j in range(L):
                pr = ai * bl[j]
                lo = pr & MASK16
                hi = pr >> np.uint32(16)
                T[i + j] = T[i + j] + lo
                T[i + j + 1] = T[i + j + 1] + hi
        # interleaved Montgomery reduction
        carry = zero
        for i in range(L):
            cur = T[i] + carry
            m = ((cur & MASK16) * n0inv) & MASK16
            for j in range(L):
                pr = m * np.uint32(p[j])
                lo = pr & MASK16
                hi = pr >> np.uint32(16)
                if j == 0:
                    cur = cur + lo
                else:
                    T[i + j] = T[i + j] + lo
                T[i + j + 1] = T[i + j + 1] + hi
            carry = cur >> np.uint32(16)
        # result = T[L..2L] + carry, canonicalize
        res = []
        c = carry
        for k in range(L, 2 * L):
            cur = T[k] + c
            res.append(cur & MASK16)
            c = cur >> np.uint32(16)
        top = T[2 * L] + c
        return self._cond_sub_p(res, top)

    def _mont_mul_compact(self, a: Array, b: Array) -> Array:
        """Graph-compact Montgomery multiply (~100 HLO ops).

        Same math as _mont_mul_limbs but expressed as whole-array ops and
        a lax.scan over the L reduction steps, so the traced graph stays
        small regardless of L.  Used where XLA compile time of the fully
        unrolled form is prohibitive (CPU tests; very large compositions).
        The unrolled form fuses better and is preferred inside TPU
        hot loops.
        """
        L = self.L
        shp = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

        def bc(x):
            tail = x.shape[1:]
            x = x.reshape((L,) + (1,) * (len(shp) - len(tail)) + tail)
            return jnp.broadcast_to(x, (L,) + shp)

        a = bc(a)
        b = bc(b)
        # outer product columns
        P = a[:, None] * b[None, :]  # [L, L, ...]
        PL = P & MASK16
        PH = P >> np.uint32(16)
        nb = len(shp)
        # T[k] = sum_{i+j=k} PL[i,j] + sum_{i+j=k-1} PH[i,j]; k in [0, 2L]
        T = jnp.zeros((2 * L + 1,) + shp, dtype=jnp.uint32)
        for i in range(L):
            row = jnp.concatenate(
                [PL[i], jnp.zeros((1,) + shp, jnp.uint32)], axis=0
            ) + jnp.concatenate(
                [jnp.zeros((1,) + shp, jnp.uint32), PH[i]], axis=0
            )  # [L+1, ...]
            pad = [(i, L - i)] + [(0, 0)] * nb
            T = T + jnp.pad(row, pad)
        # Montgomery reduction: scan over limb index
        p_col = jnp.asarray(self.p_np).reshape((L,) + (1,) * nb)
        n0inv = self.n0inv

        def red_step(carry, i):
            T, c = carry
            cur = jax.lax.dynamic_slice_in_dim(T, i, 1, axis=0)[0] + c
            m = ((cur & MASK16) * n0inv) & MASK16
            mp = m[None] * p_col  # [L, ...]
            lo = mp & MASK16
            hi = mp >> np.uint32(16)
            add_vec = jnp.concatenate(
                [lo, jnp.zeros((1,) + shp, jnp.uint32)], axis=0
            ) + jnp.concatenate(
                [jnp.zeros((1,) + shp, jnp.uint32), hi], axis=0
            )  # [L+1, ...]
            window = jax.lax.dynamic_slice_in_dim(T, i, L + 1, axis=0) + add_vec
            T = jax.lax.dynamic_update_slice_in_dim(T, window, i, axis=0)
            c = (cur + lo[0]) >> np.uint32(16)
            return (T, c), None

        # derive the zero carry from the data so its sharding "varying"
        # type matches the loop-carried value under shard_map
        zero_c = T[0] ^ T[0]
        (T, carry), _ = jax.lax.scan(red_step, (T, zero_c), jnp.arange(L))

        # final carry propagation over T[L..2L]
        def carry_step(c, t):
            cur = t + c
            return cur >> np.uint32(16), cur & MASK16

        top_in = T[L : 2 * L]
        c_fin, res = jax.lax.scan(carry_step, carry, top_in)
        top = T[2 * L] + c_fin
        return self._stack(self._cond_sub_p([res[i] for i in range(L)], top))

    def _mont_mul_semi(self, a: Array, b: Array) -> Array:
        """Semi-unrolled Montgomery multiply: vectorized column product +
        an L-step Python reduction loop of whole-array ops.

        No inner lax.scan (unlike _mont_mul_compact) and no per-limb-pair
        unrolling (unlike _mont_mul_limbs): ~15*L flat HLO ops.  This is
        the preferred form under jit — tracing cost is what dominates the
        build time of the big fused prover programs, and scan tracing is
        ~10x slower per call site."""
        L = self.L
        shp = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

        def bc(x):
            tail = x.shape[1:]
            x = x.reshape((L,) + (1,) * (len(shp) - len(tail)) + tail)
            return jnp.broadcast_to(x, (L,) + shp)

        a = bc(a)
        b = bc(b)
        P = a[:, None] * b[None, :]  # [L, L, ...]
        PL = P & MASK16
        PH = P >> np.uint32(16)
        nb = len(shp)
        zrow = jnp.zeros((1,) + shp, jnp.uint32)
        T = jnp.zeros((2 * L + 1,) + shp, dtype=jnp.uint32)
        for i in range(L):
            row = jnp.concatenate([PL[i], zrow], axis=0) + \
                jnp.concatenate([zrow, PH[i]], axis=0)  # [L+1, ...]
            T = T.at[i : i + L + 1].add(row)
        p_col = jnp.asarray(self.p_np).reshape((L,) + (1,) * nb)
        n0inv = self.n0inv
        c = jnp.zeros(shp, jnp.uint32)
        for i in range(L):
            cur = T[i] + c
            m = ((cur & MASK16) * n0inv) & MASK16
            mp = m[None] * p_col  # [L, ...]
            lo = mp & MASK16
            hi = mp >> np.uint32(16)
            add_vec = jnp.concatenate([lo, zrow], axis=0) + \
                jnp.concatenate([zrow, hi], axis=0)
            T = T.at[i : i + L + 1].add(add_vec)
            c = (cur + lo[0]) >> np.uint32(16)
        res = []
        for k in range(L, 2 * L):
            cur = T[k] + c
            res.append(cur & MASK16)
            c = cur >> np.uint32(16)
        top = T[2 * L] + c
        return self._stack(self._cond_sub_p(res, top))

    def mul(self, a: Array, b: Array) -> Array:
        from .. import config

        mode = config.mul_mode(self.L)
        if mode == "unrolled":
            al, bl = self._unstack(a), self._unstack(b)
            shp = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
            al = [jnp.broadcast_to(x, shp) for x in al]
            bl = [jnp.broadcast_to(x, shp) for x in bl]
            return self._stack(self._mont_mul_limbs(al, bl))
        if mode == "semi":
            return self._mont_mul_semi(a, b)
        return self._mont_mul_compact(a, b)

    def sqr(self, a: Array) -> Array:
        return self.mul(a, a)

    def mul_const(self, a: Array, c: int) -> Array:
        """Multiply by a natural-form host constant."""
        cl = self.to_limbs(c)
        cb = [jnp.full(a.shape[1:], np.uint32(cl[i])) for i in range(self.L)]
        return self._stack(self._mont_mul_limbs(self._unstack(a), cb))

    def inv(self, a: Array) -> Array:
        """Batch inversion by exponentiation a^(p-2) (constant-time).

        Left-to-right square-and-multiply expressed as a lax.scan over the
        (static) exponent bits, so the compiled graph contains one square
        and one multiply regardless of field size.
        """
        e = self.p - 2
        nb = e.bit_length()
        bits = jnp.asarray(
            np.array([(e >> (nb - 1 - i)) & 1 for i in range(nb)], dtype=np.uint32)
        )
        one = self.broadcast_const(1, a.shape[1:])

        def step(result, bit):
            r2 = self.sqr(result)
            r3 = self.mul(r2, a)
            return jnp.where(bit != 0, r3, r2), None

        result, _ = jax.lax.scan(step, one, bits)
        return result

    def batch_inverse(self, a: Array) -> Array:
        """Batch inversion.

        The reference uses the sequential Montgomery trick
        (AlgebraUtil::batch_inverse_arithmetic, lib/algebra/utility.h:24);
        on TPU the parallel exponentiation `inv` is both graph-compact and
        lane-parallel, so it wins for every batch size we care about.
        (A log-depth prefix-product version via associative_scan was
        measured to explode XLA compile time at L>=8.)
        """
        return self.inv(a)

    def eq(self, a: Array, b: Array) -> Array:
        """Elementwise equality -> bool[...]."""
        return jnp.all(a == b, axis=0)

    def is_zero(self, a: Array) -> Array:
        return jnp.all(a == 0, axis=0)

    def select(self, cond: Array, a: Array, b: Array) -> Array:
        """cond ? a : b, cond is bool[batch...]."""
        return jnp.where(cond[None, ...], a, b)

    # ------------------------------------------------------------------
    # lazy-accumulation reductions (the TPU analogue of the reference
    # Accum dot-product trick, fp_generic.h:424-458): split limbs into
    # bytes so uint32 column sums cannot overflow for <= 2^24 addends,
    # sum with ordinary integer adds, then renormalize once.
    # ------------------------------------------------------------------

    def _renormalize(self, cols: Array) -> Array:
        """uint32[2L, ...] byte-columns (value = sum cols[k] 256^k) -> canonical."""
        L = self.L
        # carry-propagate at byte granularity (column values < 2^32,
        # carries < 2^24 -> no uint32 overflow), then pair into 16-bit limbs
        bytes_out = []
        carry = jnp.zeros_like(cols[0])
        for k in range(2 * L):
            cur = cols[k] + carry
            bytes_out.append(cur & np.uint32(0xFF))
            carry = cur >> np.uint32(8)
        limbs = [bytes_out[2 * i] | (bytes_out[2 * i + 1] << np.uint32(8))
                 for i in range(L)]
        # residual carry < 2^32: value = low + carry * 2^(16L)
        low = self._stack(self._cond_sub_p(limbs, jnp.zeros_like(carry)))
        # carry as a (canonical, Montgomery-form-agnostic) field element:
        # carry < 2^32 so its limbs are [c&0xffff, c>>16, 0, ...]; it is a
        # plain integer multiplier of 2^(16L), and both addends are in
        # Montgomery form already (linearity).
        c_limbs = [carry & MASK16, carry >> np.uint32(16)] + \
            [jnp.zeros_like(carry)] * (L - 2)
        c_elt = self._stack(c_limbs)
        # multiply by constant 2^(16L) mod p: as a Montgomery-domain
        # correction we need (carry * 2^(16L)) mod p in the same domain as
        # the inputs; since everything is linear, treat carry as limbs in
        # the same domain and multiply by the natural constant 2^(16L).
        shift_const = pow(2, 16 * self.L, self.p)
        return self.add(low, self.mul_const(c_elt, shift_const))

    def _byte_split(self, a: Array) -> Array:
        """uint32[L, ...] 16-bit limbs -> uint32[2L, ...] bytes."""
        parts = []
        for i in range(self.L):
            parts.append(a[i] & np.uint32(0xFF))
            parts.append(a[i] >> np.uint32(8))
        return jnp.stack(parts, axis=0)

    def lazy_sum(self, a: Array, axis: int) -> Array:
        """Field sum along `axis` (axis counted excluding the limb axis 0)."""
        b = self._byte_split(a)
        s = jnp.sum(b, axis=axis + 1)
        return self._renormalize(s)

    def lazy_segment_sum(self, a: Array, seg_ids, num_segments: int) -> Array:
        """Field segment-sum over axis 1 (terms): [L, T, ...] -> [L, S, ...].

        seg_ids: int array [T].  Bound: <= 2^24 addends per segment.
        """
        b = self._byte_split(a)  # [2L, T, ...]
        moved = jnp.moveaxis(b, 1, 0)  # [T, 2L, ...]
        summed = jax.ops.segment_sum(moved, jnp.asarray(seg_ids),
                                     num_segments=num_segments)
        s = jnp.moveaxis(summed, 0, 1)  # [2L, S, ...]
        return self._renormalize(s)
