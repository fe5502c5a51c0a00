"""Circuit components: polynomial evaluation, bit plucking, bit adders.

Semantic twins of reference lib/circuits/logic/{polynomial.h,
bit_plucker.h, bit_plucker_encoder.h, bit_plucker_constants.h,
bit_adder.h} and lib/algebra/interpolation.h (monomial_of_lagrange).
"""

from __future__ import annotations

from typing import List, Sequence

from .logic import BitW, Logic


# ---------------------------------------------------------------------------
# host polynomial interpolation (lib/algebra/interpolation.h)
# ---------------------------------------------------------------------------

def monomial_of_lagrange(F, Y: Sequence, X: Sequence) -> List:
    """Monomial coefficients of the polynomial with values Y at points X."""
    n = len(X)
    # Newton: divided differences
    coef = list(Y)
    for j in range(1, n):
        for i in range(n - 1, j - 1, -1):
            num = F.sub_i(coef[i], coef[i - 1])
            den = F.sub_i(X[i], X[i - j])
            coef[i] = F.mul_i(num, F.inv_i(den))
    # expand Newton form to monomial basis
    poly = [F.of_scalar(0)] * n
    poly[0] = coef[n - 1]
    deg = 0
    for j in range(n - 2, -1, -1):
        # poly = poly * (x - X[j]) + coef[j]
        new = [F.of_scalar(0)] * n
        for i in range(deg + 1):
            new[i + 1] = F.add_i(new[i + 1], poly[i])
            new[i] = F.sub_i(new[i], F.mul_i(poly[i], X[j]))
        new[0] = F.add_i(new[0], coef[j])
        poly = new
        deg += 1
    return poly


# ---------------------------------------------------------------------------
# in-circuit polynomial evaluation (lib/circuits/logic/polynomial.h)
# ---------------------------------------------------------------------------

class Polynomial:
    def __init__(self, l: Logic):
        self.l = l

    def powers_of_x(self, n: int, x):
        L = self.l
        xi = [None] * n
        if n > 0:
            xi[0] = L.konst(1)
            if n > 1:
                xi[1] = x
                for k in range(2, n):
                    xi[k] = L.mul(xi[k - k // 2], xi[k // 2])
        return xi

    def eval(self, coefs: Sequence, x):
        """Powers-of-x dot product (polynomial.h:52-67); coefs are host
        field scalars."""
        L = self.l
        xi = self.powers_of_x(len(coefs), x)
        r = L.konst(0)
        for i, c in enumerate(coefs):
            r = L.add(r, L.bk.ax(c, xi[i]))
        return r


# ---------------------------------------------------------------------------
# bit plucker (bit_plucker.h / _constants.h / _encoder.h)
# ---------------------------------------------------------------------------

def bit_plucker_point(F, n: int, bits: int):
    """F.of_scalar(2*bits) - F.of_scalar(n-1) (bit_plucker_constants.h)."""
    if F.kCharacteristicTwo:
        return F.sub_i(F.of_scalar(2 * bits), F.of_scalar(n - 1))
    return F.sub_i(F.of_scalar((2 * bits) % F.char),
                   F.of_scalar((n - 1) % F.char))


class BitPlucker:
    """Decode packed logn-bit inputs into bits via degree-2^logn
    interpolation (bit_plucker.h:103-178)."""

    def __init__(self, l: Logic, logn: int):
        self.l = l
        self.logn = logn
        self.kN = 1 << logn
        self.kNv32Elts = (32 + logn - 1) // logn
        F = l.F
        X = [bit_plucker_point(F, self.kN, i) for i in range(self.kN)]
        self.pluckers = []
        for k in range(logn):
            Y = [F.of_scalar((i >> k) & 1) for i in range(self.kN)]
            self.pluckers.append(monomial_of_lagrange(F, Y, X))

    def pluck(self, e) -> List[BitW]:
        L = self.l
        P = Polynomial(L)
        out = []
        for k in range(self.logn):
            v = P.eval(self.pluckers[k], e)
            L.assert_is_bit_elt(v)
            out.append(L.bitw_of(v))
        return out

    def unpack_v32(self, packed: Sequence) -> List[BitW]:
        return self.unpack(packed, 32)

    def unpack(self, packed: Sequence, nbits: int) -> List[BitW]:
        r = [None] * nbits
        for i, e in enumerate(packed):
            b = self.pluck(e)
            for j in range(self.logn):
                if self.logn * i + j < nbits:
                    r[self.logn * i + j] = b[j]
        return r


class BitPluckerEncoder:
    """Host-side packing matching BitPlucker (bit_plucker_encoder.h)."""

    def __init__(self, F, logn: int):
        self.F = F
        self.logn = logn
        self.kN = 1 << logn
        self.kNv32Elts = (32 + logn - 1) // logn

    def encode(self, i: int):
        return bit_plucker_point(self.F, self.kN, i)

    def mkpacked_v32(self, j: int) -> List:
        r = []
        for _ in range(self.kNv32Elts):
            r.append(self.encode(j & (self.kN - 1)))
            j >>= self.logn
        return r

    def pack_bits(self, bits: Sequence[int], nelts: int) -> List:
        r = []
        for i in range(nelts):
            v = 0
            for j in range(self.logn):
                if i * self.logn + j < len(bits):
                    v += (bits[i * self.logn + j] & 1) << j
            r.append(self.encode(v))
        return r


class Counter:
    """Small-integer counters embedded in the field
    (counter.h:29-190): additive group for odd characteristic,
    multiplicative group g^n for GF(2^k).  Values are EltW wires."""

    def __init__(self, l: Logic):
        self.l = l
        self.char2 = l.F.kCharacteristicTwo

    def znz_indicator(self, c):
        L = self.l
        if self.char2:
            return L.sub(c, L.konst(1))
        return c

    def as_counter(self, n):
        L, F = self.l, self.l.F
        if isinstance(n, BitW):
            if self.char2:
                return self.ite0(n, L.bk.konst(F.g))
            return L.eval(n)
        if isinstance(n, list):  # bitvec
            if self.char2:
                return L.mul_range(
                    0, len(n),
                    lambda i: L.mux_elt(n[i], L.bk.konst(F.counter_beta[i]),
                                        L.bk.konst(F.of_scalar(1))))
            return L.as_scalar(n)
        # integer
        if self.char2:
            return L.bk.konst(F.as_counter(n))
        return L.konst(n % F.char)

    def mone(self):
        L, F = self.l, self.l.F
        if self.char2:
            return L.bk.konst(F.invg)
        return L.bk.konst(F.neg_i(F.of_scalar(1)))

    def add(self, a, b):
        L = self.l
        return L.mul(a, b) if self.char2 else L.add(a, b)

    def add_range(self, i0, i1, f):
        if i1 <= i0:
            return self.as_counter(0)
        if i1 == i0 + 1:
            return f(i0)
        im = i0 + (i1 - i0) // 2
        return self.add(self.add_range(i0, im, f), self.add_range(im, i1, f))

    def ite0(self, a: BitW, b):
        """a ? b : 0 (as a counter)."""
        L = self.l
        if self.char2:
            return L.mux_elt(a, b, L.konst(1))
        return L.mul(L.eval(a), b)

    def mux(self, a: BitW, b, c):
        L = self.l
        if self.char2:
            return L.mux_elt(a, b, c)
        return self.add(c, self.ite0(a, L.sub(b, c)))

    def assert0(self, a):
        L = self.l
        if self.char2:
            L.assert_eq_elt(a, L.konst(1))
        else:
            L.assert0_elt(a)

    def assert_eq(self, a, b):
        self.l.assert_eq_elt(a, b)

    def input(self):
        return self.l.eltw_input()


class UnaryPlucker:
    """One-hot decode of an interpolation-packed value
    (unary_plucker.h:29-77): pluck point NJ decodes to all zeroes."""

    def __init__(self, l: Logic, nj: int):
        self.l = l
        self.nj = nj
        kN = nj + 1
        F = l.F
        X = [bit_plucker_point(F, kN, i) for i in range(kN)]
        self.pluckers = []
        for j in range(nj):
            Y = [F.of_scalar(1 if i == j else 0) for i in range(kN)]
            self.pluckers.append(monomial_of_lagrange(F, Y, X))

    def pluck(self, e) -> List[BitW]:
        L = self.l
        P = Polynomial(L)
        out = []
        for j in range(self.nj):
            v = P.eval(self.pluckers[j], e)
            L.assert_is_bit_elt(v)
            out.append(L.bitw_of(v))
        return out


class Memcmp:
    """Lexicographic byte-array comparison (memcmp.h:30-66); inputs are
    lists of v8 (LSB-first bit lists)."""

    def __init__(self, l: Logic):
        self.l = l

    def _arrange(self, bytes_v8) -> List[BitW]:
        bits = []
        for i in range(len(bytes_v8) - 1, -1, -1):
            bits.extend(bytes_v8[i])
        return bits

    def lt(self, A, B) -> BitW:
        _, lt = self.l.lt_reduce(self._arrange(A), self._arrange(B))
        return lt

    def leq(self, A, B) -> BitW:
        _, lt = self.l.lt_reduce(self._arrange(B), self._arrange(A))
        return self.l.lnot(lt)


class EltMuxer:
    """arr[ind] for wire ind, interpolated over the even points
    {2i - (PP-1)} (bit_plucker.h:192-244)."""

    def __init__(self, l: Logic, arr: Sequence, n: int, pp: int = None):
        self.l = l
        self.n = n
        pp = pp if pp is not None else n
        F = l.F
        self.coeff = [l.konst(0) for _ in range(n)]
        for i in range(n):
            X = [bit_plucker_point(F, pp, k) for k in range(n)]
            Y = [F.of_scalar(1 if k == i else 0) for k in range(n)]
            basis_i = monomial_of_lagrange(F, Y, X)
            for j in range(n):
                self.coeff[j] = l.add(self.coeff[j],
                                      l.bk.ax(basis_i[j], arr[i]))

    def mux(self, ind):
        L = self.l
        P = Polynomial(L)
        xi = P.powers_of_x(self.n, ind)
        r = L.konst(0)
        for i in range(self.n):
            r = L.add(r, L.mul(self.coeff[i], xi[i]))
        return r


# ---------------------------------------------------------------------------
# bit adder (bit_adder.h)
# ---------------------------------------------------------------------------

class BitAdder:
    """Map bitvec<N> to a field element supporting cheap addition; in odd
    characteristic uses the additive group, in GF(2^k) the multiplicative
    group generated by x (bit_adder.h:33-137)."""

    def __init__(self, l: Logic, n: int):
        self.l = l
        self.n = n
        F = l.F
        if F.kCharacteristicTwo:
            alpha = 0b10  # x
            self.alpha_2_i = []
            for _ in range(n):
                self.alpha_2_i.append(alpha)
                alpha = F.mul_i(alpha, alpha)
            self.alpha_2_n = alpha

    def as_field_element(self, v: Sequence[BitW]):
        L, F = self.l, self.l.F
        if not F.kCharacteristicTwo:
            r = L.konst(0)
            for i in range(self.n):
                r = L.bk.axpy(r, F.of_scalar((1 << i) % F.char),
                              L.eval(v[i]))
            return r
        return L.mul_range(
            0, self.n,
            lambda i: L.mux_elt(v[i], L.bk.konst(self.alpha_2_i[i]),
                                L.bk.konst(F.of_scalar(1))))

    def add2(self, a, b):
        L, F = self.l, self.l.F
        if not F.kCharacteristicTwo:
            return L.add(a, b)
        return L.mul(a, b)

    def add(self, vs: Sequence):
        """Sum of bitvecs (as field elements)."""
        L, F = self.l, self.l.F
        terms = [self.as_field_element(v) if isinstance(v, (list, tuple))
                 else v for v in vs]
        if not F.kCharacteristicTwo:
            return L.add_range(0, len(terms), lambda i: terms[i])
        return L.mul_range(0, len(terms), lambda i: terms[i])

    def assert_eqmod(self, a: Sequence[BitW], b, k: int):
        """assert b == a + i*2^N (or the multiplicative analogue) for some
        0 <= i < k (bit_adder.h:69-76, 118-129)."""
        L, F = self.l, self.l.F
        if not F.kCharacteristicTwo:
            z = L.sub(b, self.as_field_element(a))
            zz = L.mul_range(
                0, k,
                lambda i: L.sub(z, L.bk.konst(
                    F.of_scalar(((1 << self.n) * i) % F.char))))
            L.assert0_elt(zz)
        else:
            p = [F.of_scalar(1)]
            for i in range(1, k):
                p.append(F.mul_i(self.alpha_2_n, p[-1]))
            aa = self.as_field_element(a)
            prod = L.mul_range(
                0, k, lambda i: L.sub(b, L.bk.ax(p[i], aa)))
            L.assert0_elt(prod)