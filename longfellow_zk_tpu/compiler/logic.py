"""Arithmetization DSL: boolean logic over field wires.

Semantic twin of reference lib/circuits/logic/logic.h:37-1234 plus the
compiler and evaluation backends (compiler_backend.h, evaluation_backend.h):
bits as affine wires BitW(c0, c1, x) with value c0 + c1*x in the standard
basis ({0,1}); lxor costs one multiply via the {-1,1} basis in odd
characteristic and is free-form addition in GF(2^k); carry-save/ripple/
Sklansky adders; comparisons; bit-packing.  Identical gate structure =>
identical compiled circuits and circuit ids.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Sequence

from .quad_circuit import QuadCircuit


class CompilerBackend:
    """Maps DSL ops onto QuadCircuit nodes (compiler_backend.h:26-59).
    V = node index (int)."""

    def __init__(self, qc: QuadCircuit):
        self.qc = qc
        self.F = qc.F

    def assert0(self, a):
        return self.qc.assert0(a)

    def add(self, a, b):
        return self.qc.add(a, b)

    def sub(self, a, b):
        mb = self.mul_k(self.F.neg_i(self.F.of_scalar(1)), b)
        return self.add(a, mb)

    def mul(self, a, b):
        return self.qc.mul2(a, b)

    def mul_k(self, k, b):
        return self.qc.mul1(k, b)

    def mul_kab(self, k, a, b):
        return self.qc.mul3(k, a, b)

    def konst(self, a):
        return self.qc.konst(a)

    def ax(self, a, x):
        return self.qc.mul1(a, x)

    def axy(self, a, x, y):
        return self.qc.mul3(a, x, y)

    def axpy(self, y, a, x):
        return self.qc.axpy(y, a, x)

    def apy(self, y, a):
        return self.qc.apy(y, a)

    def input_wire(self):
        return self.qc.input_wire()

    def output_wire(self, n, wire_id):
        self.qc.output_wire(n, wire_id)


class EvaluationBackend:
    """Evaluates DSL ops directly on field scalars
    (evaluation_backend.h:22-91).  V = host field scalar.

    `feed(values)` queues wire values so circuits written against
    input_wire()/vinput() run unmodified under evaluation — the
    wire-free witness-satisfaction check used by circuit tests."""

    def __init__(self, F, panic_on_assertion_failure: bool = True):
        self.F = F
        self.panic = panic_on_assertion_failure
        self.assertion_failed = False
        self._inputs = []
        self._next = 0

    def feed(self, values) -> None:
        self._inputs.extend(values)

    def input_wire(self):
        v = self._inputs[self._next]
        self._next += 1
        return v

    def take_assertion_failed(self) -> bool:
        b = self.assertion_failed
        self.assertion_failed = False
        return b

    def assert0(self, a):
        if a != self.F.of_scalar(0):
            if self.panic:
                raise AssertionError("assert0 failed")
            self.assertion_failed = True
        return a

    def add(self, a, b):
        return self.F.add_i(a, b)

    def sub(self, a, b):
        return self.F.sub_i(a, b)

    def mul(self, a, b):
        return self.F.mul_i(a, b)

    mul_k = mul

    def mul_kab(self, k, a, b):
        return self.F.mul_i(k, self.F.mul_i(a, b))

    def konst(self, a):
        return a

    ax = mul

    axy = mul_kab

    def axpy(self, y, a, x):
        return self.F.add_i(y, self.F.mul_i(a, x))

    def apy(self, y, a):
        return self.F.add_i(y, a)


@dataclass
class BitW:
    """Bit wire: value = c0 + c1*x in the standard basis (logic.h:132)."""

    c0: object
    c1: object
    x: object


class Logic:
    def __init__(self, bk, F):
        self.bk = bk
        self.F = F
        self._zero = F.of_scalar(0)
        self._one = F.of_scalar(1)
        self._mone = F.neg_i(self._one)

    # -- field / backend re-exports -----------------------------------------

    def elt(self, a: int):
        return self.F.of_scalar(a)

    def konst(self, a):
        if isinstance(a, int):
            a = self.elt(a)
        return self.bk.konst(a)

    def add(self, a, b):
        return self.bk.add(a, b)

    def sub(self, a, b):
        return self.bk.sub(a, b)

    def mul(self, a, b):
        return self.bk.mul(a, b)

    def assert0_elt(self, a):
        return self.bk.assert0(a)

    # -- bit construction ---------------------------------------------------

    def bit(self, b: int) -> BitW:
        return BitW(self._zero if b == 0 else self._one, self._zero,
                    self.konst(self._one))

    def bits(self, n: int, x: int) -> List[BitW]:
        return [self.bit((x >> i) & 1) for i in range(n)]

    vbit = bits

    def bitw_of(self, eltw) -> BitW:
        """Standard-basis bit from a wire."""
        return BitW(self._zero, self._one, eltw)

    def rebase(self, d0, d1, v: BitW) -> BitW:
        F = self.F
        return BitW(F.add_i(d0, F.mul_i(d1, v.c0)), F.mul_i(d1, v.c1), v.x)

    def eval(self, v: BitW):
        r = self.bk.ax(v.c1, v.x)
        if v.c0 != self._zero:
            r = self.bk.add(self.bk.konst(v.c0), r)
        return r

    def as_scalar(self, v: Sequence[BitW]):
        """Pack bits via the beta basis (logic.h:209-222)."""
        assert len(v) <= 64
        r = self.konst(self._zero)
        for i, b in enumerate(v):
            r = self.bk.axpy(r, self._beta(i), self.eval(b))
        return r

    def _beta(self, i: int):
        F = self.F
        if F.kCharacteristicTwo:
            return F.beta[i]
        return F.of_scalar((1 << i) % F.char)

    # -- assertions ---------------------------------------------------------

    def assert0(self, v: BitW):
        return self.bk.assert0(self.eval(v))

    def assert1(self, v: BitW):
        return self.assert0(self.lnot(v))

    def assert_eq_elt(self, a, b):
        return self.bk.assert0(self.bk.sub(a, b))

    def assert_eq(self, a: BitW, b: BitW):
        return self.assert0(self.lxor(a, b))

    def assert_implies(self, a: BitW, b: BitW):
        return self.assert1(self.limplies(a, b))

    def assert_is_bit_elt(self, v):
        vvmv = self.bk.sub(v, self.bk.mul(v, v))
        return self.bk.assert0(vvmv)

    def assert_is_bit(self, b: BitW):
        return self.assert_is_bit_elt(self.eval(b))

    # -- gates --------------------------------------------------------------

    def lnot(self, x: BitW) -> BitW:
        return self.rebase(self._one, self._mone, x)

    def land(self, a: BitW, b: BitW) -> BitW:
        return self._mulv(a, b)

    def lmul(self, a: BitW, b) -> BitW:
        """bit * field wire (logic.h:283-287)."""
        return self.eval(self._mulv(a, self.bitw_of(b)))

    def lxor(self, a: BitW, b: BitW) -> BitW:
        F = self.F
        if F.kCharacteristicTwo:
            return self._addv(a, b)
        mtwo = F.neg_i(F.of_scalar(2))
        half = F.inv_i(F.of_scalar(2))
        mhalf = F.neg_i(half)
        a1 = self.rebase(self._one, mtwo, a)
        b1 = self.rebase(self._one, mtwo, b)
        p = self._mulv(a1, b1)
        return self.rebase(half, mhalf, p)

    def lor(self, a: BitW, b: BitW) -> BitW:
        return self.lnot(self.land(self.lnot(a), self.lnot(b)))

    def limplies(self, a: BitW, b: BitW) -> BitW:
        return self.lor(self.lnot(a), b)

    def lor_exclusive(self, a: BitW, b: BitW) -> BitW:
        return self._addv(a, b)

    def lxor3(self, a, b, c) -> BitW:
        return self.lxor(self.lxor(a, b), c)

    def lCh(self, x, y, z) -> BitW:
        return self.lor_exclusive(self.land(x, y), self.land(self.lnot(x), z))

    def lMaj(self, x, y, z) -> BitW:
        return self.lor_exclusive(self.land(x, y),
                                  self.land(self.lxor(x, y), z))

    def mux(self, control: BitW, iftrue: BitW, iffalse: BitW) -> BitW:
        return self.lor_exclusive(self.land(control, iftrue),
                                  self.land(self.lnot(control), iffalse))

    def mux_elt(self, control: BitW, iftrue, iffalse):
        return self.bk.add(self.lmul(control, iftrue),
                           self.lmul(self.lnot(control), iffalse))

    # -- reductions ---------------------------------------------------------

    def _reduce(self, i0: int, i1: int, f: Callable, empty, combine):
        if i1 <= i0:
            return empty()
        if i1 == i0 + 1:
            return f(i0)
        im = i0 + (i1 - i0) // 2
        return combine(self._reduce(i0, im, f, empty, combine),
                       self._reduce(im, i1, f, empty, combine))

    def add_range(self, i0, i1, f):
        return self._reduce(i0, i1, f, lambda: self.konst(0), self.add)

    def land_range(self, i0, i1, f):
        return self._reduce(i0, i1, f, lambda: self.bit(1), self.land)

    def lor_range(self, i0, i1, f):
        return self._reduce(i0, i1, f, lambda: self.bit(0), self.lor)

    def lor_exclusive_range(self, i0, i1, f):
        return self._reduce(i0, i1, f, lambda: self.bit(0),
                            self.lor_exclusive)

    def mul_range(self, i0, i1, f):
        return self._reduce(i0, i1, f, lambda: self.konst(1), self.mul)

    def parity(self, a: Sequence[BitW]) -> BitW:
        return self._reduce(0, len(a), lambda i: a[i], lambda: self.bit(0),
                            self.lxor)

    def eq0(self, a: Sequence[BitW]) -> BitW:
        return self._reduce(0, len(a), lambda i: self.lnot(a[i]),
                            lambda: self.bit(1), self.land)

    # -- adders -------------------------------------------------------------

    def _gp_reduce(self, g0, p0, g1, p1):
        g1n = self.lor_exclusive(g1, self.land(g0, p1))
        p1n = self.land(p0, p1)
        return g1n, p1n

    def _ripple_scan(self, g, p, i0, i1):
        for i in range(i0 + 1, i1):
            g[i], p[i] = self._gp_reduce(g[i - 1], p[i - 1], g[i], p[i])

    def _sklansky_scan(self, g, p, i0, i1):
        if i1 - i0 > 1:
            im = i0 + (i1 - i0) // 2
            self._sklansky_scan(g, p, i0, im)
            self._sklansky_scan(g, p, im, i1)
            for i in range(im, i1):
                g[i], p[i] = self._gp_reduce(g[im - 1], p[im - 1], g[i], p[i])

    def _gp_add(self, a, b, scan):
        w = len(a)
        if w == 0:
            return self.bit(0), []
        g = [self.land(a[i], b[i]) for i in range(w)]
        p = [self.lxor(a[i], b[i]) for i in range(w)]
        c = list(p)
        scan(g, p, 0, w)
        for i in range(1, w):
            c[i] = self.lxor(c[i], g[i - 1])
        return g[w - 1], c

    def ripple_carry_add(self, a, b):
        """returns (carry, sum bits)."""
        return self._gp_add(a, b, self._ripple_scan)

    def parallel_prefix_add(self, a, b):
        return self._gp_add(a, b, self._sklansky_scan)

    def _gp_sub(self, a, b, scan):
        t = [self.lnot(x) for x in a]
        carry, c = self._gp_add(t, b, scan)
        return carry, [self.lnot(x) for x in c]

    def ripple_carry_sub(self, a, b):
        return self._gp_sub(a, b, self._ripple_scan)

    def parallel_prefix_sub(self, a, b):
        return self._gp_sub(a, b, self._sklansky_scan)

    def assert_sum(self, c, a, b):
        """assert a + b == c in constant depth (logic.h:401-426)."""
        w = len(a)
        g = [self.land(a[i], b[i]) for i in range(w)]
        p = [self.lxor(a[i], b[i]) for i in range(w)]
        cy = [None] * w
        self.assert_eq(c[0], p[0])
        for i in range(1, w):
            cy[i - 1] = self.lxor(c[i], p[i])
        self.assert_eq(cy[0], g[0])
        for i in range(1, w - 1):
            self.assert_eq(cy[i],
                           self.lor_exclusive(g[i], self.land(cy[i - 1],
                                                              p[i])))

    def lt_reduce(self, a, b):
        """(eq, lt) comparison bits, a < b unsigned (logic.h:1181-1194)."""

        def rec(i0, i1):
            if i1 - i0 > 1:
                im = i0 + (i1 - i0) // 2
                eq0, lt0 = rec(i0, im)
                eq1, lt1 = rec(im, i1)
                return (self.land(eq1, eq0),
                        self.lor_exclusive(lt1, self.land(eq1, lt0)))
            return (self.lnot(self.lxor(a[i0], b[i0])),
                    self.land(self.lnot(a[i0]), b[i0]))

        return rec(0, len(a))

    def eq_reduce(self, a, b) -> BitW:
        return self._reduce(
            0, len(a), lambda i: self.lnot(self.lxor(a[i], b[i])),
            lambda: self.bit(1), self.land)

    # -- vector ops ---------------------------------------------------------

    def vxor(self, a, b):
        return [self.lxor(x, y) for x, y in zip(a, b)]

    def vand(self, a, b):
        return [self.land(x, y) for x, y in zip(a, b)]

    def vor(self, a, b):
        return [self.lor(x, y) for x, y in zip(a, b)]

    def vnot(self, a):
        return [self.lnot(x) for x in a]

    def vadd(self, a, b):
        _, c = self.ripple_carry_add(a, b)
        return c

    def vmux(self, sel: BitW, v1, v0):
        return [self.mux(sel, x, y) for x, y in zip(v1, v0)]

    def vshr(self, a, n: int):
        """logical shift right: out[i] = a[i+n] (zero fill)."""
        w = len(a)
        return [a[i + n] if i + n < w else self.bit(0) for i in range(w)]

    def vrotr(self, a, n: int):
        w = len(a)
        return [a[(i + n) % w] for i in range(w)]

    def vrotl(self, a, n: int):
        return self.vrotr(a, (len(a) - n) % len(a))

    def vappend(self, a, b):
        """concatenate, a = LSB part (logic.h vappend)."""
        return list(a) + list(b)

    def vCh(self, x, y, z):
        return [self.lCh(a, b, c) for a, b, c in zip(x, y, z)]

    def vMaj(self, x, y, z):
        return [self.lMaj(a, b, c) for a, b, c in zip(x, y, z)]

    def vxor3(self, x, y, z):
        return [self.lxor3(a, b, c) for a, b, c in zip(x, y, z)]

    def slice_bits(self, a, i: int, j: int):
        """bits [i, j) of a bitvec (logic.h slice<i,j>)."""
        return list(a[i:j])

    def veqmask(self, a, mask: int, val: int) -> BitW:
        """a & mask == val over the selected bits (logic.h veqmask)."""
        terms = [self.lnot(a[i]) if ((val >> i) & 1) == 0 else a[i]
                 for i in range(len(a)) if (mask >> i) & 1]
        return self._reduce(0, len(terms), lambda i: terms[i],
                            lambda: self.bit(1), self.land)

    def veq(self, a, b):
        if isinstance(b, int):
            b = self.bits(len(a), b)
        return self.eq_reduce(a, b)

    def vlt(self, a, b):
        if isinstance(b, int):
            b = self.bits(len(a), b)
        _, lt = self.lt_reduce(a, b)
        return lt

    def vleq(self, a, b):
        """a <= b == not (b < a)."""
        if isinstance(b, int):
            b = self.bits(len(a), b)
        _, lt = self.lt_reduce(b, a)
        return self.lnot(lt)

    def vassert_eq(self, a, b):
        if isinstance(b, int):
            b = self.bits(len(a), b)
        for x, y in zip(a, b):
            self.assert_eq(x, y)

    def vassert0(self, a):
        for x in a:
            self.assert0(x)

    def vassert_is_bit(self, a):
        for x in a:
            self.assert_is_bit(x)

    # -- GF(2^128) arithmetic simulated in-circuit --------------------------

    def gf2_polynomial_multiplier(self, a, b):
        """c(x) = a(x)*b(x) over GF(2), schoolbook (logic.h:471-483)."""
        w = len(a)
        c = []
        for k in range(2 * w):
            t = [self.land(a[i], b[k - i])
                 for i in range(w) if 0 <= k - i < w]
            c.append(self.parity(t))
        return c

    def gf2_polynomial_multiplier_karat(self, a, b):
        """Karatsuba recursion for w in {64, 128} (logic.h:487-522)."""
        w = len(a)
        if w < 64:
            return self.gf2_polynomial_multiplier(a, b)
        h = w // 2
        a01 = [self.lxor(a[i], a[i + h]) for i in range(h)]
        b01 = [self.lxor(b[i], b[i + h]) for i in range(h)]
        ab01 = self.gf2_polynomial_multiplier_karat(a01, b01)
        a0b0 = self.gf2_polynomial_multiplier_karat(a[:h], b[:h])
        a1b1 = self.gf2_polynomial_multiplier_karat(a[h:], b[h:])
        ab01 = [self.lxor3(ab01[i], a0b0[i], a1b1[i]) for i in range(w)]
        c = [None] * (2 * w)
        for i in range(h):
            c[i] = a0b0[i]
            c[i + h] = self.lxor(a0b0[i + h], ab01[i])
            c[i + w] = self.lxor(ab01[i + h], a1b1[i])
            c[i + 3 * h] = a1b1[i + h]
        return c

    @staticmethod
    def _gf2_128_taps():
        """taps[j] = positions i < 255 with coefficient j set in x^i mod
        (x^128 + x^7 + x^2 + x + 1).  Matches the generated table in
        logic.h:539-670 (computed, not transcribed)."""
        taps = [[] for _ in range(128)]
        r = 1
        for i in range(255):
            for j in range(128):
                if (r >> j) & 1:
                    taps[j].append(i)
            r <<= 1
            if r >> 128:
                r = (r & ((1 << 128) - 1)) ^ 0x87
        return taps

    def gf2_128_mul(self, a, b):
        """Field multiply in GF(2^128) simulated over bits
        (logic.h:524-...): polynomial product then sparse reduction."""
        conv = self.gf2_polynomial_multiplier_karat(list(a), list(b))
        taps = self._gf2_128_taps()
        out = []
        for j in range(128):
            t = [conv[i] for i in taps[j] if i < len(conv)]
            out.append(self.parity(t))
        return out

    # -- I/O ----------------------------------------------------------------

    def eltw_input(self):
        return self.bk.input_wire()

    def input(self) -> BitW:
        x = self.bitw_of(self.bk.input_wire())
        self.assert_is_bit(x)
        return x

    def vinput(self, n: int) -> List[BitW]:
        return [self.input() for _ in range(n)]

    def output(self, x, i: int):
        if isinstance(x, BitW):
            x = self.eval(x)
        self.bk.output_wire(x, i)

    def voutput(self, xs, i0: int):
        for i, x in enumerate(xs):
            self.output(x, i0 + i)

    # -- private helpers ----------------------------------------------------

    def _mulv(self, a: BitW, b: BitW) -> BitW:
        F = self.F
        if a.c1 == self._zero:
            return self.rebase(self._zero, a.c0, b)
        if b.c1 == self._zero:
            return self._mulv(b, a)
        x = self.bk.axy(F.mul_i(a.c1, b.c1), a.x, b.x)
        x = self.bk.axpy(x, F.mul_i(a.c0, b.c1), b.x)
        x = self.bk.axpy(x, F.mul_i(a.c1, b.c0), a.x)
        x = self.bk.apy(x, F.mul_i(a.c0, b.c0))
        return self.bitw_of(x)

    def _addv(self, a: BitW, b: BitW) -> BitW:
        F = self.F
        if a.c1 == self._zero:
            return BitW(F.add_i(a.c0, b.c0), b.c1, b.x)
        if b.c1 == self._zero:
            return self._addv(b, a)
        x = self.bk.ax(a.c1, a.x)
        axb = self.bk.ax(b.c1, b.x)
        x = self.bk.add(x, axb)
        x = self.bk.apy(x, F.add_i(a.c0, b.c0))
        return self.bitw_of(x)
