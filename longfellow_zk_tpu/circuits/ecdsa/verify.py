"""ECDSA signature-verification circuit and witness.

Semantic twin of reference lib/circuits/ecdsa/verify_circuit.h:30-369 and
verify_witness.h:29-198: verifies identity = g*e + pk*r + (rx,ry)*(-s)
as a 256-step triple-scalar multiplication over a witnessed precomputed
table pre[8] (g+pk, g+r, r+pk, g+r+pk), 3-bit packed exponent digits
muxed via EltMuxer, and witnessed intermediate projective points that
slice the loop to constant depth.  Host witness computes the real EC
operations with the identical complete formulas (ec/curves.py), so
intermediate points match the circuit coordinate-for-coordinate.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from ...compiler.components import EltMuxer
from ...compiler.logic import BitW, Logic
from ...ec.curves import EllipticCurve


class EcdsaWitness:
    """Wire container (verify_circuit.h:40-67)."""

    def __init__(self, lc: Logic, kbits: int):
        self.rx = lc.eltw_input()
        self.ry = lc.eltw_input()
        self.rx_inv = lc.eltw_input()
        self.s_inv = lc.eltw_input()
        self.pk_inv = lc.eltw_input()
        self.pre = [lc.eltw_input() for _ in range(8)]
        self.bi = []
        self.int_x = []
        self.int_y = []
        self.int_z = []
        for i in range(kbits):
            self.bi.append(lc.eltw_input())
            if i < kbits - 1:
                self.int_x.append(lc.eltw_input())
                self.int_y.append(lc.eltw_input())
                self.int_z.append(lc.eltw_input())


class VerifyCircuit:
    def __init__(self, lc: Logic, ec: EllipticCurve):
        self.lc = lc
        self.ec = ec
        self.kbits = ec.kBits
        F = lc.F
        # bits of the group order, for range checks
        self.bits_n = [lc.bit((ec.order >> i) & 1) for i in range(ec.kBits)]

    def verify_signature3(self, pk_x, pk_y, e, w: EcdsaWitness) -> None:
        lc, ec, F = self.lc, self.ec, self.lc.F
        zero = lc.konst(0)
        one = lc.konst(1)
        gx = lc.bk.konst(F.of_scalar(ec.gx))
        gy = lc.bk.konst(F.of_scalar(ec.gy))

        # table indices: [0]=id,[1]=g,[2]=pk,[3]=g+pk,[4]=r,[5]=g+r,
        # [6]=r+pk,[7]=g+r+pk  (pre holds 3..7 pairs)
        GPK_X, GPK_Y, GR_X, GR_Y, RPK_X, RPK_Y, GRPK_X, GRPK_Y = range(8)

        est = rst = sst = zero
        ax, ay, az = zero, one, zero

        # verify the precomputed table in parallel with its use
        cg = self._addE(gx, gy, one, pk_x, pk_y, one)
        crg = self._addE(w.rx, w.ry, one, gx, gy, one)
        crpk = self._addE(w.rx, w.ry, one, pk_x, pk_y, one)
        crgpk = self._addE(gx, gy, one, w.pre[RPK_X], w.pre[RPK_Y], one)
        self._point_equality(*cg, w.pre[GPK_X], w.pre[GPK_Y])
        self._point_equality(*crg, w.pre[GR_X], w.pre[GR_Y])
        self._point_equality(*crpk, w.pre[RPK_X], w.pre[RPK_Y])
        self._point_equality(*crgpk, w.pre[GRPK_X], w.pre[GRPK_Y])

        arr_x = [zero, gx, pk_x, w.pre[GPK_X], w.rx, w.pre[GR_X],
                 w.pre[RPK_X], w.pre[GRPK_X]]
        arr_y = [one, gy, pk_y, w.pre[GPK_Y], w.ry, w.pre[GR_Y],
                 w.pre[RPK_Y], w.pre[GRPK_Y]]
        arr_z = [zero] + [one] * 7
        arr_e = [zero, one, zero, one, zero, one, zero, one]
        arr_r = [zero, zero, one, one, zero, zero, one, one]
        arr_s = [zero, zero, zero, zero, one, one, one, one]
        arr_v = [zero] * 8 + [one]

        xx = EltMuxer(lc, arr_x, 8)
        yy = EltMuxer(lc, arr_y, 8)
        zz = EltMuxer(lc, arr_z, 8)
        ee = EltMuxer(lc, arr_e, 8)
        rr = EltMuxer(lc, arr_r, 8)
        ss = EltMuxer(lc, arr_s, 8)
        vv = EltMuxer(lc, arr_v, 9, pp=8)

        r_bits: List[BitW] = [None] * self.kbits
        s_bits: List[BitW] = [None] * self.kbits
        k2 = lc.bk.konst(F.of_scalar(2))

        for i in range(self.kbits):
            tx = xx.mux(w.bi[i])
            ty = yy.mux(w.bi[i])
            tz = zz.mux(w.bi[i])
            e_bi = ee.mux(w.bi[i])
            r_bi = rr.mux(w.bi[i])
            s_bi = ss.mux(w.bi[i])
            est = lc.add(e_bi, lc.mul(k2, est))
            rst = lc.add(r_bi, lc.mul(k2, rst))
            sst = lc.add(s_bi, lc.mul(k2, sst))
            r_bits[self.kbits - i - 1] = lc.bitw_of(r_bi)
            s_bits[self.kbits - i - 1] = lc.bitw_of(s_bi)
            lc.assert0_elt(vv.mux(w.bi[i]))

            if i > 0:
                ax, ay, az = self._doubleE(ax, ay, az)
            ax, ay, az = self._addE(ax, ay, az, tx, ty, tz)

            if i < self.kbits - 1:
                lc.assert_eq_elt(ax, w.int_x[i])
                lc.assert_eq_elt(ay, w.int_y[i])
                lc.assert_eq_elt(az, w.int_z[i])
                ax, ay, az = w.int_x[i], w.int_y[i], w.int_z[i]

        lc.assert0_elt(ax)
        lc.assert0_elt(az)
        lc.assert_eq_elt(est, e)
        lc.assert_eq_elt(rst, w.rx)
        self._is_on_curve(pk_x, pk_y)
        self._is_on_curve(w.rx, w.ry)
        self._assert_nonzero(w.rx, w.rx_inv)
        self._assert_nonzero(sst, w.s_inv)
        self._assert_nonzero(pk_x, w.pk_inv)
        lc.assert1(lc.vlt(r_bits, self.bits_n))
        lc.assert1(lc.vlt(s_bits, self.bits_n))

    # -- helpers ------------------------------------------------------------

    def _assert_nonzero(self, x, witness):
        lc = self.lc
        lc.assert_eq_elt(lc.mul(x, witness), lc.konst(1))

    def _point_equality(self, x, y, z, p_x, p_y):
        lc = self.lc
        lc.assert_eq_elt(x, lc.mul(z, p_x))
        lc.assert_eq_elt(y, lc.mul(z, p_y))

    def _is_on_curve(self, x, y):
        lc, F = self.lc, self.lc.F
        yy = lc.mul(y, y)
        xx = lc.mul(x, x)
        xxx = lc.mul(x, xx)
        ax = lc.bk.ax(F.of_scalar(self.ec.a), x)
        b = lc.bk.konst(F.of_scalar(self.ec.b))
        lc.assert_eq_elt(yy, lc.add(lc.add(ax, b), xxx))

    def _addE(self, X1, Y1, Z1, X2, Y2, Z2):
        """RCB15 Algorithm 1 in wires (verify_circuit.h:264-316)."""
        lc, F = self.lc, self.lc.F
        a_k = F.of_scalar(self.ec.a)
        k3b = F.of_scalar(self.ec.k3b)
        t0 = lc.mul(X1, X2)
        t1 = lc.mul(Y1, Y2)
        t2 = lc.mul(Z1, Z2)
        t3 = lc.mul(lc.add(X1, Y1), lc.add(X2, Y2))
        t3 = lc.sub(t3, lc.add(t0, t1))
        t4 = lc.mul(lc.add(X1, Z1), lc.add(X2, Z2))
        t4 = lc.sub(t4, lc.add(t0, t2))
        t5 = lc.mul(lc.add(Y1, Z1), lc.add(Y2, Z2))
        t5 = lc.sub(t5, lc.add(t1, t2))
        Z3 = lc.bk.ax(a_k, t4)
        X3 = lc.bk.ax(k3b, t2)
        Z3 = lc.add(X3, Z3)
        X3 = lc.sub(t1, Z3)
        Z3 = lc.add(t1, Z3)
        Y3 = lc.mul(X3, Z3)
        t1 = lc.add(t0, t0)
        t1 = lc.add(t1, t0)
        t2 = lc.bk.ax(a_k, t2)
        t4 = lc.bk.ax(k3b, t4)
        t1 = lc.add(t1, t2)
        t2 = lc.sub(t0, t2)
        t2 = lc.bk.ax(a_k, t2)
        t4 = lc.add(t4, t2)
        t0 = lc.mul(t1, t4)
        Y3 = lc.add(Y3, t0)
        t0 = lc.mul(t5, t4)
        X3 = lc.sub(lc.mul(t3, X3), t0)
        t0 = lc.mul(t3, t1)
        Z3 = lc.add(lc.mul(t5, Z3), t0)
        return X3, Y3, Z3

    def _doubleE(self, X, Y, Z):
        """RCB15 Algorithm 3 in wires (verify_circuit.h:318-361)."""
        lc, F = self.lc, self.lc.F
        a_k = F.of_scalar(self.ec.a)
        k3b = F.of_scalar(self.ec.k3b)
        t0 = lc.mul(X, X)
        t1 = lc.mul(Y, Y)
        t2 = lc.mul(Z, Z)
        t3 = lc.mul(X, Y)
        t3 = lc.add(t3, t3)
        Z3 = lc.mul(X, Z)
        Z3 = lc.add(Z3, Z3)
        X3 = lc.bk.ax(a_k, Z3)
        Y3 = lc.bk.ax(k3b, t2)
        Y3 = lc.add(X3, Y3)
        X3 = lc.sub(t1, Y3)
        Y3 = lc.add(t1, Y3)
        Y3 = lc.mul(X3, Y3)
        X3 = lc.mul(t3, X3)
        Z3 = lc.bk.ax(k3b, Z3)
        t2 = lc.bk.ax(a_k, t2)
        t3 = lc.sub(t0, t2)
        t3 = lc.bk.ax(a_k, t3)
        t3 = lc.add(t3, Z3)
        Z3 = lc.add(t0, t0)
        t0 = lc.add(Z3, t0)
        t0 = lc.add(t0, t2)
        t0 = lc.mul(t0, t3)
        Y3 = lc.add(Y3, t0)
        t2 = lc.mul(Y, Z)
        t2 = lc.add(t2, t2)
        t0 = lc.mul(t2, t3)
        X3 = lc.sub(X3, t0)
        Z3 = lc.mul(t2, t1)
        Z3 = lc.add(Z3, Z3)
        Z3 = lc.add(Z3, Z3)
        return X3, Y3, Z3


@dataclass
class VerifyWitness:
    """Host witness values (verify_witness.h:29-198)."""

    rx: int = 0
    ry: int = 0
    rx_inv: int = 0
    s_inv: int = 0
    pk_inv: int = 0
    pre: List[int] = field(default_factory=list)
    bi: List[int] = field(default_factory=list)
    int_x: List[int] = field(default_factory=list)
    int_y: List[int] = field(default_factory=list)
    int_z: List[int] = field(default_factory=list)

    def fill(self) -> List[int]:
        out = [self.rx, self.ry, self.rx_inv, self.s_inv, self.pk_inv]
        out += self.pre
        kbits = len(self.bi)
        for i in range(kbits):
            out.append(self.bi[i])
            if i < kbits - 1:
                out.append(self.int_x[i])
                out.append(self.int_y[i])
                out.append(self.int_z[i])
        return out


def compute_witness(ec: EllipticCurve, pkx: int, pky: int, e: int, r: int,
                    s: int) -> VerifyWitness:
    """(verify_witness.h:75-197)."""
    p, n = ec.p, ec.order
    w = VerifyWitness()
    s_inv_n = pow(s, -1, n)
    nms = (-s) % n
    # recover R = g*(e/s) + pk*(r/s)
    nes = e * s_inv_n % n
    nrs = r * s_inv_n % n
    pr = ec.normalize(ec.multi_scalar_mult(
        [ec.generator(), _pt(ec, pkx, pky)], [nes, nrs]))
    w.rx = r % p
    w.ry = pr.y
    w.rx_inv = pow(w.rx, -1, p) if w.rx != 0 else 0
    w.s_inv = pow(nms % p, -1, p) if nms % p != 0 else 0
    w.pk_inv = pow(pkx, -1, p) if pkx != 0 else 0

    # precomputed table: g+pk, g+r, r+pk normalized, then g+(r+pk)
    pre = [0] * 8
    lh = [(ec.gx, ec.gy), (ec.gx, ec.gy), (pkx, pky)]
    rh = [(pkx, pky), (w.rx, w.ry), (w.rx, w.ry)]
    for i in range(3):
        X, Y, Z = ec.addE(lh[i][0], lh[i][1], 1, rh[i][0], rh[i][1], 1)
        zi = pow(Z, -1, p) if Z % p != 0 else 0
        pre[2 * i] = X * zi % p
        pre[2 * i + 1] = Y * zi % p
    X, Y, Z = ec.addE(ec.gx, ec.gy, 1, pre[4], pre[5], 1)
    zi = pow(Z, -1, p) if Z % p != 0 else 0
    pre[6] = X * zi % p
    pre[7] = Y * zi % p
    w.pre = pre

    kbits = ec.kBits
    aX, aY, aZ = 0, 1, 0
    table = [
        (0, 1, 0), (ec.gx, ec.gy, 1), (pkx, pky, 1), (pre[0], pre[1], 1),
        (w.rx, w.ry, 1), (pre[2], pre[3], 1), (pre[4], pre[5], 1),
        (pre[6], pre[7], 1),
    ]
    for i in range(kbits):
        b = (((e >> (kbits - i - 1)) & 1)
             + 2 * ((r >> (kbits - i - 1)) & 1)
             + 4 * ((nms >> (kbits - i - 1)) & 1))
        w.bi.append((2 * b - 7) % p)
        if i > 0:
            aX, aY, aZ = ec.doubleE(aX, aY, aZ)
        tx, ty, tz = table[b]
        aX, aY, aZ = ec.addE(aX, aY, aZ, tx, ty, tz)
        w.int_x.append(aX)
        w.int_y.append(aY)
        w.int_z.append(aZ)
    assert aX % p == 0 and aZ % p == 0, "signature does not verify"
    return w


def _pt(ec, x, y):
    from ...ec.curves import ECPoint

    return ECPoint(x, y, 1)
