"""Public-key derivation circuit: (pkx, pky) == sk * G.

Semantic twin of reference lib/circuits/tests/ec/pk_circuit.h:24-231
(which has a Lean 4 soundness/completeness twin, lib/formal/circuits/
tests/ec): double-and-add over witnessed secret bits with witnessed
intermediate projective points; equality at each step keeps every
intermediate on the curve by induction.
"""

from __future__ import annotations

from typing import List

from ...compiler.logic import Logic
from ...ec.curves import EllipticCurve
from .verify import VerifyCircuit


class EcpkWitness:
    def __init__(self, L: Logic, kbits: int):
        """Wire order matches pk_circuit.h Witness::input (interleaved)
        and fill_pk_witness below."""
        self.bits = []
        self.int_x, self.int_y, self.int_z = [], [], []
        for i in range(kbits):
            self.bits.append(L.eltw_input())
            if i < kbits - 1:
                self.int_x.append(L.eltw_input())
                self.int_y.append(L.eltw_input())
                self.int_z.append(L.eltw_input())


class Ecpk:
    def __init__(self, lc: Logic, ec: EllipticCurve):
        self.l = lc
        self.ec = ec
        self._vc = VerifyCircuit(lc, ec)  # reuse addE/doubleE/is_on_curve

    def assert_public_key(self, pk_x, pk_y, w: EcpkWitness) -> None:
        L, ec = self.l, self.ec
        kbits = ec.kBits
        zero, one = L.konst(0), L.konst(1)
        gx, gy = L.konst(ec.gx), L.konst(ec.gy)

        ax, ay, az = zero, one, zero  # point at infinity
        for i in range(kbits):
            b = L.bitw_of(w.bits[i])
            L.assert_is_bit(b)
            tx = L.mux_elt(b, gx, zero)
            ty = L.mux_elt(b, gy, one)
            tz = L.mux_elt(b, one, zero)
            ax, ay, az = self._vc._doubleE(ax, ay, az)
            ax, ay, az = self._vc._addE(ax, ay, az, tx, ty, tz)
            if i < kbits - 1:
                L.assert_eq_elt(ax, w.int_x[i])
                L.assert_eq_elt(ay, w.int_y[i])
                L.assert_eq_elt(az, w.int_z[i])
                ax, ay, az = w.int_x[i], w.int_y[i], w.int_z[i]

        # projective equality vs (pk_x, pk_y, 1); valid since both on curve
        L.assert_eq_elt(ax, L.mul(pk_x, az))
        L.assert_eq_elt(ay, L.mul(pk_y, az))
        self._vc._is_on_curve(pk_x, pk_y)


def compute_pk_witness(ec: EllipticCurve, sk: int) -> dict:
    """Host: bits of sk (MSB first) + intermediate projective points."""
    kbits = ec.kBits
    bits = [(sk >> (kbits - 1 - i)) & 1 for i in range(kbits)]
    ax, ay, az = 0, 1, 0
    int_x, int_y, int_z = [], [], []
    for i in range(kbits):
        ax, ay, az = ec.doubleE(ax, ay, az)
        if bits[i]:
            ax, ay, az = ec.addE(ax, ay, az, ec.gx, ec.gy, 1)
        else:
            ax, ay, az = ec.addE(ax, ay, az, 0, 1, 0)
        if i < kbits - 1:
            int_x.append(ax)
            int_y.append(ay)
            int_z.append(az)
    return dict(bits=bits, int_x=int_x, int_y=int_y, int_z=int_z)


def fill_pk_witness(F, w: dict) -> List[int]:
    out = []
    kbits = len(w["bits"])
    for i in range(kbits):
        out.append(F.of_scalar(w["bits"][i]))
        if i < kbits - 1:
            out.append(w["int_x"][i] % F.p)
            out.append(w["int_y"][i] % F.p)
            out.append(w["int_z"][i] % F.p)
    return out
