"""RIPEMD-160 circuit.

Semantic twin of reference lib/circuits/tests/ripemd/ripemd_circuit.h:
33-394: the 80 dual-path steps are verified with low-degree constraints
— the prover witnesses each step's pre-rotation sum (temp) and
post-rotation accumulate (calc) as packed words, and the circuit asserts

    temp[i] == a + f(b,c,d) + X[r] + K      (mod 2^32, slack k=4)
    calc[i] == rol(temp[i], s) + e          (mod 2^32, slack k=2)

via BitAdder, so no carry chains are materialized in-circuit.
"""

from __future__ import annotations

from typing import List, Sequence

from ...compiler.components import BitAdder, BitPlucker
from ...compiler.logic import Logic
from .reference import KL, KR, RIPEMD_INIT, RL, RR, SL, SR


class Ripemd160Circuit:
    def __init__(self, l: Logic, plucker_logn: int = 4):
        self.l = l
        self.bp = BitPlucker(l, plucker_logn)
        self.ba = BitAdder(l, 32)

    # -- witness wires -------------------------------------------------------

    def packed_input(self) -> List:
        return [self.l.eltw_input() for _ in range(self.bp.kNv32Elts)]

    def block_witness_input(self) -> dict:
        """(ripemd_circuit.h:50-73): temp/calc per step per path + the
        block's output state, all packed."""
        bw = dict(left_temp=[], left_calc=[], right_temp=[], right_calc=[],
                  h_out=[])
        for _ in range(80):
            bw["left_temp"].append(self.packed_input())
            bw["left_calc"].append(self.packed_input())
            bw["right_temp"].append(self.packed_input())
            bw["right_calc"].append(self.packed_input())
        for _ in range(5):
            bw["h_out"].append(self.packed_input())
        return bw

    # -- step functions (ripemd_circuit.h:321-378) ----------------------------

    def _rol(self, x, n: int):
        return self.l.vrotl(x, n)

    def _f(self, r: int, x, y, z):
        L = self.l
        if r == 0:
            return L.vxor3(x, y, z)
        if r == 1:
            return L.vCh(x, y, z)
        if r == 2:
            return L.vxor(L.vor(x, L.vnot(y)), z)
        if r == 3:
            return L.vCh(z, x, y)
        return L.vxor(x, L.vor(y, L.vnot(z)))

    # -- compression ----------------------------------------------------------

    def assert_transform_block_bits(self, inw, H0, left_temp, left_calc,
                                    right_temp, right_calc, H1) -> None:
        """All-v32 form (ripemd_circuit.h:88-176)."""
        L, BA = self.l, self.ba
        a, b, c, d, e = H0
        aa, bb, cc, dd, ee = H0
        for r in range(5):
            for s in range(16):
                i = r * 16 + s
                fv = self._f(r, b, c, d)
                BA.assert_eqmod(
                    left_temp[i],
                    BA.add([a, fv, inw[RL[r][s]], L.bits(32, KL[r])]), 4)
                BA.assert_eqmod(
                    left_calc[i],
                    BA.add([self._rol(left_temp[i], SL[r][s]), e]), 2)
                a, e, d, c, b = e, d, self._rol(c, 10), b, left_calc[i]

                fv = self._f(4 - r, bb, cc, dd)
                BA.assert_eqmod(
                    right_temp[i],
                    BA.add([aa, fv, inw[RR[r][s]], L.bits(32, KR[r])]), 4)
                BA.assert_eqmod(
                    right_calc[i],
                    BA.add([self._rol(right_temp[i], SR[r][s]), ee]), 2)
                aa, ee, dd, cc, bb = ee, dd, self._rol(cc, 10), bb, \
                    right_calc[i]

        pairs = [(H0[1], c, dd), (H0[2], d, ee), (H0[3], e, aa),
                 (H0[4], a, bb), (H0[0], b, cc)]
        for k, (h, u, v) in enumerate(pairs):
            self.ba.assert_eqmod(H1[k], self.ba.add([h, u, v]), 3)

    def assert_transform_block(self, inw, H0, bw: dict, H1) -> None:
        up = self.bp.unpack_v32
        self.assert_transform_block_bits(
            inw, H0,
            [up(x) for x in bw["left_temp"]],
            [up(x) for x in bw["left_calc"]],
            [up(x) for x in bw["right_temp"]],
            [up(x) for x in bw["right_calc"]], H1)

    # -- multi-block message (ripemd_circuit.h:209-318) ------------------------

    def _initial_context(self):
        return [self.l.bits(32, h) for h in RIPEMD_INIT]

    def assert_message(self, maxb: int, nb, inp: Sequence,
                       bws: List[dict]) -> None:
        """inp: 64*maxb v8s (already padded message, zero tail); nb: v8
        block count; bws: maxb block witnesses."""
        L = self.l
        up = self.bp.unpack_v32
        H = None
        for b in range(maxb):
            inb = inp[64 * b : 64 * b + 64]
            tmp = [inb[4 * i] + inb[4 * i + 1] + inb[4 * i + 2]
                   + inb[4 * i + 3] for i in range(16)]
            H0 = self._initial_context() if b == 0 else [up(x) for x in H]
            H1 = [up(x) for x in bws[b]["h_out"]]
            self.assert_transform_block(tmp, H0, bws[b], H1)
            H = bws[b]["h_out"]
        self.assert_zero_padding(maxb, nb, inp)

    def assert_hash(self, maxb: int, target, nb, bws: List[dict]) -> None:
        """target: v160 (LE bit order); selects block nb's h_out."""
        L = self.l
        x = None
        for b in range(maxb):
            ebt = L.eval(L.veq(nb, b + 1))
            hsel = [[L.mul(ebt, w) for w in bws[b]["h_out"][i]]
                    for i in range(5)]
            if x is None:
                x = hsel
            else:
                x = [[L.add(p, q) for p, q in zip(xi, hi)]
                     for xi, hi in zip(x, hsel)]
        mm = []
        for j in range(5):
            mm.extend(self.bp.unpack_v32(x[j]))
        L.vassert_eq(mm, target)

    def assert_message_hash(self, maxb: int, nb, inp: Sequence, target,
                            bws: List[dict]) -> None:
        self.assert_message(maxb, nb, inp, bws)
        self.assert_hash(maxb, target, nb, bws)

    def assert_zero_padding(self, maxb: int, nb, inp: Sequence) -> None:
        L = self.l
        for i in range(maxb):
            wantzero = L.vleq(nb, i)
            for j in range(64):
                L.assert_implies(wantzero, L.veq(inp[i * 64 + j], 0))

    def find_len(self, maxb: int, inp: Sequence, nb):
        """Bit length of the message read from its padding trailer
        (ripemd_circuit.h:219-233)."""
        L = self.l
        ln = L.bits(64, 0)
        for i in range(maxb):
            isblk = L.veq(nb, i + 1)
            ind = i * 64 + 63
            for j in range(64):
                ln[j] = L.lor_exclusive(
                    ln[j], L.land(isblk, inp[ind - 7 + j // 8][j % 8]))
        L.vassert_is_bit(ln)
        return ln
