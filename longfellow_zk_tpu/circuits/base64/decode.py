"""Base64url decoder circuit.

Functional twin of reference lib/circuits/tests/base64/decode.h:32-508:
asserts a base64 *rawurl* decoding (A-Z a-z 0-9 - _, no padding) of an
input byte string in-circuit.  The reference uses a machine-minimized
sum-of-products table; here the per-character decode derives from range
comparisons and 8-bit subtractor circuits — same mapping, independently
constructed:

  'A'..'Z' -> v-65, 'a'..'z' -> v-71, '0'..'9' -> v+4, '-' -> 62,
  '_' -> 63, everything else -> invalid.
"""

from __future__ import annotations

from typing import List, Tuple

from ...compiler.logic import BitW, Logic


def _ceildiv(a, b):
    return -(-a // b)


class Base64Decoder:
    def __init__(self, lc: Logic):
        self.lc = lc

    # -- per-character decode ----------------------------------------------

    def decode_char(self, inb: List[BitW]) -> Tuple[List[BitW], BitW]:
        """v8 -> (v6 value, invalid bit)."""
        L = self.lc

        def rng(lo, hi):
            ge = L.lnot(L.vlt(inb, lo))          # v >= lo
            le = L.vleq(inb, hi)                 # v <= hi
            return L.land(ge, le)

        is_upper = rng(65, 90)
        is_lower = rng(97, 122)
        is_digit = rng(48, 57)
        is_dash = L.veq(inb, 45)
        is_under = L.veq(inb, 95)

        def sub_const(k):
            _, d = L.ripple_carry_sub(inb, L.bits(8, k))
            return d[:6]

        def add_const(k):
            _, s = L.ripple_carry_add(inb, L.bits(8, k))
            return s[:6]

        upper_v = sub_const(65)
        lower_v = sub_const(71)
        digit_v = add_const(4)
        zero6 = [L.bit(0)] * 6
        dash_v = L.bits(6, 62)
        under_v = L.bits(6, 63)

        out = zero6
        for sel, val in [(is_upper, upper_v), (is_lower, lower_v),
                         (is_digit, digit_v), (is_dash, dash_v),
                         (is_under, under_v)]:
            # classes are mutually exclusive: exclusive-or accumulate
            masked = [L.land(sel, v) for v in val]
            out = [L.lor_exclusive(a, b) for a, b in zip(out, masked)]
        valid = is_upper
        for sel in (is_lower, is_digit, is_dash, is_under):
            valid = L.lor_exclusive(valid, sel)
        return out, L.lnot(valid)

    def decode(self, inb: List[BitW]) -> List[BitW]:
        out, invalid = self.decode_char(inb)
        self.lc.assert0(invalid)
        return out

    # -- string decode (decode.h:41-59) -------------------------------------

    def base64_rawurl_decode(self, inputs: List[List[BitW]]) -> List[List[BitW]]:
        """inputs: n v8 chars -> ceil(n*6/8) v8 output bytes."""
        L = self.lc
        n = len(inputs)
        assert n < (1 << 28)
        max_out = _ceildiv(n * 6, 8)
        zero6 = [L.bit(0)] * 6
        output = [[L.bit(0)] * 8 for _ in range(max_out)]
        oc = 0
        i = 0
        while i < n:
            quad = [list(zero6) for _ in range(4)]
            for j in range(4):
                if i + j < n:
                    quad[j] = self.decode(inputs[i + j])
            for j in range(24):
                if oc + j // 8 < max_out:
                    output[oc + j // 8][7 - (j % 8)] = quad[j // 6][5 - (j % 6)]
            i += 4
            oc += 3
        return output

    def base64_rawurl_decode_len(self, inputs: List[List[BitW]],
                                 length_bits: List[BitW], max_n: int
                                 ) -> List[List[BitW]]:
        """Variable-length variant (decode.h:62-84): characters at
        positions >= len decode as zero and validity is only enforced
        below len."""
        L = self.lc
        n = len(inputs)
        max_out = _ceildiv(n * 6, 8)
        zero6 = [L.bit(0)] * 6
        output = [[L.bit(0)] * 8 for _ in range(max_out)]
        oc = 0
        i = 0
        while i < n:
            quad = [list(zero6) for _ in range(4)]
            for j in range(4):
                if i + j < n:
                    pos = L.bits(len(length_bits), i + j)
                    inside = L.vlt(pos, length_bits)
                    val, invalid = self.decode_char(inputs[i + j])
                    L.assert0(L.land(inside, invalid))
                    quad[j] = [L.land(inside, v) for v in val]
            for j in range(24):
                if oc + j // 8 < max_out:
                    output[oc + j // 8][7 - (j % 8)] = quad[j // 6][5 - (j % 6)]
            i += 4
            oc += 3
        return output
