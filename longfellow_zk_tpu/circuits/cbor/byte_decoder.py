"""Per-byte CBOR header decoder circuit.

Semantic twin of reference lib/circuits/cbor_parser/cbor_byte_decoder.h
and cbor_parser_v2/cbor_byte_decoder.h (the two are identical): extract
type/count predicates and the token length from a single byte, assuming
the byte starts a CBOR token.  Used by the mdoc hash circuit's
pseudo-parsing (mdoc_hash.h check_cbor_length) and by the standalone
CBOR parser circuit.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...compiler.components import Counter
from ...compiler.logic import BitW, Logic


@dataclass
class ByteDecode:
    """(cbor_byte_decoder.h:39-62)."""

    atomp: BitW = None
    itemsp: BitW = None
    stringp: BitW = None
    arrayp: BitW = None
    mapp: BitW = None
    tagp: BitW = None
    specialp: BitW = None
    simple_specialp: BitW = None
    count0_23: BitW = None
    count24_27: BitW = None
    count24: BitW = None
    count25: BitW = None
    count26: BitW = None
    count27: BitW = None
    length_plus_next_v8: BitW = None
    count_is_next_v8: BitW = None
    invalid: BitW = None
    length: object = None  # CEltW
    as_scalar: object = None
    as_counter: object = None
    count_as_counter: object = None
    as_bits: list = None


class CborByteDecoder:
    def __init__(self, l: Logic):
        self.l = l
        self.ctr = Counter(l)

    def decode_one_v8(self, v) -> ByteDecode:
        """(cbor_byte_decoder.h:67-160); v: v8 bit list (LSB first)."""
        L, ctr = self.l, self.ctr
        s = ByteDecode()
        L.vassert_is_bit(v)
        count = L.slice_bits(v, 0, 5)
        tp = L.slice_bits(v, 5, 8)

        s.atomp = L.veqmask(tp, 0b110, 0b000)
        s.stringp = L.veqmask(tp, 0b110, 0b010)
        s.itemsp = L.veqmask(tp, 0b110, 0b100)
        s.specialp = L.veq(tp, 7)
        s.tagp = L.veq(tp, 6)
        s.arrayp = L.land(s.itemsp, L.lnot(tp[0]))
        s.mapp = L.land(s.itemsp, tp[0])

        s.count0_23 = L.lnot(L.veqmask(count, 0b11000, 0b11000))
        s.count24_27 = L.veqmask(count, 0b11100, 0b11000)
        s.count24 = L.veq(count, 24)
        s.count25 = L.veq(count, 25)
        s.count26 = L.veq(count, 26)
        s.count27 = L.veq(count, 27)

        count20_23 = L.veqmask(count, 0b11100, 0b10100)
        s.simple_specialp = L.land(s.specialp, count20_23)

        # stringp && count24 / itemsp && count24
        s.length_plus_next_v8 = L.veqmask(v, 0b11011111, 0b01011000)
        s.count_is_next_v8 = L.veqmask(v, 0b11011111, 0b10011000)

        count0_24 = L.lor_exclusive(s.count24, s.count0_23)
        atom_or_tag = L.lor_exclusive(s.atomp, s.tagp)
        good_count = L.lor(count0_24, L.land(atom_or_tag, s.count24_27))
        invalid_special = L.land(s.specialp, L.lnot(s.simple_specialp))
        s.invalid = L.lor(invalid_special, L.lnot(good_count))

        s.count_as_counter = ctr.as_counter(count)

        l1 = ctr.as_counter(1 + 1)
        l2 = ctr.as_counter(1 + 2)
        l4 = ctr.as_counter(1 + 4)
        l8 = ctr.as_counter(1 + 8)
        l24_25 = ctr.mux(count[0], l2, l1)
        l26_27 = ctr.mux(count[0], l8, l4)
        l24_27 = ctr.mux(count[1], l26_27, l24_25)
        x1 = ctr.as_counter(1)
        s.length = ctr.mux(s.count0_23, x1, l24_27)
        str_23 = L.land(s.stringp, s.count0_23)
        adjust_if_string = ctr.ite0(str_23, s.count_as_counter)
        s.length = ctr.add(s.length, adjust_if_string)

        s.as_counter = ctr.as_counter(list(v))
        s.as_scalar = L.as_scalar(v)
        s.as_bits = list(v)
        return s
