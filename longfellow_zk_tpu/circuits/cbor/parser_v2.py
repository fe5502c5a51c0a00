"""Standalone in-circuit CBOR parser (v2 design).

Semantic twin of reference lib/circuits/cbor_parser_v2/cbor.h:35-675:
the prover witnesses, per input byte position, an encoded header flag,
a one-hot nesting-level selector, the string-length countdown SLEN, the
per-level item counters CC, and two batch-inverse products; the circuit
re-derives every transition with low-degree constraints:

  lexer:   SLEN_NEXT[i] = HEADER[i] ? LENGTH[i] : SLEN[i] - 1, and
           (SLEN_NEXT[i] == 1) <=> HEADER[i+1]  (the "=>" direction via
           invertibility witnesses invprod_decode);
  parser:  the selected level's counter decrements at each header and a
           fresh counter opens below it for tags/arrays/maps
           (counters_next), all counters zero at the end, selector
           maximality via invprod_parse.

Assertion helpers (text/unsigned/date/map-entry at witnessed indices)
route the decoded bytes through barrel shifters.  Counters use the
Counter embedding so the same circuit structure serves odd-char and
GF(2^k) fields (counter.h).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

from ...compiler.components import (
    BitPlucker, BitPluckerEncoder, Counter, Memcmp, UnaryPlucker,
    bit_plucker_point)
from ...compiler.logic import BitW, Logic
from ...compiler.routing import Routing
from .byte_decoder import ByteDecode, CborByteDecoder

K_NCOUNTERS = 4   # cbor_constants.h:22
K_INDEX_BITS = 12  # cbor_constants.h:23


@dataclass
class PositionWitness:
    """(cbor.h:57-70)."""

    encoded_header: object = None
    encoded_sel: object = None
    slen_next: object = None
    cc_next: list = None
    neg_sum_counters: object = None
    invprod_decode: object = None
    invprod_parse: object = None


@dataclass
class Decode:
    bd: ByteDecode = None
    header: BitW = None


@dataclass
class ParseOutput:
    sel: list = None      # kNCounters BitW
    cc_next: list = None  # kNCounters CEltW


class CborParserV2:
    def __init__(self, l: Logic, index_bits: int = K_INDEX_BITS):
        self.l = l
        self.index_bits = index_bits
        self.ctr = Counter(l)
        self.bd = CborByteDecoder(l)
        self.header_plucker = BitPlucker(l, 1)
        self.sel_plucker = UnaryPlucker(l, K_NCOUNTERS)

    # -- witness wires (canonical order, cbor.h:75-93) ------------------------

    def witness_wires(self, n: int) -> List[PositionWitness]:
        L, ctr = self.l, self.ctr
        out = []
        for i in range(n):
            pw = PositionWitness()
            pw.encoded_header = L.eltw_input()
            pw.encoded_sel = L.eltw_input()
            pw.slen_next = ctr.input()
            pw.cc_next = [ctr.input() for _ in range(K_NCOUNTERS)]
            pw.neg_sum_counters = ctr.input()
            if i > 0:
                pw.invprod_decode = L.eltw_input()
                pw.invprod_parse = L.eltw_input()
            out.append(pw)
        return out

    # -- decoder (lexer) -------------------------------------------------------

    def decode_all(self, n: int, inp: Sequence,
                   pw: List[PositionWitness]) -> List[Decode]:
        ds = []
        for i in range(n):
            d = Decode()
            d.bd = self.bd.decode_one_v8(inp[i])
            d.header = self.header_plucker.pluck(pw[i].encoded_header)[0]
            ds.append(d)
        return ds

    def assert_decode(self, n: int, ds: List[Decode],
                      pw: List[PositionWitness]) -> None:
        L, ctr = self.l, self.ctr

        for i in range(n):
            L.assert_implies(ds[i].header, L.lnot(ds[i].bd.invalid))
        L.assert_implies(ds[n - 1].header,
                         L.lnot(ds[n - 1].bd.count_is_next_v8))

        # counter well-formedness checksum (cbor.h:119-135)
        for i in range(n):
            def term(j, i=i):
                if j == 0:
                    return pw[i].slen_next
                if j == 1:
                    return pw[i].neg_sum_counters
                return pw[i].cc_next[j - 2]

            ctr.assert0(ctr.add_range(0, K_NCOUNTERS + 2, term))

        mone = ctr.mone()

        # SLEN update equation (cbor.h:140-161)
        for i in range(n):
            slen = ctr.as_counter(0) if i == 0 else pw[i - 1].slen_next
            slenm1 = ctr.add(slen, mone)
            length = ds[i].bd.length
            if i + 1 < n:
                len_i = ctr.ite0(ds[i].bd.length_plus_next_v8,
                                 ds[i + 1].bd.as_counter)
                length = ctr.add(length, len_i)
            else:
                L.assert_implies(ds[i].header,
                                 L.lnot(ds[i].bd.length_plus_next_v8))
            slen_next = ctr.mux(ds[i].header, length, slenm1)
            ctr.assert_eq(slen_next, pw[i].slen_next)

        # headers (cbor.h:163-200)
        L.assert1(ds[0].header)
        one = L.konst(1)
        for i in range(n):
            headerp1 = ds[i + 1].header if i + 1 < n else L.bit(1)
            implies = ctr.ite0(headerp1, ctr.add(pw[i].slen_next, mone))
            ctr.assert0(implies)
        for i in range(n - 1):
            snm1 = ctr.add(pw[i].slen_next, mone)
            x = L.mux_elt(ds[i + 1].header, one, ctr.znz_indicator(snm1))
            L.assert_eq_elt(L.mul(x, pw[i + 1].invprod_decode), one)

    # -- parser -----------------------------------------------------------------

    def parse(self, n: int, ds: List[Decode],
              pw: List[PositionWitness]) -> List[ParseOutput]:
        out = []
        for i in range(n):
            p = ParseOutput()
            p.sel = self.sel_plucker.pluck(pw[i].encoded_sel)
            p.cc_next = pw[i].cc_next
            out.append(p)
        return out

    def counters_next(self, cc: list, sel: list, count_i, d: Decode):
        """(cbor.h:226-269); returns (cc_next, overflow)."""
        L, ctr = self.l, self.ctr
        cc_next = list(cc)
        for l in range(K_NCOUNTERS):
            header_and_sel = L.land(sel[l], d.header)
            mone_maybe = ctr.ite0(header_and_sel, ctr.mone())
            cc_next[l] = ctr.add(cc[l], mone_maybe)
        overflow = None
        for l in range(K_NCOUNTERS):
            twice_count = ctr.add(count_i, count_i)
            one = ctr.as_counter(1)
            ifitems = ctr.mux(d.bd.arrayp, count_i, twice_count)
            ifnotitems = ctr.ite0(d.bd.tagp, one)
            newc = ctr.mux(d.bd.itemsp, ifitems, ifnotitems)
            header_and_sel = L.land(sel[l], d.header)
            tagp_or_itemsp = L.lor(d.bd.tagp, d.bd.itemsp)
            newc_enable = L.land(header_and_sel, tagp_or_itemsp)
            if l + 1 < K_NCOUNTERS:
                cc_next[l + 1] = ctr.mux(newc_enable, newc, cc_next[l + 1])
            else:
                overflow = newc_enable
        return cc_next, overflow

    def assert_counter_updates(self, n: int, ds: List[Decode],
                               ps: List[ParseOutput]) -> None:
        L, ctr = self.l, self.ctr
        for i in range(n):
            count_i = ds[i].bd.count_as_counter
            if i + 1 < n:
                count_i = ctr.mux(ds[i].bd.count_is_next_v8,
                                  ds[i + 1].bd.as_counter, count_i)
            else:
                L.assert_implies(ds[i].header,
                                 L.lnot(ds[i].bd.count_is_next_v8))
            if i > 0:
                cc = ps[i - 1].cc_next
                cc_next, overflow = self.counters_next(
                    cc, ps[i].sel, count_i, ds[i])
                L.assert0(overflow)
                for l in range(K_NCOUNTERS):
                    ctr.assert_eq(ps[i].cc_next[l], cc_next[l])

    def assert_parse(self, n: int, ds: List[Decode], ps: List[ParseOutput],
                     pw: List[PositionWitness]) -> None:
        L, ctr = self.l, self.ctr
        self.assert_counter_updates(n, ds, ps)

        for i in range(n):
            for l in range(K_NCOUNTERS):
                for m in range(l + 1, K_NCOUNTERS):
                    L.assert0(L.land(ps[i].sel[l], ps[i].sel[m]))
            s = L.bit(0)
            for l in range(K_NCOUNTERS):
                s = L.lor_exclusive(s, ps[i].sel[l])
            L.assert_implies(ds[i].header, s)

        for l in range(K_NCOUNTERS):
            ctr.assert0(ps[n - 1].cc_next[l])
        L.assert1(ps[0].sel[0])

        for i in range(n - 1):
            b = ps[i + 1].sel[0]
            for l in range(1, K_NCOUNTERS):
                ctr.assert0(ctr.ite0(b, ps[i].cc_next[l]))
                b = L.lor(b, ps[i + 1].sel[l])

        one = L.konst(1)
        for i in range(n - 1):
            def f(l, i=i):
                cc_nz = ctr.znz_indicator(ps[i].cc_next[l])
                return L.mux_elt(ps[i + 1].sel[l], cc_nz, one)

            p = L.mul_range(0, K_NCOUNTERS, f)
            L.assert_eq_elt(L.mul(p, pw[i + 1].invprod_parse), one)

    # -- combined entries --------------------------------------------------------

    def decode_and_assert_decode(self, n, inp, pw):
        ds = self.decode_all(n, inp, pw)
        self.assert_decode(n, ds, pw)
        return ds

    def decode_and_assert_decode_and_parse(self, n, inp, pw):
        ds = self.decode_and_assert_decode(n, inp, pw)
        ps = self.parse(n, ds, pw)
        self.assert_parse(n, ds, ps, pw)
        return ds, ps

    # -- positional assertions (cbor.h:391-640) -----------------------------------

    def assert_header(self, n: int, j: Sequence[BitW],
                      ds: List[Decode]) -> None:
        L = self.l
        L.vassert_is_bit(j)
        L.assert1(L.lor_exclusive_range(
            0, n, lambda i: L.land(ds[i].header, L.veq(j, i))))

    def assert_map_header(self, n: int, j, ds: List[Decode]) -> None:
        L = self.l
        L.vassert_is_bit(j)
        L.assert1(L.lor_exclusive_range(
            0, n, lambda i: L.land(L.veq(j, i),
                                   L.land(ds[i].bd.mapp, ds[i].header))))

    def assert_text_at(self, n: int, j, text: bytes,
                       ds: List[Decode]) -> None:
        L = self.l
        R = Routing(L)
        assert len(text) < 24, "len < 24"
        self.assert_header(n, j, ds)
        A = [ds[i].bd.as_scalar for i in range(n)]
        B = R.shift(j, len(text) + 1, A, L.konst(256), unroll=3)
        L.assert_eq_elt(B[0], L.konst((3 << 5) + len(text)))
        for i, byte in enumerate(text):
            L.assert_eq_elt(B[i + 1], L.konst(byte))

    def assert_atom_at(self, n: int, j, expected, ds: List[Decode]) -> None:
        L = self.l
        R = Routing(L)
        self.assert_header(n, j, ds)
        A = [ds[i].bd.as_scalar for i in range(n)]
        B = R.shift(j, 1, A, L.konst(256), unroll=3)
        L.assert_eq_elt(B[0], expected)

    def assert_unsigned_at(self, n, j, u: int, ds) -> None:
        assert u < 24
        self.assert_atom_at(n, j, self.l.konst((0 << 5) + u), ds)

    def assert_negative_at(self, n, j, u: int, ds) -> None:
        assert u < 24
        self.assert_atom_at(n, j, self.l.konst((1 << 5) + u), ds)

    def assert_bool_at(self, n, j, val: bool, ds) -> None:
        self.assert_atom_at(
            n, j, self.l.konst((7 << 5) + (21 if val else 20)), ds)

    def _date_helper(self, n, j, ds) -> List:
        L = self.l
        R = Routing(L)
        self.assert_header(n, j, ds)
        A = [ds[i].bd.as_bits for i in range(n)]
        B = R.shift(j, 22, A, L.bits(8, 0), unroll=3)
        L.vassert_eq(B[0], L.bits(8, 0xC0))  # tag: date/time string
        L.vassert_eq(B[1], L.bits(8, 0x74))  # text(20)
        return B

    def assert_date_before_at(self, n, j, now_v8: List, ds) -> None:
        L = self.l
        B = self._date_helper(n, j, ds)
        L.assert1(Memcmp(L).lt(B[2:22], now_v8))

    def assert_date_after_at(self, n, j, now_v8: List, ds) -> None:
        L = self.l
        B = self._date_helper(n, j, ds)
        L.assert1(Memcmp(L).lt(now_v8, B[2:22]))

    def assert_map_entry(self, n: int, m, level: int, k, v, j: int,
                         ds: List[Decode], ps: List[ParseOutput]) -> None:
        """(cbor.h:555-617): (k, v) are the j-th pair of the map at m,
        nested at `level`."""
        L, ctr = self.l, self.ctr
        R = Routing(L)
        self.assert_map_header(n, m, ds)
        self.assert_header(n, k, ds)
        self.assert_header(n, v, ds)

        for l in range(K_NCOUNTERS):
            A = [ps[i].cc_next[l] for i in range(n)]
            cm = R.shift(m, 1, A, L.konst(0), unroll=3)[0]
            ck = R.shift(k, 1, A, L.konst(0), unroll=3)[0]
            cv = R.shift(v, 1, A, L.konst(0), unroll=3)[0]
            if l <= level:
                ctr.assert_eq(cm, ck)
                ctr.assert_eq(cm, cv)
            elif l == level + 1:
                one = ctr.as_counter(1)
                two = ctr.as_counter(2)
                jctr = ctr.as_counter(j)
                twoj = ctr.add(jctr, jctr)
                ctr.assert_eq(cm, ctr.add(ck, ctr.add(twoj, one)))
                ctr.assert_eq(cm, ctr.add(cv, ctr.add(twoj, two)))
                sel = [ps[i].sel[l] for i in range(n)]
                sel_k = R.shift(k, 1, sel, L.bit(0), unroll=3)[0]
                sel_v = R.shift(v, 1, sel, L.bit(0), unroll=3)[0]
                L.assert1(sel_k)
                L.assert1(sel_v)
            else:
                ctr.assert0(cm)
                ctr.assert0(ck)

    def assert_input_starts_at(self, n: int, jroot, input_len,
                               ds: List[Decode]) -> None:
        L = self.l
        L.assert1(L.vleq(input_len, n))
        L.assert1(L.vlt(jroot, n))
        L.vassert_eq(L.vadd(jroot, input_len), n)
        # all bytes before jroot must be zero
        for i in range(n):
            before = L.vlt(L.bits(len(jroot), i), jroot)
            L.assert0_elt(L.lmul(before, ds[i].bd.as_scalar))


# ---------------------------------------------------------------------------
# host witness builder (cbor_witness.h:30-322)
# ---------------------------------------------------------------------------

class CborWitnessV2:
    def __init__(self, F, index_bits: int = K_INDEX_BITS):
        self.F = F
        self.index_bits = index_bits

    def _as_counter(self, n: int):
        F = self.F
        if F.kCharacteristicTwo:
            return F.as_counter(n)
        return F.of_scalar(n % F.char)

    def _znz(self, c):
        """Invertible iff the counter is nonzero (counter.h znz)."""
        F = self.F
        if F.kCharacteristicTwo:
            return c ^ 1
        return c

    def _neg_counter(self, n: int):
        F = self.F
        if F.kCharacteristicTwo:
            return F.inv_i(F.as_counter(n))
        return F.neg_i(self._as_counter(n))

    def index(self, j: int) -> List:
        return [self.F.of_scalar((j >> i) & 1)
                for i in range(self.index_bits)]

    def compute_witnesses(self, n: int, input_len: int, data: bytes):
        """Returns (in_bits, pw) where in_bits is the 8n input bit
        values and pw the PositionWitness host values.  `data` must be
        zero-padded on the LEFT to n bytes (cbor_witness.h:84-176)."""
        F = self.F
        assert input_len <= n and len(data) == n
        henc = BitPluckerEncoder(F, 1)

        # first pass: number of top-level items
        cc = [n + 1] + [0] * (K_NCOUNTERS - 1)
        slen = 1
        for i in range(n):
            header = slen == 1
            cc, ovf = self._counters_next(
                data[i], header, i + 1 < n,
                data[i + 1] if i + 1 < n else 0, cc)
            assert not ovf
            slen = self._next_slen(slen, n, data, i)
        top_level = (n + 1) - cc[0]

        cc = [top_level] + [0] * (K_NCOUNTERS - 1)
        slen = 1
        in_bits = []
        pws = []
        for i in range(n):
            header = slen == 1
            if i < n - input_len:
                assert data[i] == 0, "padding must be zero"
            in_bits.extend(F.of_scalar((data[i] >> j) & 1) for j in range(8))

            prod_decode = F.of_scalar(1) if header else \
                self._znz(self._as_counter(slen - 1))

            prod_parse = F.of_scalar(1)
            isel = K_NCOUNTERS
            for l in range(K_NCOUNTERS - 1, -1, -1):
                if cc[l] != 0:
                    if i > 0:
                        prod_parse = F.mul_i(
                            prod_parse, self._znz(self._as_counter(cc[l])))
                    isel = l
                    break

            cc_next, ovf = self._counters_next(
                data[i], header, i + 1 < n,
                data[i + 1] if i + 1 < n else 0, cc)
            assert not ovf
            slen_next = self._next_slen(slen, n, data, i)

            pw = PositionWitness()
            pw.encoded_header = henc.encode(1 if header else 0)
            pw.encoded_sel = bit_plucker_point(F, K_NCOUNTERS + 1, isel)
            pw.slen_next = slen_next
            pw.cc_next = list(cc_next)
            sum_raw = slen_next + sum(cc_next)
            pw.neg_sum_counters = self._neg_counter(sum_raw)
            pw.invprod_decode = F.inv_i(prod_decode)
            pw.invprod_parse = F.inv_i(prod_parse)
            pws.append(pw)
            slen = slen_next
            cc = cc_next
        return in_bits, pws

    def fill(self, pws: List[PositionWitness]) -> List:
        """Witness values in witness_wires order (push_witnesses)."""
        out = []
        for i, pw in enumerate(pws):
            out.append(pw.encoded_header)
            out.append(pw.encoded_sel)
            out.append(self._as_counter(pw.slen_next))
            for l in range(K_NCOUNTERS):
                out.append(self._as_counter(pw.cc_next[l]))
            out.append(pw.neg_sum_counters)
            if i > 0:
                out.append(pw.invprod_decode)
                out.append(pw.invprod_parse)
        return out

    # -- host transition functions (cbor_witness.h:180-316) --------------------

    @staticmethod
    def _next_slen(slen: int, n: int, data: bytes, i: int) -> int:
        if slen - 1 == 0:
            nextb = data[i + 1] if i + 1 < n else None
            return CborWitnessV2._item_length(data[i], nextb)
        return slen - 1

    @staticmethod
    def _item_length(b: int, nextb) -> int:
        tp = (b >> 5) & 7
        count = b & 0x1F
        if tp in (0, 1, 6):  # atoms, tag
            if count < 24:
                return 1
            return {24: 2, 25: 3, 26: 5, 27: 9}[count]
        if tp in (4, 5):  # array, map
            if count < 24:
                return 1
            assert count == 24, "unwitnessed count (item)"
            return 2
        if tp in (2, 3):  # bytes, text
            if count < 24:
                return 1 + count
            assert count == 24 and nextb is not None, "unwitnessed count"
            return 2 + nextb
        raise AssertionError("unwitnessed special")

    @staticmethod
    def _decode_count(count: int, nextb) -> int:
        if count < 24:
            return count
        assert count == 24 and nextb is not None
        return nextb

    @staticmethod
    def _counters_next(b: int, header: bool, have_next: bool, nextb: int,
                       cc: list):
        tp = (b >> 5) & 7
        count = b & 0x1F
        c1 = list(cc)
        overflow = False
        for l in range(K_NCOUNTERS - 1, -1, -1):
            if cc[l] != 0:
                if header:
                    c1[l] = cc[l] - 1
                    newc = None
                    if tp == 6:
                        newc = 1
                    elif tp == 4:
                        newc = CborWitnessV2._decode_count(
                            count, nextb if have_next else None)
                    elif tp == 5:
                        newc = 2 * CborWitnessV2._decode_count(
                            count, nextb if have_next else None)
                    if newc is not None:
                        if l + 1 < K_NCOUNTERS:
                            c1[l + 1] = newc
                        else:
                            overflow = True
                break
        return c1, overflow
