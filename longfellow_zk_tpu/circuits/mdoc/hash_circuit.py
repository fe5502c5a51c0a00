"""MdocHash: hashing + pseudo-parsing circuit for an mdoc (GF2_128 side).

Semantic twin of reference lib/circuits/mdoc/mdoc_hash.h:44-554.  Checks
  (a) SHA-256 of the COSE1-framed MSO matches the committed digest e;
  (b) dpk_{x,y} appear in approximate CBOR form inside the MSO;
  (c) validFrom <= now <= validUntil;
  (d) per attribute: a salted-hash preimage whose SHA appears in the
      MSO contains the expected elementIdentifier/elementValue pair.
The "pseudo-parsing" is string matching over routing-shifted windows —
substantially cheaper than full CBOR parsing in-circuit (mdoc_hash.h:510).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from ...compiler.components import BitPlucker, Memcmp
from ...compiler.logic import Logic
from ...compiler.routing import Routing
from ..cbor.byte_decoder import CborByteDecoder
from ..sha.sha256 import FlatSHA256Circuit, SHA256_INIT
from . import constants as C

NB = C.K_CBOR_INDEX_BITS


def _vinput8(L):
    return L.vinput(8)


@dataclass
class OpenedAttribute:
    """Public attribute claim (mdoc_hash.h:60-80)."""

    attr: List = None  # [32] v8
    v1: List = None    # [64] v8
    len: List = None   # v8
    vlen: List = None  # v8

    def input(self, L):
        self.attr = [_vinput8(L) for _ in range(32)]
        self.v1 = [_vinput8(L) for _ in range(64)]
        self.len = _vinput8(L)
        self.vlen = _vinput8(L)


@dataclass
class CborIndexW:
    k: List = None

    def input(self, L):
        self.k = L.vinput(NB)


@dataclass
class AttrShiftW:
    offset: List = None
    len: List = None

    def input(self, L):
        self.offset = L.vinput(NB)
        self.len = L.vinput(NB)


@dataclass
class SaltedHashW:
    i1: List = None
    i2: List = None
    i3: List = None
    l: List = None  # [4] vind
    perm: List = None  # v8

    def input(self, L):
        self.i1 = L.vinput(NB)
        self.i2 = L.vinput(NB)
        self.i3 = L.vinput(NB)
        self.l = [L.vinput(NB) for _ in range(4)]
        self.perm = _vinput8(L)


@dataclass
class MdocHashWitnessW:
    """Circuit wires of the private witness (mdoc_hash.h:110-175)."""

    num_attr: int = 1
    version: int = 7
    nb: List = None
    inb: List = None       # [64*maxblocks - prefix] v8
    sig_sha: List = None   # [maxblocks] packed block witness dicts
    valid_from: CborIndexW = None
    valid_until: CborIndexW = None
    dev_key_info: CborIndexW = None
    value_digests: CborIndexW = None
    attrb: List = None     # [num_attr][128] v8
    attr_sha: List = None  # [num_attr][2] block witness dicts
    attr_mso: List = None  # [num_attr] CborIndexW
    attr_ei: List = None   # [num_attr] AttrShiftW
    attr_ev: List = None   # [num_attr] AttrShiftW
    salted: List = None    # [num_attr] SaltedHashW

    def input(self, L, sha: FlatSHA256Circuit):
        maxb = C.max_sha_blocks(self.version)
        self.nb = _vinput8(L)
        self.inb = [_vinput8(L)
                    for _ in range(64 * maxb - C.K_COSE1_PREFIX_LEN)]
        self.sig_sha = [sha.block_witness_input() for _ in range(maxb)]
        self.valid_from = CborIndexW(); self.valid_from.input(L)
        self.valid_until = CborIndexW(); self.valid_until.input(L)
        self.dev_key_info = CborIndexW(); self.dev_key_info.input(L)
        self.value_digests = CborIndexW(); self.value_digests.input(L)
        self.attrb, self.attr_sha = [], []
        self.attr_mso, self.attr_ei, self.attr_ev, self.salted = [], [], [], []
        for _ in range(self.num_attr):
            self.attrb.append([_vinput8(L) for _ in range(128)])
            self.attr_sha.append([sha.block_witness_input()
                                  for _ in range(2)])
            m = CborIndexW(); m.input(L); self.attr_mso.append(m)
            ei = AttrShiftW(); ei.input(L); self.attr_ei.append(ei)
            ev = AttrShiftW(); ev.input(L); self.attr_ev.append(ev)
            sh = SaltedHashW(); sh.input(L); self.salted.append(sh)


class MdocHash:
    def __init__(self, l: Logic, version: int = 7):
        self.l = l
        self.version = version
        self.sha = FlatSHA256Circuit(l, plucker_logn=C.K_SHA_PLUCKER_BITS)
        self.r = Routing(l)
        self.cb = CborByteDecoder(l)
        self.cmp = Memcmp(l)

    # ---------------------------------------------------------------

    def assert_valid_hash_mdoc(self, oa: List[OpenedAttribute], now,
                               e, dpkx, dpky, vw: MdocHashWitnessW) -> None:
        """(mdoc_hash.h:180-287).  now: [20] v8; e/dpkx/dpky: v256."""
        L = self.l
        maxb = C.max_sha_blocks(self.version)
        max_mso = C.max_mso_len(self.version)
        preimage = self._signature_preimage(vw)
        L.vassert_is_bit(vw.nb)
        L.vleq(vw.nb, maxb)  # value unused, mirrors the reference
        self.sha.assert_message_hash(maxb, vw.nb, preimage, e, vw.sig_sha)

        len_bits = self.sha.find_len_bits(maxb, preimage, vw.nb)

        zz = L.bits(8, 0)
        # The shift window skips the 2-byte COSE length and the
        # D8 18 59 <len2> tag of the MSO: vw.in_ + 5 + 2 over kMaxMsoLen
        # elements (mdoc_hash.h:199-204).
        mso = vw.inb[5 + 2 : 5 + 2 + max_mso]

        # validFrom <= now
        self._check_index(vw.valid_from.k, len_bits)
        buf = self.r.shift(vw.valid_from.k,
                           len(C.K_VALID_FROM_CHECK) + C.K_DATE_LEN,
                           mso, zz, unroll=3)
        self._assert_bytes_at(buf, C.K_VALID_FROM_CHECK)
        L.assert1(self.cmp.leq(buf[len(C.K_VALID_FROM_CHECK):
                                   len(C.K_VALID_FROM_CHECK) + C.K_DATE_LEN],
                               now))

        # now <= validUntil
        self._check_index(vw.valid_until.k, len_bits)
        buf = self.r.shift(vw.valid_until.k,
                           len(C.K_VALID_UNTIL_CHECK) + C.K_DATE_LEN,
                           mso, zz, unroll=3)
        self._assert_bytes_at(buf, C.K_VALID_UNTIL_CHECK)
        L.assert1(self.cmp.leq(now,
                               buf[len(C.K_VALID_UNTIL_CHECK):
                                   len(C.K_VALID_UNTIL_CHECK) + C.K_DATE_LEN]))

        # device key
        self._check_index(vw.dev_key_info.k, len_bits)
        dki_len = len(C.K_DEVICE_KEY_INFO_CHECK)
        buf = self.r.shift(vw.dev_key_info.k, dki_len + 3 + 32 + 32,
                           mso, zz, unroll=3)
        self._assert_bytes_at(buf, C.K_DEVICE_KEY_INFO_CHECK)
        self._assert_bytes_at(buf[65:], bytes([0x22, 0x58, 0x20]))
        self._assert_key(dpkx, buf[C.K_PKX_IND : C.K_PKX_IND + 32])
        self._assert_key(dpky, buf[C.K_PKY_IND : C.K_PKY_IND + 32])

        # valueDigests
        self._check_index(vw.value_digests.k, len_bits)
        buf = self.r.shift(vw.value_digests.k, len(C.K_VALUE_DIGESTS_CHECK),
                           mso, zz, unroll=3)
        self._assert_bytes_at(buf[:13], C.K_VALUE_DIGESTS_CHECK[:13])

        # attributes
        for ai in range(vw.num_attr):
            self._check_index(vw.attr_mso[ai].k, len_bits)
            buf = self.r.shift(vw.attr_mso[ai].k, 2 + 32, mso, zz, unroll=3)
            self._assert_bytes_at(buf[:2], C.K_TAG32)

            mm = [None] * 256
            for j in range(256):
                mm[j] = buf[2 + (255 - j) // 8][j % 8]
            L.vassert_is_bit(mm)

            two = L.bits(8, 2)
            self.sha.assert_message_hash(2, two, vw.attrb[ai], mm,
                                         vw.attr_sha[ai])
            salted_len_bits = self.sha.find_len_bits(2, vw.attrb[ai], two)
            self._assert_attribute(vw.attrb[ai], vw.salted[ai], oa[ai],
                                   salted_len_bits)

    # ---------------------------------------------------------------
    # helpers (mdoc_hash.h:289-512)
    # ---------------------------------------------------------------

    def _signature_preimage(self, vw) -> List:
        L = self.l
        maxb = C.max_sha_blocks(self.version)
        out = []
        for i in range(64 * maxb):
            if i < C.K_COSE1_PREFIX_LEN:
                out.append(L.bits(8, C.K_COSE1_PREFIX[i]))
            else:
                out.append(vw.inb[i - C.K_COSE1_PREFIX_LEN])
        return out

    def _extract_vind(self, len_bits):
        L = self.l
        low = L.slice_bits(len_bits, 0, 3)
        mid = L.slice_bits(len_bits, 3, 3 + NB)
        hi = L.slice_bits(len_bits, 3 + NB, 64)
        L.vassert0(low)
        L.vassert0(hi)
        return mid

    def _check_index(self, index, len_bits):
        L = self.l
        L.vassert_is_bit(index)
        mid = self._extract_vind(len_bits)
        L.assert1(L.vlt(index, mid))

    def _assert_bytes_at(self, buf, want: bytes):
        L = self.l
        for i, b in enumerate(want):
            L.vassert_eq(buf[i], L.bits(8, b))

    def _assert_key(self, key, buf_be):
        """key: v256; buf_be: [32] v8 big-endian (mdoc_hash.h:497-503)."""
        L = self.l
        m = [buf_be[31 - (i // 8)][i % 8] for i in range(256)]
        L.vassert_eq(m, key)

    def _format_element(self, maxlen: int, prefix: bytes, strv: List) -> List:
        L = self.l
        buf = [L.bits(8, 0) for _ in range(maxlen)]
        for i, b in enumerate(prefix):
            buf[i] = L.bits(8, b)
        for i in range(len(strv)):
            if len(prefix) + i < maxlen:
                buf[len(prefix) + i] = strv[i]
        return buf

    def _check_cbor_length(self, got, expected_len, val_hdr_index: int,
                           atom: bool = False):
        """(mdoc_hash.h:375-414)."""
        L = self.l
        cbor = self.cb.decode_one_v8(got[val_hdr_index])
        L.assert0(cbor.invalid)

        l1 = L.bits(NB, 0)
        l2 = L.bits(NB, 0)
        one = L.bits(NB, 1)
        two = L.bits(NB, 2)
        if not atom:
            for j in range(8):
                l1[j] = L.mux(cbor.length_plus_next_v8,
                              got[val_hdr_index + 1][j],
                              got[val_hdr_index][j] if j < 5 else L.bit(0))
            l2 = L.vmux(cbor.length_plus_next_v8, two, one)
        else:
            L.assert0(cbor.count27)
            l2[2] = cbor.count26
            l2[1] = L.lor(cbor.count24, cbor.count25)
            l2[0] = L.lnot(cbor.count24)

        k_len = L.bits(NB, val_hdr_index)
        v_len = L.vadd(l1, l2)
        L.assert_sum(expected_len, k_len, v_len)

    def _mux_offset(self, slot: int, sh: SaltedHashW):
        """(mdoc_hash.h:483-495)."""
        L = self.l
        five = L.bits(NB, 5)
        t0 = L.vmux(sh.perm[2 * slot + 1], sh.i2, five)
        t1 = L.vmux(sh.perm[2 * slot + 1], sh.i3, sh.i1)
        shift = L.vmux(sh.perm[2 * slot], t1, t0)
        t0 = L.vmux(sh.perm[2 * slot + 1], sh.l[2], sh.l[0])
        t1 = L.vmux(sh.perm[2 * slot + 1], sh.l[3], sh.l[1])
        ln = L.vmux(sh.perm[2 * slot], t1, t0)
        return shift, ln

    def _assert_attribute(self, buf, sh: SaltedHashW, oa: OpenedAttribute,
                          salted_len_bits):
        """(mdoc_hash.h:416-481)."""
        L = self.l
        self._assert_bytes_at(buf, bytes([0xD8, 0x18, 0x58]))
        self._assert_bytes_at(buf[4:], bytes([0xA4]))

        five = L.bits(NB, 5)
        tot = self._extract_vind(salted_len_bits)
        L.assert_sum(sh.i1, five, sh.l[0])
        L.assert_sum(sh.i2, sh.i1, sh.l[1])
        L.assert_sum(sh.i3, sh.i2, sh.l[2])
        L.assert_sum(tot, sh.i3, sh.l[3])

        MAX_BUF = 119
        zz = L.bits(8, 0)

        shift, ln = self._mux_offset(0, sh)
        got = self.r.shift(shift, MAX_BUF, buf, zz, unroll=3)
        self._assert_bytes_at(got, C.K_DIGEST_ID)
        self._check_cbor_length(got, ln, 9, atom=True)

        shift, ln = self._mux_offset(1, sh)
        got = self.r.shift(shift, MAX_BUF, buf, zz, unroll=3)
        self._assert_bytes_at(got, C.K_RANDOM_ID)
        self._check_cbor_length(got, ln, 7)

        MAX_EI = 1 + 17 + 32
        MAX_EV = 1 + 12 + 64
        ei_prefix = bytes([0x60 + 17]) + b"elementIdentifier"
        ev_prefix = bytes([0x60 + 12]) + b"elementValue"
        want_ei = self._format_element(MAX_EI, ei_prefix, oa.attr)
        want_ev = self._format_element(MAX_EV, ev_prefix, oa.v1)

        shift, ln = self._mux_offset(2, sh)
        got = self.r.shift(shift, MAX_BUF, buf, zz, unroll=3)
        for j in range(MAX_EI):
            ll = L.vlt(L.bits(8, j), oa.len)
            for i in range(8):
                same = L.lnot(L.lxor(got[j][i], want_ei[j][i]))
                L.assert_implies(ll, same)
        L.vassert_eq(ln[:8], oa.len)

        shift, ln = self._mux_offset(3, sh)
        got = self.r.shift(shift, MAX_BUF, buf, zz, unroll=3)
        for j in range(MAX_EV):
            ll = L.vlt(L.bits(8, j), oa.vlen)
            for i in range(8):
                same = L.lnot(L.lxor(got[j][i], want_ev[j][i]))
                L.assert_implies(ll, same)
        L.vassert_eq(ln[:8], oa.vlen)
