"""Flat SHA-256 circuit and host witness generation.

Semantic twin of reference lib/circuits/sha/flatsha256_circuit.h:50-330
and flatsha256_witness (witness.h/.cc): the SHA round function is
flattened — the prover supplies each round's message-schedule word w,
working values e and a, and the running digest h1 as packed (bit-plucked)
witnesses; the circuit asserts modular-addition consistency of every
round via BitAdder equations instead of computing carries in-circuit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

from ...compiler.components import BitAdder, BitPlucker, BitPluckerEncoder
from ...compiler.logic import Logic

K_SHA256_ROUND = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]

SHA256_INIT = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
               0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19]


class FlatSHA256Circuit:
    def __init__(self, l: Logic, plucker_logn: int = 4):
        self.l = l
        self.bp = BitPlucker(l, plucker_logn)

    # block witness: 48 outw + 64 oute + 64 outa + 8 h1, all packed
    def block_witness_input(self):
        L = self.l
        n = self.bp.kNv32Elts

        def packed():
            return [L.eltw_input() for _ in range(n)]

        # input order matches the reference BlockWitness::input
        # (flatsha256_circuit.h:75-86): outw, then oute/outa interleaved,
        # then h1 — and the host packer (pack_block_witness) mirrors it.
        outw = [packed() for _ in range(48)]
        oute, outa = [], []
        for _ in range(64):
            oute.append(packed())
            outa.append(packed())
        h1 = [packed() for _ in range(8)]
        return dict(outw=outw, oute=oute, outa=outa, h1=h1)

    # -- sigma functions (flatsha256_circuit.h:303-325) ---------------------

    def _Sigma0(self, x):
        L = self.l
        return L.vxor3(L.vrotr(x, 2), L.vrotr(x, 13), L.vrotr(x, 22))

    def _Sigma1(self, x):
        L = self.l
        return L.vxor3(L.vrotr(x, 6), L.vrotr(x, 11), L.vrotr(x, 25))

    def _sigma0(self, x):
        L = self.l
        return L.vxor3(L.vrotr(x, 7), L.vrotr(x, 18), L.vshr(x, 3))

    def _sigma1(self, x):
        L = self.l
        return L.vxor3(L.vrotr(x, 17), L.vrotr(x, 19), L.vshr(x, 10))

    # -- block transform (flatsha256_circuit.h:91-147) ----------------------

    def assert_transform_block(self, inw, H0, outw, oute, outa, H1):
        """All args unpacked v32 bit vectors."""
        L = self.l
        BA = BitAdder(L, 32)
        w = list(inw)
        for i in range(16, 64):
            w.append(outw[i - 16])
            BA.assert_eqmod(
                w[i],
                BA.add([self._sigma1(w[i - 2]), w[i - 7],
                        self._sigma0(w[i - 15]), w[i - 16]]),
                4)
        a, b, c, d = H0[0], H0[1], H0[2], H0[3]
        e, f, g, h = H0[4], H0[5], H0[6], H0[7]
        for t in range(64):
            t1 = BA.add([h, self._Sigma1(e), L.vCh(e, f, g),
                         L.bits(32, K_SHA256_ROUND[t]), w[t]])
            sigma0 = BA.as_field_element(self._Sigma0(a))
            vmaj = BA.as_field_element(L.vMaj(a, b, c))
            t2 = BA.add2(sigma0, vmaj)
            h = g
            g = f
            f = e
            e = oute[t]
            ed = BA.as_field_element(d)
            BA.assert_eqmod(e, BA.add2(t1, ed), 6)
            d = c
            c = b
            b = a
            a = outa[t]
            BA.assert_eqmod(a, BA.add2(t1, t2), 7)
        outs = [a, b, c, d, e, f, g, h]
        for i in range(8):
            BA.assert_eqmod(H1[i], BA.add([H0[i], outs[i]]), 2)

    def assert_transform_block_packed(self, inw, H0, bw):
        outw = [self.bp.unpack_v32(p) for p in bw["outw"]]
        oute = [self.bp.unpack_v32(p) for p in bw["oute"]]
        outa = [self.bp.unpack_v32(p) for p in bw["outa"]]
        H1 = [self.bp.unpack_v32(p) for p in bw["h1"]]
        self.assert_transform_block(inw, H0, outw, oute, outa, H1)

    # -- multi-block message (flatsha256_circuit.h:189-291) -----------------

    def assert_message(self, max_blocks: int, nb, inb, bws):
        """nb: v8 block count; inb: [64*max] v8 bytes; bws: block witnesses."""
        L = self.l
        H_packed = None
        for b in range(max_blocks):
            blk = inb[64 * b : 64 * (b + 1)]
            tmp = []
            for i in range(16):
                # big-endian v8[4] -> v32
                tmp.append(L.vappend(
                    L.vappend(blk[4 * i + 3], blk[4 * i + 2]),
                    L.vappend(blk[4 * i + 1], blk[4 * i + 0])))
            if b == 0:
                H0 = [L.bits(32, v) for v in SHA256_INIT]
            else:
                H0 = [self.bp.unpack_v32(p) for p in H_packed]
            self.assert_transform_block_packed(tmp, H0, bws[b])
            H_packed = bws[b]["h1"]
        self.assert_zero_padding(max_blocks, nb, inb)

    def assert_message_hash(self, max_blocks: int, nb, inb, target, bws):
        self.assert_message(max_blocks, nb, inb, bws)
        self.assert_hash(max_blocks, target, nb, bws)

    def assert_hash(self, max_blocks: int, target, nb, bws):
        """target: v256; checks digest of block nb (flatsha256_circuit.h:233)."""
        L = self.l
        n = self.bp.kNv32Elts
        x = [[None] * n for _ in range(8)]
        for b in range(max_blocks):
            bt = L.veq(nb, b + 1)
            ebt = L.eval(bt)
            for i in range(8):
                for k in range(n):
                    m = L.mul(ebt, bws[b]["h1"][i][k])
                    x[i][k] = m if b == 0 else L.add(x[i][k], m)
        mm = [None] * 256
        for j in range(8):
            hj = self.bp.unpack_v32(x[j])
            for k in range(32):
                mm[(7 - j) * 32 + k] = hj[k]
        L.vassert_eq(mm, target)

    def find_len_bits(self, max_blocks: int, inb, nb):
        """v64 of the padded message's bit-length field, selected from the
        last 8 bytes of block nb (flatsha256_circuit.h:279-291).  Returns
        the length as an LSB-first 64-bit vector."""
        L = self.l
        len_bits = [L.bit(0) for _ in range(64)]
        for i in range(max_blocks):
            isblk = L.veq(nb, i + 1)
            ind = i * 64 + 63
            for j in range(64):
                len_bits[j] = L.lor_exclusive(
                    len_bits[j], L.land(isblk, inb[ind - j // 8][j % 8]))
        L.vassert_is_bit(len_bits)
        return len_bits

    def assert_zero_padding(self, max_blocks: int, nb, inb):
        L = self.l
        for i in range(max_blocks):
            wantzero = L.vleq(nb, i)
            for j in range(64):
                z = L.veq(inb[i * 64 + j], 0)
                L.assert_implies(wantzero, z)


# ---------------------------------------------------------------------------
# host witness generation (reference flatsha256 witness.cc)
# ---------------------------------------------------------------------------

def _rotr(x, n):
    return ((x >> n) | (x << (32 - n))) & 0xFFFFFFFF


@dataclass
class ShaBlockWitness:
    outw: List[int]  # [48]
    oute: List[int]  # [64]
    outa: List[int]  # [64]
    h1: List[int]    # [8]


def sha256_pad(message: bytes) -> bytes:
    """Standard SHA-256 padding."""
    ml = len(message) * 8
    out = message + b"\x80"
    while len(out) % 64 != 56:
        out += b"\x00"
    return out + ml.to_bytes(8, "big")


def transform_block_witness(H0: Sequence[int], block: bytes) -> ShaBlockWitness:
    w = list(int.from_bytes(block[4 * i : 4 * i + 4], "big") for i in range(16))
    outw = []
    for i in range(16, 64):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append((w[i - 16] + s0 + w[i - 7] + s1) & 0xFFFFFFFF)
        outw.append(w[-1])
    a, b, c, d, e, f, g, h = H0
    oute, outa = [], []
    for t in range(64):
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = ((e & f) ^ ((~e) & g)) & 0xFFFFFFFF
        t1 = (h + S1 + ch + K_SHA256_ROUND[t] + w[t]) & 0xFFFFFFFF
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = ((a & b) ^ (a & c) ^ (b & c)) & 0xFFFFFFFF
        t2 = (S0 + maj) & 0xFFFFFFFF
        h, g, f = g, f, e
        e = (d + t1) & 0xFFFFFFFF
        d, c, b = c, b, a
        a = (t1 + t2) & 0xFFFFFFFF
        oute.append(e)
        outa.append(a)
    h1 = [(x + y) & 0xFFFFFFFF for x, y in zip(H0, [a, b, c, d, e, f, g, h])]
    return ShaBlockWitness(outw=outw, oute=oute, outa=outa, h1=h1)


def message_witness(message: bytes, max_blocks: int):
    """Returns (nb, padded bytes [64*max], block witnesses [max], digest)."""
    padded = sha256_pad(message)
    nb = len(padded) // 64
    assert nb <= max_blocks
    # Dummy blocks past nb keep chaining through h1 over zero data
    # (flatsha256_witness.cc:155-164): the circuit asserts the transform
    # equations for every block, real or padding.
    padded_full = padded + b"\x00" * (64 * (max_blocks - nb))
    H = list(SHA256_INIT)
    bws = []
    digest = None
    for b in range(max_blocks):
        bw = transform_block_witness(H, padded_full[64 * b : 64 * (b + 1)])
        bws.append(bw)
        H = bw.h1
        if b == nb - 1:
            digest = b"".join(x.to_bytes(4, "big") for x in H)
    return nb, padded_full, bws, digest


def pack_block_witness(F, plucker_logn: int, bws: Sequence[ShaBlockWitness]
                       ) -> List:
    """Host field elements in circuit input order for each block witness."""
    enc = BitPluckerEncoder(F, plucker_logn)
    out = []
    for bw in bws:
        for v in bw.outw:
            out.extend(enc.mkpacked_v32(v))
        for i in range(64):
            out.extend(enc.mkpacked_v32(bw.oute[i]))
            out.extend(enc.mkpacked_v32(bw.outa[i]))
        for v in bw.h1:
            out.extend(enc.mkpacked_v32(v))
    return out
