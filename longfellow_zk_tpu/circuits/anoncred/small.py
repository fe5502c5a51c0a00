"""Minimal anonymous-credential circuits ("small" mdoc and ptrcred).

Semantic twins of reference lib/circuits/tests/anoncred/small.h:43-218,
ptrcred.h:37-166 and small_witness.h:43-127: a fixed-layout 183-byte
credential —

    first_name[32] family_name[32] dob[8] gender[1] age_over[7]
    issuerid[4] validfrom[8] validuntil[8] DPKX[32] DPKY[32] ...

— verified by (1) ECDSA of the issuer over SHA-256 of the document,
(2) ECDSA of the embedded device key over the session transcript hash,
(3) date-window memcmp against `now`, (4) DPK consistency (big-endian
bit repack of bytes 100/132), and (5) selective disclosure of
attributes via barrel-shift windows.  PtrCred is the pointer-table
variant (same checks minus the digest==e equation, 3 SHA blocks).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

from ...compiler.components import Memcmp
from ...compiler.logic import Logic
from ...compiler.routing import Routing
from ..ecdsa.verify import EcdsaWitness, VerifyCircuit, compute_witness
from ..sha.sha256 import (
    FlatSHA256Circuit, message_witness, pack_block_witness)

K_DATE_LEN = 8  # small_io.h:21


@dataclass
class OpenedAttribute:
    """(small.h:101-112): byte offset, length, expected value."""

    ind: list = None  # v8
    len: list = None  # v8
    v1: list = None   # 32 x v8

    @staticmethod
    def input(L: Logic) -> "OpenedAttribute":
        return OpenedAttribute(ind=L.vinput(8), len=L.vinput(8),
                               v1=[L.vinput(8) for _ in range(32)])


class _CredWitnessWires:
    """(small.h Witness::input)."""

    def __init__(self, L: Logic, sha: FlatSHA256Circuit, max_blocks: int,
                 kbits: int):
        self.e = L.eltw_input()
        self.dpkx = L.eltw_input()
        self.dpky = L.eltw_input()
        self.sig = EcdsaWitness(L, kbits)
        self.dpk_sig = EcdsaWitness(L, kbits)
        self.nb = L.vinput(8)
        self.inb = [L.vinput(8) for _ in range(64 * max_blocks)]
        self.sig_sha = [sha.block_witness_input() for _ in range(max_blocks)]


class _CredBase:
    kMaxSHABlocks = 7

    def __init__(self, l: Logic, ec, order: int, plucker_logn: int = 4):
        self.l = l
        self.ec = ec
        self.order = order
        self.sha = FlatSHA256Circuit(l, plucker_logn)
        self.r = Routing(l)
        self.kMaxMsoLen = self.kMaxSHABlocks * 64 - 9

    def witness_input(self) -> _CredWitnessWires:
        return _CredWitnessWires(self.l, self.sha, self.kMaxSHABlocks,
                                 self.ec.kBits)

    def assert_credential(self, pkX, pkY, hash_tr,
                          oas: List[OpenedAttribute], now: List,
                          vw: _CredWitnessWires) -> None:
        L = self.l
        ecc = VerifyCircuit(L, self.ec)

        ecc.verify_signature3(pkX, pkY, vw.e, vw.sig)
        ecc.verify_signature3(vw.dpkx, vw.dpky, hash_tr, vw.dpk_sig)
        self.sha.assert_message(self.kMaxSHABlocks, vw.nb, vw.inb,
                                vw.sig_sha)
        self._assert_hash(vw)

        cmp = Memcmp(L)
        # validFrom <= now <= validUntil
        L.assert1(cmp.leq(vw.inb[84 : 84 + K_DATE_LEN], now))
        L.assert1(cmp.leq(now, vw.inb[92 : 92 + K_DATE_LEN]))

        L.assert_eq_elt(self._repack(vw.inb, 100), vw.dpkx)
        L.assert_eq_elt(self._repack(vw.inb, 132), vw.dpky)

        zz = L.bits(8, 0xFF)  # cannot appear in strings
        for oa in oas:
            buf = self.r.shift(oa.ind, 32, vw.inb[: self.kMaxMsoLen], zz,
                               unroll=3)
            self._assert_attribute(32, oa.len, buf, oa.v1)

    def _assert_hash(self, vw) -> None:
        """Overridden by Small; PtrCred omits the digest==e equation."""

    def _assert_attribute(self, maxlen: int, vlen, got, want) -> None:
        L = self.l
        for j in range(maxlen):
            ll = L.vlt(L.bits(8, j), vlen)
            L.assert_implies(ll, L.veq(got[j], want[j]))

    def _repack(self, inb, ind: int):
        """32 bytes at `ind`, big-endian bits -> one field element
        (small.h:188-199)."""
        L = self.l
        h = L.konst(0)
        base = L.konst(2)
        for i in range(32):
            for j in range(8):
                t = L.mul(h, base)
                h = L.add(L.eval(inb[ind + i][7 - j]), t)
        return h


class Small(_CredBase):
    """(small.h:43-218): full credential check incl. digest == e."""

    kMaxSHABlocks = 7

    def _assert_hash(self, vw) -> None:
        # mux the packed h1 of block nb, unpack, repack big-endian
        # (small.h:165-186 assert_hash + repack32)
        L = self.l
        n = self.sha.bp.kNv32Elts
        x = [[None] * n for _ in range(8)]
        for b in range(self.kMaxSHABlocks):
            ebt = L.eval(L.veq(vw.nb, b + 1))
            for i in range(8):
                for k in range(n):
                    m = L.mul(ebt, vw.sig_sha[b]["h1"][i][k])
                    x[i][k] = m if b == 0 else L.add(x[i][k], m)
        F = L.F
        h = L.konst(0)
        twok = F.of_scalar(1)
        for j in range(7, -1, -1):
            hj = self.sha.bp.unpack_v32(x[j])
            for k in range(32):
                h = L.bk.axpy(h, twok, L.eval(hj[k]))
                twok = F.add_i(twok, twok)
        L.assert_eq_elt(h, vw.e)


class PtrCred(_CredBase):
    """(ptrcred.h:37-166): pointer-table credential, 3 SHA blocks."""

    kMaxSHABlocks = 3


class SmallWitness:
    """Host witness builder (small_witness.h:43-127)."""

    def __init__(self, ec, F, max_blocks: int = 7, plucker_logn: int = 4):
        self.ec = ec
        self.F = F
        self.max_blocks = max_blocks
        self.plucker_logn = plucker_logn

    def compute_witness(self, pkx: int, pky: int, mdoc: bytes,
                        transcript: bytes, r: int, s: int, dr: int,
                        ds: int):
        import hashlib

        self.e = int.from_bytes(hashlib.sha256(mdoc).digest(), "big") \
            % self.ec.order
        self.ew = compute_witness(self.ec, pkx, pky, self.e, r, s)
        self.e2 = int.from_bytes(hashlib.sha256(transcript).digest(),
                                 "big") % self.ec.order
        self.dpkx = int.from_bytes(mdoc[100:132], "big")
        self.dpky = int.from_bytes(mdoc[132:164], "big")
        self.dkw = compute_witness(self.ec, self.dpkx, self.dpky, self.e2,
                                   dr, ds)
        self.nb, self.signed_bytes, self.bws, _ = message_witness(
            mdoc, self.max_blocks)

    def fill(self) -> List[int]:
        F = self.F
        out = [self.e % F.p, self.dpkx, self.dpky]
        out.extend(self.ew.fill())
        out.extend(self.dkw.fill())
        out.extend(F.of_scalar((self.nb >> i) & 1) for i in range(8))
        for byte in self.signed_bytes:
            out.extend(F.of_scalar((byte >> i) & 1) for i in range(8))
        out.extend(pack_block_witness(F, self.plucker_logn, self.bws))
        return out
