"""JWT+KB (SD-JWT style) verification circuit and witness.

Semantic twin of reference lib/circuits/tests/jwt/{jwt.h:42-190,
jwt_witness.h:29-323, jwt_constants.h}: verifies an ES256-signed
`header.payload.signature~kb` token — the issuer signature over the
SHA-256 of `header.payload`, the key-binding signature under the device
key published in the payload's cnf claim, in-circuit base64url decoding
of the payload, and substring assertions for the opened attributes.
"""

from __future__ import annotations

import base64
import hashlib
from dataclasses import dataclass
from typing import List, Tuple

from ...compiler.components import BitPluckerEncoder
from ...compiler.logic import Logic
from ...compiler.routing import Routing
from ..base64.decode import Base64Decoder
from ..ecdsa.verify import EcdsaWitness, VerifyCircuit, compute_witness
from ..sha.sha256 import FlatSHA256Circuit
from ..mdoc.witness import transform_and_witness_message

K_SHA_JWT_PLUCKER_BITS = 4
K_JWT_INDEX_BITS = 10


@dataclass
class OpenedAttribute:
    """(jwt_witness.h:37-41)."""

    id: bytes = b""
    value: bytes = b""

    def pattern(self) -> bytes:
        return b'"' + self.id + b'":"' + self.value + b'"'


class JwtOpenedAttributeW:
    """Public pattern wires (jwt.h:60-70)."""

    def __init__(self, L: Logic):
        self.pattern = [L.vinput(8) for _ in range(128)]
        self.len = L.vinput(8)


class JwtWitnessW:
    """(jwt.h:72-106)."""

    def __init__(self, L: Logic, sha: FlatSHA256Circuit, max_blocks: int,
                 na: int, kbits: int):
        self.e = L.eltw_input()
        self.dpkx = L.eltw_input()
        self.dpky = L.eltw_input()
        self.jwt_sig = EcdsaWitness(L, kbits)
        self.kb_sig = EcdsaWitness(L, kbits)
        self.preimage = [L.vinput(8) for _ in range(64 * max_blocks)]
        self.e_bits = L.vinput(256)
        self.sha = [sha.block_witness_input() for _ in range(max_blocks)]
        self.nb = L.vinput(8)
        self.attr_ind = [L.vinput(K_JWT_INDEX_BITS) for _ in range(na)]
        self.payload_ind = L.vinput(K_JWT_INDEX_BITS)
        self.payload_len = L.vinput(K_JWT_INDEX_BITS)


class JWT:
    def __init__(self, lc: Logic, ec, order: int, max_blocks: int):
        assert (1 << K_JWT_INDEX_BITS) > max_blocks * 64 - 9, \
            "JWT index bits too small"
        self.lc = lc
        self.ec = ec
        self.order = order
        self.max_blocks = max_blocks
        self.sha = FlatSHA256Circuit(lc, plucker_logn=K_SHA_JWT_PLUCKER_BITS)
        self.r = Routing(lc)

    def assert_jwt_attributes(self, pkX, pkY, e2,
                              oa: List[JwtOpenedAttributeW],
                              vw: JwtWitnessW) -> None:
        """(jwt.h:110-171)."""
        L = self.lc
        maxb = self.max_blocks
        ecc = VerifyCircuit(L, self.ec)
        ecc.verify_signature3(pkX, pkY, vw.e, vw.jwt_sig)
        ecc.verify_signature3(vw.dpkx, vw.dpky, e2, vw.kb_sig)

        self.sha.assert_message_hash(maxb, vw.nb, vw.preimage, vw.e_bits,
                                     vw.sha)
        L.vassert_is_bit(vw.e_bits)

        # e_bits must equal the e used in the issuer signature
        F = L.F
        est = L.konst(0)
        twok = F.of_scalar(1)
        for i in range(256):
            est = L.bk.axpy(est, twok, L.eval(vw.e_bits[i]))
            twok = F.add_i(twok, twok)
        L.assert_eq_elt(est, vw.e)

        zz = L.bits(8, 0)
        # shift the payload to the front, decode, then per-attribute
        # shift + pattern compare
        shift_buf = self.r.shift(vw.payload_ind, 64 * (maxb - 2),
                                 vw.preimage, zz, unroll=3)
        b64 = Base64Decoder(L)
        dec_buf = b64.base64_rawurl_decode_len(
            shift_buf, vw.payload_len, 64 * (maxb - 2))

        for i, a in enumerate(oa):
            B = self.r.shift(vw.attr_ind[i], 128, dec_buf, zz, unroll=3)
            self._assert_string_eq(128, a.len, B, a.pattern)

    def _assert_string_eq(self, maxn: int, ln, got, want) -> None:
        L = self.lc
        for j in range(maxn):
            ll = L.vlt(L.bits(8, j), ln)
            same = L.eq_reduce(
                [b for b in got[j]], [b for b in want[j]])
            L.assert_implies(ll, same)


# ---------------------------------------------------------------------------
# host witness (jwt_witness.h:70-323)
# ---------------------------------------------------------------------------

def _b64url_decode(s: str) -> bytes:
    pad = "=" * (-len(s) % 4)
    return base64.urlsafe_b64decode(s + pad)


class JWTWitness:
    def __init__(self, ec, max_blocks: int):
        self.ec = ec
        self.max_blocks = max_blocks

    def _parse_jws(self, token: str):
        dot = token.index(".")
        dot2 = token.index(".", dot + 1)
        msg = token[:dot2]
        payload = token[dot + 1 : dot2]
        sig = token[dot2 + 1 :]
        e = int.from_bytes(hashlib.sha256(msg.encode()).digest(), "big")
        sigb = _b64url_decode(sig)
        assert len(sigb) >= 64
        r = int.from_bytes(sigb[:32], "big")
        s = int.from_bytes(sigb[32:64], "big")
        return dict(msg=msg, payload=payload, payload_ind=dot + 1,
                    payload_len=len(payload), e=e, r=r, s=s)

    def compute_witness(self, jwt: str, pkx: int, pky: int,
                        attrs: List[OpenedAttribute]) -> None:
        tilde = jwt.index("~")
        idt, kb = jwt[:tilde], jwt[tilde + 1 :]
        idj = self._parse_jws(idt)
        assert len(idj["msg"]) <= self.max_blocks * 64 - 9
        self.numb, self.preimage, self.sha_bw = \
            transform_and_witness_message(idj["msg"].encode(),
                                          self.max_blocks)
        self.e = idj["e"]
        self.payload_ind = idj["payload_ind"]
        self.payload_len = idj["payload_len"]
        self.sig = compute_witness(self.ec, pkx, pky, idj["e"], idj["r"],
                                   idj["s"])

        payload = _b64url_decode(idj["payload"])
        self.attr_ind = []
        for a in attrs:
            ind = payload.find(a.pattern())
            assert ind >= 0, "attribute not found"
            self.attr_ind.append(ind)

        cnf = b'"cnf":{"jwk":{"kty":"EC","crv":"P-256","x":"'
        x_ind = payload.find(cnf)
        assert x_ind >= 0, "device key not found"
        y_ind = payload.find(b'","y":"', x_ind + len(cnf))
        x = payload[x_ind + len(cnf) : x_ind + len(cnf) + 43]
        y = payload[y_ind + 7 : y_ind + 7 + 43]
        self.dpkx = int.from_bytes(_b64url_decode(x.decode()), "big")
        self.dpky = int.from_bytes(_b64url_decode(y.decode()), "big")

        kbj = self._parse_jws(kb)
        self.e2 = kbj["e"]
        self.kb_sig = compute_witness(self.ec, self.dpkx, self.dpky,
                                      kbj["e"], kbj["r"], kbj["s"])

    def fill_witness(self, F) -> List[int]:
        """(jwt_witness.h:143-172): wire values in circuit input order."""
        enc = BitPluckerEncoder(F, K_SHA_JWT_PLUCKER_BITS)
        out = [self.e % F.p, self.dpkx % F.p, self.dpky % F.p]
        out.extend(self.sig.fill())
        out.extend(self.kb_sig.fill())
        for i in range(64 * self.max_blocks):
            b = self.preimage[i]
            out.extend(F.of_scalar((b >> k) & 1) for k in range(8))
        for i in range(256):
            out.append(F.of_scalar((self.e >> i) & 1))
        for bw in self.sha_bw:
            for v in bw.outw:
                out.extend(enc.mkpacked_v32(v))
            for k in range(64):
                out.extend(enc.mkpacked_v32(bw.oute[k]))
                out.extend(enc.mkpacked_v32(bw.outa[k]))
            for v in bw.h1:
                out.extend(enc.mkpacked_v32(v))
        out.extend(F.of_scalar((self.numb >> k) & 1) for k in range(8))
        for ind in self.attr_ind:
            out.extend(F.of_scalar((ind >> k) & 1)
                       for k in range(K_JWT_INDEX_BITS))
        out.extend(F.of_scalar((self.payload_ind >> k) & 1)
                   for k in range(K_JWT_INDEX_BITS))
        out.extend(F.of_scalar((self.payload_len >> k) & 1)
                   for k in range(K_JWT_INDEX_BITS))
        return out


def fill_attribute_public(F, attr: OpenedAttribute) -> List[int]:
    """Public pattern wires (jwt_witness.h:44-66)."""
    vbuf = attr.pattern()
    assert len(vbuf) <= 128
    out = []
    for i in range(128):
        b = vbuf[i] if i < len(vbuf) else 0
        out.extend(F.of_scalar((b >> k) & 1) for k in range(8))
    out.extend(F.of_scalar((len(vbuf) >> k) & 1) for k in range(8))
    return out
