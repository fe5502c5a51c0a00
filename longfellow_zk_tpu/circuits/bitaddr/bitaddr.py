"""Bitcoin P2PKH address preimage circuit.

Semantic twin of reference lib/circuits/tests/pq/bitaddr/bitaddr.h:
30-250 and bitaddr_witness.h: proves knowledge of a secret key sk such
that address == RIPEMD160(SHA256(compressed(sk * G))) over secp256k1
(the Hash160 of the compressed public key; the Base58Check version byte
and checksum are public post-processing).  Composes Ecpk + FlatSHA256 +
Ripemd160 over the secp256k1 base field.
"""

from __future__ import annotations

import hashlib
from typing import List

from ...compiler.logic import Logic
from ...ec.curves import EllipticCurve
from ..ecdsa.pk import Ecpk, EcpkWitness, compute_pk_witness, fill_pk_witness
from ..ripemd.circuit import Ripemd160Circuit
from ..ripemd.reference import ripemd160
from ..ripemd import witness as ripemd_witness
from ..sha.sha256 import (
    FlatSHA256Circuit, message_witness, pack_block_witness)

K_PLUCKER_LOGN = 2  # bitaddr.h uses BitPlucker<2>


class _BitaddrWitnessWires:
    def __init__(self, L: Logic, sha: FlatSHA256Circuit,
                 rc: Ripemd160Circuit, kbits: int):
        self.ecpk = EcpkWitness(L, kbits)
        self.pk_x = L.eltw_input()
        self.pk_y = L.eltw_input()
        self.pk_x_bits = L.vinput(kbits)
        self.pk_y_bits = L.vinput(kbits)
        self.sha = sha.block_witness_input()
        self.ripemd = rc.block_witness_input()


class BitaddrCircuit:
    def __init__(self, lc: Logic, ec: EllipticCurve):
        self.l = lc
        self.ec = ec
        self.ecpk = Ecpk(lc, ec)
        self.sha = FlatSHA256Circuit(lc, K_PLUCKER_LOGN)
        self.ripemd = Ripemd160Circuit(lc, K_PLUCKER_LOGN)

    def witness_input(self) -> _BitaddrWitnessWires:
        return _BitaddrWitnessWires(self.l, self.sha, self.ripemd,
                                    self.ec.kBits)

    def _as_scalar_large(self, v: List) -> object:
        """LE bit pack without the 64-bit as_scalar limit
        (bitaddr.h:126-137)."""
        L, F = self.l, self.l.F
        r = L.konst(0)
        p = F.of_scalar(1)
        for b in v:
            r = L.bk.axpy(r, p, L.eval(b))
            p = F.add_i(p, p)
        return r

    def assert_bitaddr(self, addr_elt, w: _BitaddrWitnessWires) -> None:
        L = self.l
        kbits = self.ec.kBits

        self.ecpk.assert_public_key(w.pk_x, w.pk_y, w.ecpk)
        L.assert_eq_elt(w.pk_x, self._as_scalar_large(w.pk_x_bits))
        L.assert_eq_elt(w.pk_y, self._as_scalar_large(w.pk_y_bits))

        # SHA input: [02|03 prefix][pk_x big-endian], padded to 1 block
        zero8 = L.bits(8, 0)
        sha_in = [zero8] * 64
        prefix = [w.pk_y_bits[0], L.bit(1)] + [L.bit(0)] * 6
        sha_in[0] = prefix
        for i in range(32):
            byte_idx = 31 - i
            sha_in[1 + i] = [w.pk_x_bits[byte_idx * 8 + b] for b in range(8)]
        sha_in[33] = L.bits(8, 0x80)
        sha_in[62] = L.bits(8, 1)   # 264-bit length, big-endian
        sha_in[63] = L.bits(8, 8)

        nb = L.bits(8, 1)
        self.sha.assert_message(1, nb, sha_in, [w.sha])

        # RIPEMD input: the 32 SHA digest bytes (big-endian words)
        ripemd_in = [zero8] * 64
        for i in range(8):
            word = self.sha.bp.unpack_v32(w.sha["h1"][i])
            for k in range(4):
                ripemd_in[4 * i + k] = [word[8 * (3 - k) + b]
                                        for b in range(8)]
        ripemd_in[32] = L.bits(8, 0x80)
        ripemd_in[57] = L.bits(8, 1)  # 256-bit length, little-endian

        self.ripemd.assert_message(1, nb, ripemd_in, [w.ripemd])

        # Hash160 as one scalar, big-endian numeric value (bitaddr.h:218)
        hash_bits = []
        for i in range(4, -1, -1):
            word = self.ripemd.bp.unpack_v32(w.ripemd["h_out"][i])
            for b in range(3, -1, -1):
                hash_bits.extend(word[8 * b : 8 * b + 8])
        L.assert_eq_elt(addr_elt, self._as_scalar_large(hash_bits))


class BitaddrWitness:
    """Host witness (bitaddr_witness.h)."""

    def __init__(self, ec: EllipticCurve, F):
        self.ec = ec
        self.F = F

    def compute_witness(self, sk: int):
        ec = self.ec
        pk = ec.normalize(ec.scalar_mult(ec.generator(), sk))
        self.pkx, self.pky = int(pk.x), int(pk.y)
        self.ecpk_w = compute_pk_witness(ec, sk)
        compressed = bytes([2 + (self.pky & 1)]) + \
            self.pkx.to_bytes(32, "big")
        _, _, sha_bws, sha_digest = message_witness(compressed, 1)
        self.sha_bw = sha_bws[0]
        self.sha_digest = sha_digest
        self.ripemd_traces = ripemd_witness.compute_witness(sha_digest, 1)
        self.addr = int.from_bytes(ripemd160(sha_digest), "big")

    def fill(self) -> List:
        F = self.F
        out = fill_pk_witness(F, self.ecpk_w)
        out.append(self.pkx)
        out.append(self.pky)
        out.extend(F.of_scalar((self.pkx >> i) & 1) for i in range(256))
        out.extend(F.of_scalar((self.pky >> i) & 1) for i in range(256))
        out.extend(pack_block_witness(F, K_PLUCKER_LOGN, [self.sha_bw]))
        out.extend(ripemd_witness.fill_witness(F, self.ripemd_traces,
                                               K_PLUCKER_LOGN))
        return out
