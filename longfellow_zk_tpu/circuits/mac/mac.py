"""MAC circuits binding values across the two proof fields.

Semantic twin of reference lib/circuits/mac/{mac_reference.h,
mac_circuit.h, mac_witness.h}: mac_i = (a_v + a_p_i) * m_i over
GF(2^128), where the verifier contributes one a_v and the prover commits
a_p_i.  Used to glue outputs of the P-256 signature circuit to inputs of
the GF(2^128) hash circuit in the mdoc composition.
"""

from __future__ import annotations

from typing import List, Sequence

from ...compiler.components import BitPlucker, BitPluckerEncoder
from ...compiler.logic import Logic
from ...fields.gf2 import GF2_128, gf_mul_int

K_MAC_PLUCKER_BITS = 2


class MACReference:
    """Host MAC computation (mac_reference.h:29-55)."""

    def __init__(self):
        self.gf = GF2_128()

    def sample(self, n: int, rng) -> List[int]:
        buf = rng.bytes(n * 16)
        return [int.from_bytes(buf[16 * i : 16 * (i + 1)], "little")
                for i in range(n)]

    def compute(self, av: int, ap: Sequence[int], msg: bytes) -> List[int]:
        """MAC of a 32-byte message as two GF(2^128) elements."""
        assert len(msg) == 32
        out = []
        for i in range(2):
            m = int.from_bytes(msg[16 * i : 16 * (i + 1)], "little")
            out.append(gf_mul_int(av ^ ap[i], m))
        return out


class MAC:
    """MAC verification simulated over a prime field (mac_circuit.h:57-137).

    The witness commits a_p (2 x 128 bits) and the 256 message bits, all
    bit-plucked; the circuit recomputes the GF(2^128) products in-wire.
    """

    def __init__(self, lc: Logic, plucker_logn: int = K_MAC_PLUCKER_BITS):
        self.lc = lc
        self.bp = BitPlucker(lc, plucker_logn)
        self.n128 = (128 + plucker_logn - 1) // plucker_logn
        self.n256 = (256 + plucker_logn - 1) // plucker_logn

    def witness_input(self):
        lc = self.lc
        return dict(
            aa=[[lc.eltw_input() for _ in range(self.n128)] for _ in range(2)],
            xx=[lc.eltw_input() for _ in range(self.n256)],
        )

    def verify_mac(self, msg, mac, av, vw, order: int) -> None:
        """msg: EltW holding the 256-bit value; mac/av: v128 bit vectors;
        order: field-overflow bound (mac_circuit.h:86-95)."""
        lc, F = self.lc, self.lc.F
        x = self.bp.unpack(vw["xx"], 256)
        msg0, msg1 = x[:128], x[128:]
        # range check vs order
        bits_n = [lc.bit((order >> i) & 1) for i in range(256)]
        lc.assert1(lc.vlt(x, bits_n))
        # check sum_i x_i 2^i == msg
        te = lc.konst(0)
        twok = F.of_scalar(1)
        for i in range(256):
            te = lc.bk.axpy(te, twok, lc.eval(x[i]))
            twok = F.add_i(twok, twok)
        lc.assert_eq_elt(te, msg)
        self._assert_mac(mac, av, [msg0, msg1], vw)

    def _assert_mac(self, mac, av, xi, vw) -> None:
        lc = self.lc
        for i in range(2):
            ap = self.bp.unpack(vw["aa"][i], 128)
            key = lc.vxor(av, ap)
            mv = lc.gf2_128_mul(key, xi[i])
            lc.vassert_eq(mac[i], mv)


class MACGF2:
    """MAC verification in the native GF(2^128) field
    (mac_circuit.h:141-192)."""

    def __init__(self, lc: Logic):
        self.lc = lc

    def witness_input(self):
        lc = self.lc
        return dict(aa=[lc.eltw_input(), lc.eltw_input()])

    def verify_mac(self, mac, av, msg_bits, vw) -> None:
        """mac/av: EltW; msg_bits: 256 BitW."""
        lc = self.lc
        for i in range(2):
            mm = self._pack(msg_bits[128 * i : 128 * (i + 1)])
            key = lc.add(av, vw["aa"][i])
            lc.assert_eq_elt(mac[i], lc.mul(key, mm))

    def _pack(self, bits):
        lc, F = self.lc, self.lc.F
        xi = 1
        m = lc.konst(0)
        for i in range(128):
            m = lc.bk.axpy(m, xi, lc.eval(bits[i]))
            xi = gf_mul_int(xi, 0b10)
        return m


def fill_gf2k_bits(m: int, nbits: int = 128) -> List[int]:
    """GF(2^128) element -> bit list (mac_reference.h fill_gf2k)."""
    return [(m >> i) & 1 for i in range(nbits)]


def mac_witness_values(F, plucker_logn: int, ap: Sequence[int],
                       value: int) -> List[int]:
    """Host witness for MAC.Witness over a prime field: packed a_p bits
    then packed 256 message bits (mac_witness.h)."""
    enc = BitPluckerEncoder(F, plucker_logn)
    n128 = (128 + plucker_logn - 1) // plucker_logn
    n256 = (256 + plucker_logn - 1) // plucker_logn
    out = []
    for i in range(2):
        out.extend(enc.pack_bits(fill_gf2k_bits(ap[i]), n128))
    out.extend(enc.pack_bits([(value >> i) & 1 for i in range(256)], n256))
    return out
