"""MdocSignature: the two-ECDSA + MAC circuit over the P-256 base field.

Semantic twin of reference lib/circuits/mdoc/mdoc_signature.h:25-143:
  1. a signature (r, s) on the committed MSO digest e under the issuer
     public key (pkX, pkY);
  2. a signature on the public transcript hash under the committed
     device public key (dpkx, dpky) taken from the MSO;
  3. MACs binding e, dpkx, dpky to the GF(2^128) hash circuit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

from ...compiler.logic import Logic
from ..ecdsa.verify import EcdsaWitness, VerifyCircuit
from ..mac.mac import MAC
from .constants import K_MAC_PLUCKER_BITS


@dataclass
class MdocSignatureWitnessW:
    """Circuit wires (mdoc_signature.h:53-74)."""

    e: object = None
    dpkx: object = None
    dpky: object = None
    mdoc_sig: EcdsaWitness = None
    dpk_sig: EcdsaWitness = None
    macs: List = None  # [3] MAC witness dicts

    def input(self, L: Logic, kbits: int, mac: MAC):
        self.e = L.eltw_input()
        self.dpkx = L.eltw_input()
        self.dpky = L.eltw_input()
        self.mdoc_sig = EcdsaWitness(L, kbits)
        self.dpk_sig = EcdsaWitness(L, kbits)
        self.macs = [mac.witness_input() for _ in range(3)]


class MdocSignature:
    def __init__(self, lc: Logic, ec, order: int):
        self.lc = lc
        self.ec = ec
        self.order = order
        self.ecdsa = VerifyCircuit(lc, ec)
        self.mac = MAC(lc, K_MAC_PLUCKER_BITS)

    def assert_signatures(self, pkX, pkY, hash_tr, mac_e, mac_dpkX, mac_dpkY,
                          a_v, vw: MdocSignatureWitnessW) -> None:
        """(mdoc_signature.h:89-103).  mac_*: [2] v128; a_v: v128."""
        self.ecdsa.verify_signature3(pkX, pkY, vw.e, vw.mdoc_sig)
        self.ecdsa.verify_signature3(vw.dpkx, vw.dpky, hash_tr, vw.dpk_sig)
        self.mac.verify_mac(vw.e, mac_e, a_v, vw.macs[0], self.order)
        self.mac.verify_mac(vw.dpkx, mac_dpkX, a_v, vw.macs[1], self.order)
        self.mac.verify_mac(vw.dpky, mac_dpkY, a_v, vw.macs[2], self.order)
