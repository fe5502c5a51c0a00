"""ZK verifier (reference lib/zk/zk_verifier.h:40-107)."""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..ligero.param import LigeroParam
from ..ligero.verifier import LigeroVerifier
from ..sumcheck.circuit import Circuit
from .common import (
    HASH_OF_A,
    initialize_sumcheck_fiat_shamir,
    pad_size,
    setup_lqc,
    verifier_constraints,
)
from .proof import ZkProof


class ZkVerifier:
    def __init__(self, circ: Circuit, F, rs_factory, rate: int, nreq: int,
                 block_enc: Optional[int] = None):
        self.circ = circ
        self.F = F
        self.n_witness = circ.ninputs - circ.npub_in
        self.param = LigeroParam(
            nw=self.n_witness + pad_size(circ), nq=circ.nl, rateinv=rate,
            nreq=nreq, block_enc=block_enc,
            subfield_bytes=F.kSubFieldBytes, field_bytes=F.kBytes)
        self.lqc = setup_lqc(circ, self.n_witness)
        self.rs_factory = rs_factory
        self.lv = LigeroVerifier(self.param, F, rs_factory)

    def recv_commitment(self, zkp: ZkProof, ts) -> None:
        self.lv.receive_commitment(zkp.com, ts)

    def verify(self, zkp: ZkProof, pub: List, ts) -> Tuple[bool, str]:
        c, F = self.circ, self.F
        initialize_sumcheck_fiat_shamir(ts, c, pub, F)
        a, b, ci = verifier_constraints(c, pub, zkp.proof, None, ts,
                                        self.n_witness, F)
        return self.lv.verify(zkp.com, zkp.com_proof, ts, ci, a, HASH_OF_A,
                              b, self.lqc)
