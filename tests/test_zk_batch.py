"""Batched proving (zk/batch.py): each proof in a batch must be
bit-identical to the scalar fused prover run with the same transcript
tag and the same randomness stream."""

import random

import pytest

from longfellow_zk_tpu.compiler.logic import CompilerBackend, Logic
from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit
from longfellow_zk_tpu.fields.fp_instances import (
    fp128,
    P128_OMEGA,
    P128_OMEGA_ORDER,
)
from longfellow_zk_tpu.random_oracle.engine import DeterministicEngine
from longfellow_zk_tpu.random_oracle.transcript import Transcript
from longfellow_zk_tpu.zk.batch import BatchZkProver
from longfellow_zk_tpu.zk.proof import ZkProof
from longfellow_zk_tpu.zk.prover import ZkProver
from longfellow_zk_tpu.zk.serialization import read_zk_proof, write_zk_proof
from longfellow_zk_tpu.zk.testing import rs_factory_for, K_VERSION
from longfellow_zk_tpu.zk.verifier import ZkVerifier

RATE, NREQ, B = 4, 8, 3


def _circuit(F):
    qc = QuadCircuit(F)
    bk = CompilerBackend(qc)
    L = Logic(bk, F)
    pub = L.eltw_input()
    qc.private_input()
    x = L.eltw_input()
    y = L.eltw_input()
    L.assert0_elt(L.add(pub, L.mul(L.mul(x, y), x)))
    return qc.mkcircuit(nc=1)


@pytest.mark.slow
def test_batch_prove_matches_scalar_and_verifies():
    F = fp128()
    circ = _circuit(F)
    factory = rs_factory_for(F, omega=P128_OMEGA,
                             omega_order=P128_OMEGA_ORDER)
    rng = random.Random(17)
    W_list = []
    for _ in range(B):
        a, b = rng.randrange(F.p), rng.randrange(F.p)
        pubv = F.neg_i(F.mul_i(F.mul_i(a, b), a))
        W_list.append([F.of_scalar(1), pubv, a, b])

    def tags():
        return [Transcript(b"batch%d" % i, version=K_VERSION)
                for i in range(B)]

    # scalar fused proofs, one shared deterministic randomness stream
    eng = DeterministicEngine()
    want = []
    for i, W in enumerate(W_list):
        zkp = ZkProof(rate=RATE, nreq=NREQ)
        pr = ZkProver(circ, F, factory, rate=RATE, nreq=NREQ)
        tp = Transcript(b"batch%d" % i, version=K_VERSION)
        pr.commit(zkp, W, tp, eng)
        assert pr.prove(zkp, W, tp)
        want.append(write_zk_proof(zkp, circ, pr.param, F))

    # batched proofs with an identical randomness stream
    bp = BatchZkProver(circ, F, factory, rate=RATE, nreq=NREQ)
    got = bp.prove_batch(W_list, tags(), DeterministicEngine())
    assert got == want, "batched proofs differ from scalar proofs"

    # and each verifies
    for i, data in enumerate(got):
        zkp2 = read_zk_proof(data, circ, bp.param, F, RATE, NREQ)
        verifier = ZkVerifier(circ, F, factory, rate=RATE, nreq=NREQ)
        tv = Transcript(b"batch%d" % i, version=K_VERSION)
        verifier.recv_commitment(zkp2, tv)
        ok, why = verifier.verify(zkp2, W_list[i][: circ.npub_in], tv)
        assert ok, why


@pytest.mark.slow
def test_phased_batch_matches_scalar_phased(monkeypatch):
    """Large circuits route through the phased batch (4 launches); its
    proof bytes must match B scalar _prove_phased runs.  Forced here by
    shrinking the fuse threshold."""
    monkeypatch.setattr(ZkProver, "K_ZKFUSE_TERM_LIMIT", 0)
    F = fp128()
    circ = _circuit(F)
    factory = rs_factory_for(F, omega=P128_OMEGA,
                             omega_order=P128_OMEGA_ORDER)
    rng = random.Random(23)
    W_list = []
    for _ in range(B):
        a, b = rng.randrange(F.p), rng.randrange(F.p)
        pubv = F.neg_i(F.mul_i(F.mul_i(a, b), a))
        W_list.append([F.of_scalar(1), pubv, a, b])

    eng = DeterministicEngine()
    want = []
    for i, W in enumerate(W_list):
        zkp = ZkProof(rate=RATE, nreq=NREQ)
        pr = ZkProver(circ, F, factory, rate=RATE, nreq=NREQ)
        tp = Transcript(b"pbatch%d" % i, version=K_VERSION)
        pr.commit(zkp, W, tp, eng)
        assert pr._prove_phased(zkp, W, tp)
        want.append(write_zk_proof(zkp, circ, pr.param, F))

    bp = BatchZkProver(circ, F, factory, rate=RATE, nreq=NREQ)
    tags = [Transcript(b"pbatch%d" % i, version=K_VERSION)
            for i in range(B)]
    got = bp.prove_batch(W_list, tags, DeterministicEngine())
    assert got == want, "phased batch differs from scalar phased"

    for i, data in enumerate(got):
        zkp2 = read_zk_proof(data, circ, bp.param, F, RATE, NREQ)
        verifier = ZkVerifier(circ, F, factory, rate=RATE, nreq=NREQ)
        tv = Transcript(b"pbatch%d" % i, version=K_VERSION)
        verifier.recv_commitment(zkp2, tv)
        ok, why = verifier.verify(zkp2, W_list[i][: circ.npub_in], tv)
        assert ok, why
