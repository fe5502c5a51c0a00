"""The one-program fused prove (zk/fused.py) must be byte-identical to
the multi-program phased flow — same FS stream, same proof bytes — and
the resulting proofs must verify."""

import random

import pytest

from longfellow_zk_tpu.compiler.logic import CompilerBackend, Logic
from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit
from longfellow_zk_tpu.fields.fp_instances import (
    fp128,
    P128_OMEGA,
    P128_OMEGA_ORDER,
)
from longfellow_zk_tpu.fields.gf2 import gf2_128
from longfellow_zk_tpu.random_oracle.engine import DeterministicEngine
from longfellow_zk_tpu.random_oracle.transcript import Transcript
from longfellow_zk_tpu.zk.proof import ZkProof
from longfellow_zk_tpu.zk.prover import ZkProver
from longfellow_zk_tpu.zk.serialization import write_zk_proof
from longfellow_zk_tpu.zk.testing import rs_factory_for, K_VERSION
from longfellow_zk_tpu.zk.verifier import ZkVerifier

RATE, NREQ = 4, 8


def _circuit(F):
    qc = QuadCircuit(F)
    bk = CompilerBackend(qc)
    L = Logic(bk, F)
    pub = L.eltw_input()
    qc.private_input()
    x = L.eltw_input()
    y = L.eltw_input()
    z = L.mul(x, y)
    w = L.mul(z, x)       # two layers of structure
    L.assert0_elt(L.add(pub, w))
    return qc.mkcircuit(nc=1)


def _witness(F, circ, seed):
    rng = random.Random(seed)
    if F.kCharacteristicTwo:
        a, b = rng.getrandbits(128), rng.getrandbits(128)
    else:
        a, b = rng.randrange(F.p), rng.randrange(F.p)
    w = F.mul_i(F.mul_i(a, b), a)
    pubv = F.neg_i(w)
    return [F.of_scalar(1), pubv, a, b]


def _rs(F):
    if F.kCharacteristicTwo:
        return rs_factory_for(F)
    return rs_factory_for(F, omega=P128_OMEGA, omega_order=P128_OMEGA_ORDER)


def _prove_bytes(F, circ, W, factory, fused: bool):
    zkp = ZkProof(rate=RATE, nreq=NREQ)
    prover = ZkProver(circ, F, factory, rate=RATE, nreq=NREQ)
    tp = Transcript(b"zk_fused_test", version=K_VERSION)
    prover.commit(zkp, W, tp, DeterministicEngine())
    if fused:
        assert prover.prove(zkp, W, tp)
    else:
        assert prover._prove_phased(zkp, W, tp)
    return write_zk_proof(zkp, circ, prover.param, F), prover, tp


@pytest.mark.parametrize("field_fn", [fp128,
                                      pytest.param(gf2_128,
                                                   marks=pytest.mark.slow)])
def test_fused_prove_bit_identical_and_verifies(field_fn):
    F = field_fn()
    circ = _circuit(F)
    W = _witness(F, circ, seed=7)
    factory = _rs(F)

    data_fused, prover, tp_f = _prove_bytes(F, circ, W, factory, fused=True)
    data_phase, _, tp_p = _prove_bytes(F, circ, W, factory, fused=False)
    assert data_fused == data_phase, "fused prove changed the proof bytes"
    # the post-prove transcript states must agree too (callers continue
    # absorbing into the same oracle, e.g. the mdoc MAC phase)
    assert tp_f.export_state() == tp_p.export_state()

    from longfellow_zk_tpu.zk.serialization import read_zk_proof

    zkp2 = read_zk_proof(data_fused, circ, prover.param, F, RATE, NREQ)
    assert zkp2 is not None
    verifier = ZkVerifier(circ, F, factory, rate=RATE, nreq=NREQ)
    tv = Transcript(b"zk_fused_test", version=K_VERSION)
    verifier.recv_commitment(zkp2, tv)
    ok, why = verifier.verify(zkp2, W[: circ.npub_in], tv)
    assert ok, why


def test_fused_prove_rejects_bad_witness():
    F = fp128()
    circ = _circuit(F)
    W = _witness(F, circ, seed=8)
    W[1] = F.add_i(W[1], 1)  # break the public input
    factory = _rs(F)
    zkp = ZkProof(rate=RATE, nreq=NREQ)
    prover = ZkProver(circ, F, factory, rate=RATE, nreq=NREQ)
    tp = Transcript(b"zk_fused_test", version=K_VERSION)
    prover.commit(zkp, W, tp, DeterministicEngine())
    assert not prover.prove(zkp, W, tp)
