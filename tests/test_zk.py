"""End-to-end ZK prove/verify (mirrors reference lib/zk/zk_test.cc via
zk_testing.h harnesses: run2_test_zk + failing-proof rejection)."""

import random

import pytest

from longfellow_zk_tpu.fields.fp_instances import (
    fp128,
    P128_OMEGA,
    P128_OMEGA_ORDER,
)
from longfellow_zk_tpu.fields.gf2 import gf2_128
from longfellow_zk_tpu.random_oracle.engine import DeterministicEngine
from longfellow_zk_tpu.random_oracle.transcript import Transcript
from longfellow_zk_tpu.sumcheck.circuit import Circuit, Layer, Quad
from longfellow_zk_tpu.transforms.lch14 import LCH14ReedSolomon
from longfellow_zk_tpu.transforms.ntt import (
    ReedSolomon,
    make_fft_convolution_factory,
)
from longfellow_zk_tpu.zk.proof import ZkProof
from longfellow_zk_tpu.zk.prover import ZkProver
from longfellow_zk_tpu.zk.verifier import ZkVerifier

import numpy as np


def _rs_factory(F):
    cache = {}
    if F.kCharacteristicTwo:
        def factory(n, m):
            if (n, m) not in cache:
                cache[(n, m)] = LCH14ReedSolomon(n, m, F)
            return cache[(n, m)]
    else:
        conv = make_fft_convolution_factory(F, P128_OMEGA, P128_OMEGA_ORDER)

        def factory(n, m):
            if (n, m) not in cache:
                cache[(n, m)] = ReedSolomon(n, m, F, conv)
            return cache[(n, m)]

    return factory


def _zk_circuit(F):
    """Wires: [c, one | a, b] with c, one public and a, b private.

    Inner layer: t0 = a*b, t1 = c*one, t2 = one*one, t3 = a*one.
    Output layer: o0 = t0*t2 - t1*t2 (checks a*b == c), o1 = 0.
    """
    one = F.of_scalar(1)
    mone = F.neg_i(one)
    l0 = Layer(
        nw=4, logw=2,
        quad=Quad(g=np.array([0, 0, 1, 1]), h0=np.array([0, 1, 3, 3]),
                  h1=np.array([2, 2, 2, 2]), v=[one, mone, one, mone]),
    )
    l1 = Layer(
        nw=4, logw=2,
        quad=Quad(g=np.array([0, 1, 2, 3]), h0=np.array([2, 0, 1, 2]),
                  h1=np.array([3, 1, 1, 1]), v=[one, one, one, one]),
    )
    return Circuit(nv=2, logv=1, nc=1, logc=0, nl=2, ninputs=4, npub_in=2,
                   subfield_boundary=0, layers=[l0, l1],
                   id=b"\x11" * 32)


@pytest.mark.parametrize("field_kind", [
    "fp128", pytest.param("gf2", marks=pytest.mark.slow)])
def test_zk_roundtrip(field_kind):
    F = fp128() if field_kind == "fp128" else gf2_128()
    factory = _rs_factory(F)
    circ = _zk_circuit(F)
    rng = random.Random(21)
    if F.kCharacteristicTwo:
        a, b = rng.getrandbits(128), rng.getrandbits(128)
    else:
        a, b = rng.randrange(F.p), rng.randrange(F.p)
    c = F.mul_i(a, b)
    W = [c, F.of_scalar(1), a, b]

    zkp = ZkProof(rate=4, nreq=6)
    prover = ZkProver(circ, F, factory, rate=4, nreq=6, block_enc=128)
    tsp = Transcript(b"zk_test")
    prover.commit(zkp, W, tsp, DeterministicEngine())
    assert prover.prove(zkp, W, tsp)

    verifier = ZkVerifier(circ, F, factory, rate=4, nreq=6, block_enc=128)
    tsv = Transcript(b"zk_test")
    verifier.recv_commitment(zkp, tsv)
    pub = [c, F.of_scalar(1)]
    ok, why = verifier.verify(zkp, pub, tsv)
    assert ok, why


@pytest.mark.slow
def test_zk_rejects_wrong_public_input():
    F = fp128()
    factory = _rs_factory(F)
    circ = _zk_circuit(F)
    rng = random.Random(22)
    a, b = rng.randrange(F.p), rng.randrange(F.p)
    c = F.mul_i(a, b)
    W = [c, 1, a, b]
    zkp = ZkProof(rate=4, nreq=6)
    prover = ZkProver(circ, F, factory, rate=4, nreq=6, block_enc=128)
    tsp = Transcript(b"zk_test")
    prover.commit(zkp, W, tsp, DeterministicEngine())
    assert prover.prove(zkp, W, tsp)

    verifier = ZkVerifier(circ, F, factory, rate=4, nreq=6, block_enc=128)
    tsv = Transcript(b"zk_test")
    verifier.recv_commitment(zkp, tsv)
    ok, _ = verifier.verify(zkp, [F.add_i(c, 1), 1], tsv)
    assert not ok

    # corrupted sumcheck message must not verify
    zkp.proof.layers[0].hp[1][0][0] = F.add_i(zkp.proof.layers[0].hp[1][0][0], 1)
    tsv2 = Transcript(b"zk_test")
    verifier.recv_commitment(zkp, tsv2)
    ok2, _ = verifier.verify(zkp, [c, 1], tsv2)
    assert not ok2


@pytest.mark.slow
def test_zk_unsatisfied_witness_refused():
    F = fp128()
    factory = _rs_factory(F)
    circ = _zk_circuit(F)
    W = [5, 1, 2, 2]  # 2*2 != 5
    zkp = ZkProof(rate=4, nreq=6)
    prover = ZkProver(circ, F, factory, rate=4, nreq=6, block_enc=128)
    tsp = Transcript(b"zk_test")
    prover.commit(zkp, W, tsp, DeterministicEngine())
    assert not prover.prove(zkp, W, tsp)
