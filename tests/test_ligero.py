"""Ligero commit/prove/verify roundtrip tests (mirrors reference
lib/ligero/ligero_test.cc coverage)."""

import random

import pytest

from longfellow_zk_tpu.fields.fp_instances import (
    fp128,
    P128_OMEGA,
    P128_OMEGA_ORDER,
)
from longfellow_zk_tpu.fields.gf2 import gf2_128
from longfellow_zk_tpu.ligero.param import (
    LigeroLinearConstraint,
    LigeroParam,
    LigeroQuadraticConstraint,
)
from longfellow_zk_tpu.ligero.prover import LigeroProver
from longfellow_zk_tpu.ligero.verifier import LigeroVerifier
from longfellow_zk_tpu.random_oracle.engine import DeterministicEngine
from longfellow_zk_tpu.random_oracle.transcript import Transcript
from longfellow_zk_tpu.transforms.ntt import (
    ReedSolomon,
    make_fft_convolution_factory,
)
from longfellow_zk_tpu.transforms.lch14 import LCH14ReedSolomon
from longfellow_zk_tpu.utils.crypto import sha256


def _rs_factory_fp128():
    F = fp128()
    conv = make_fft_convolution_factory(F, P128_OMEGA, P128_OMEGA_ORDER)
    cache = {}

    def factory(n, m):
        if (n, m) not in cache:
            cache[(n, m)] = ReedSolomon(n, m, F, conv)
        return cache[(n, m)]

    return factory


def _rs_factory_gf2():
    F = gf2_128()
    cache = {}

    def factory(n, m):
        if (n, m) not in cache:
            cache[(n, m)] = LCH14ReedSolomon(n, m, F)
        return cache[(n, m)]

    return factory


def _setup(F, rng, nw=20, nq=4):
    """Witness with nq quadratic constraints and a few linear ones."""
    if F.kCharacteristicTwo:
        W = [rng.getrandbits(128) for _ in range(nw)]
    else:
        W = [rng.randrange(F.p) for _ in range(nw)]
    lqc = []
    for i in range(nq):
        x, y = 2 * i, 2 * i + 1
        z = nw - nq + i
        W[z] = F.mul_i(W[x], W[y])
        lqc.append(LigeroQuadraticConstraint(x=x, y=y, z=z))
    # linear constraints: constraint c asserts W[c] * 2 + W[c+1] == b[c]
    nl = 3
    llterm = []
    b = []
    two = F.of_scalar(2)
    one = F.of_scalar(1)
    for c in range(nl):
        llterm.append(LigeroLinearConstraint(c=c, w=c, k=two))
        llterm.append(LigeroLinearConstraint(c=c, w=c + 1, k=one))
        b.append(F.add_i(F.mul_i(two, W[c]), W[c + 1]))
    return W, lqc, llterm, b, nl


@pytest.mark.parametrize("field_kind", [
    "fp128", pytest.param("gf2", marks=pytest.mark.slow)])
def test_ligero_roundtrip(field_kind):
    if field_kind == "fp128":
        F = fp128()
        factory = _rs_factory_fp128()
    else:
        F = gf2_128()
        factory = _rs_factory_gf2()
    rng = random.Random(42)
    W, lqc, llterm, b, nl = _setup(F, rng)
    p = LigeroParam(nw=len(W), nq=len(lqc), rateinv=4, nreq=6,
                    block_enc=128, subfield_bytes=F.kSubFieldBytes,
                    field_bytes=F.kBytes)
    prover = LigeroProver(p, F, factory)
    tsp = Transcript(b"ligero_test")
    eng = DeterministicEngine()
    commitment = prover.commit(tsp, W, 0, lqc, eng)
    hash_ll = sha256(b"llterm")
    proof = prover.prove(tsp, nl, llterm, hash_ll, lqc)

    tsv = Transcript(b"ligero_test")
    verifier = LigeroVerifier(p, F, factory)
    verifier.receive_commitment(commitment, tsv)
    ok, why = verifier.verify(commitment, proof, tsv, nl, llterm, hash_ll,
                              b, lqc)
    assert ok, why


@pytest.mark.slow
def test_ligero_rejects_bad_linear_claim():
    F = fp128()
    factory = _rs_factory_fp128()
    rng = random.Random(43)
    W, lqc, llterm, b, nl = _setup(F, rng)
    p = LigeroParam(nw=len(W), nq=len(lqc), rateinv=4, nreq=6,
                    block_enc=128, subfield_bytes=F.kSubFieldBytes,
                    field_bytes=F.kBytes)
    prover = LigeroProver(p, F, factory)
    tsp = Transcript(b"ligero_test")
    commitment = prover.commit(tsp, W, 0, lqc, DeterministicEngine())
    hash_ll = sha256(b"llterm")
    proof = prover.prove(tsp, nl, llterm, hash_ll, lqc)

    # wrong b vector -> dot product check fails
    b_bad = list(b)
    b_bad[0] = F.add_i(b_bad[0], 1)
    tsv = Transcript(b"ligero_test")
    verifier = LigeroVerifier(p, F, factory)
    verifier.receive_commitment(commitment, tsv)
    ok, why = verifier.verify(commitment, proof, tsv, nl, llterm, hash_ll,
                              b_bad, lqc)
    assert not ok and why == "wrong dot product"

    # corrupt an opened column -> merkle check fails
    proof.req[3][0] = F.add_i(proof.req[3][0], 1)
    tsv2 = Transcript(b"ligero_test")
    verifier.receive_commitment(commitment, tsv2)
    ok2, why2 = verifier.verify(commitment, proof, tsv2, nl, llterm, hash_ll,
                                b, lqc)
    assert not ok2 and why2 == "merkle_check failed"


def test_ligero_param_layout():
    # mirror the reference's derived quantities for a known config
    p = LigeroParam(nw=100, nq=10, rateinv=4, nreq=6, block_enc=128)
    assert p.block == (128 + 1) // 6
    assert p.dblock == 2 * p.block - 1
    assert p.block_ext == 128 - p.dblock
    assert p.r == 6 and p.w == p.block - 6
    assert p.nrow == 3 + p.nwrow + 3 * p.nqtriples
    assert p.iq == 3 + p.nwrow
