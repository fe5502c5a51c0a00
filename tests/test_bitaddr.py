"""Bitcoin address circuit tests (mirrors reference bitaddr_test.cc)."""

import hashlib
import random

import pytest

from longfellow_zk_tpu.circuits.bitaddr import BitaddrCircuit, BitaddrWitness
from longfellow_zk_tpu.circuits.ripemd.reference import ripemd160
from longfellow_zk_tpu.compiler.logic import EvaluationBackend, Logic
from longfellow_zk_tpu.ec.curves import p256k1_curve
from longfellow_zk_tpu.fields.fp_instances import p256k1_base


def _hash160(ec, sk: int) -> int:
    pk = ec.normalize(ec.scalar_mult(ec.generator(), sk))
    compressed = bytes([2 + (int(pk.y) & 1)]) + int(pk.x).to_bytes(32, "big")
    return int.from_bytes(
        ripemd160(hashlib.sha256(compressed).digest()), "big")


def _run(sk: int, addr: int, corrupt=None):
    ec = p256k1_curve()
    F = p256k1_base()
    bw = BitaddrWitness(ec, F)
    bw.compute_witness(sk)
    wvals = bw.fill()
    if corrupt is not None:
        wvals[corrupt] = (wvals[corrupt] + 1) % F.p
    bk = EvaluationBackend(F)
    L = Logic(bk, F)
    circ = BitaddrCircuit(L, ec)
    bk.feed([addr % F.p])
    addr_elt = L.eltw_input()
    bk.feed(wvals)
    w = circ.witness_input()
    circ.assert_bitaddr(addr_elt, w)
    return bw


@pytest.mark.slow
def test_bitaddr_compiled_zk():
    """Compiled prove+verify over secp256k1 via the CRT convolution RS
    factory, the reference's own configuration for this circuit
    (bitaddr_test.cc:103-125 CrtConvolutionFactory)."""
    from longfellow_zk_tpu.compiler.logic import CompilerBackend
    from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit, dump_info
    from longfellow_zk_tpu.transforms.crt_conv import (
        make_crt_convolution_factory)
    from longfellow_zk_tpu.transforms.ntt import ReedSolomon
    from longfellow_zk_tpu.zk.testing import (
        run_failing_test_zk, run_test_zk)

    ec = p256k1_curve()
    F = p256k1_base()
    rng = random.Random(23)
    sk = rng.randrange(1, ec.order)
    addr = _hash160(ec, sk)

    qc = QuadCircuit(F)
    L = Logic(CompilerBackend(qc), F)
    bc = BitaddrCircuit(L, ec)
    addr_elt = L.eltw_input()
    qc.private_input()
    w = bc.witness_input()
    bc.assert_bitaddr(addr_elt, w)
    circ = qc.mkcircuit(nc=1)
    print(dump_info("bitaddr", qc))

    bw = BitaddrWitness(ec, F)
    bw.compute_witness(sk)
    W = [1, addr % F.p] + bw.fill()
    assert len(W) == circ.ninputs, (len(W), circ.ninputs)

    conv = make_crt_convolution_factory(F)
    cache = {}

    def rs(n, m):
        if (n, m) not in cache:
            cache[(n, m)] = ReedSolomon(n, m, F, conv)
        return cache[(n, m)]

    rs.fingerprint = ("crt", F.name)
    ok, why = run_test_zk(circ, W, W[: circ.npub_in], F, rs)
    assert ok, why

    W2 = list(W)
    W2[circ.npub_in + 7] = (W2[circ.npub_in + 7] + 1) % F.p
    assert run_failing_test_zk(circ, W2, F, rs)


def test_bitaddr_ok():
    ec = p256k1_curve()
    rng = random.Random(21)
    sk = rng.randrange(1, ec.order)
    addr = _hash160(ec, sk)
    bw = _run(sk, addr)
    assert bw.addr == addr  # host witness agrees with the oracle


def test_bitaddr_wrong_address_fails():
    ec = p256k1_curve()
    rng = random.Random(22)
    sk = rng.randrange(1, ec.order)
    with pytest.raises(AssertionError):
        _run(sk, _hash160(ec, sk) ^ 1)


def test_bitaddr_corrupt_witness_fails():
    ec = p256k1_curve()
    rng = random.Random(23)
    sk = rng.randrange(1, ec.order)
    with pytest.raises(AssertionError):
        _run(sk, _hash160(ec, sk), corrupt=3)
