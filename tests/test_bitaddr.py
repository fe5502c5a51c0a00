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
