"""EC public-key circuit tests (mirrors reference ec/pk_circuit_test.cc)."""

import random

import pytest

from longfellow_zk_tpu.circuits.ecdsa.pk import (
    Ecpk, EcpkWitness, compute_pk_witness, fill_pk_witness)
from longfellow_zk_tpu.compiler.logic import EvaluationBackend, Logic
from longfellow_zk_tpu.ec.curves import p256_curve
from longfellow_zk_tpu.fields.fp_instances import p256_base


def _run(sk: int, pkx: int, pky: int, corrupt=None):
    ec = p256_curve()
    F = p256_base()
    w = compute_pk_witness(ec, sk)
    wvals = fill_pk_witness(F, w)
    if corrupt is not None:
        wvals[corrupt] = (wvals[corrupt] + 1) % F.p
    bk = EvaluationBackend(F)
    L = Logic(bk, F)
    bk.feed([pkx, pky])
    pk_x, pk_y = L.eltw_input(), L.eltw_input()
    bk.feed(wvals)
    ww = EcpkWitness(L, ec.kBits)
    Ecpk(L, ec).assert_public_key(pk_x, pk_y, ww)


def test_pk_ok():
    ec = p256_curve()
    rng = random.Random(9)
    sk = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), sk))
    _run(sk, pk.x, pk.y)


def test_pk_wrong_key_fails():
    ec = p256_curve()
    rng = random.Random(10)
    sk = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), sk + 1))
    with pytest.raises(AssertionError):
        _run(sk, pk.x, pk.y)


def test_pk_corrupt_witness_fails():
    ec = p256_curve()
    rng = random.Random(11)
    sk = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), sk))
    with pytest.raises(AssertionError):
        _run(sk, pk.x, pk.y, corrupt=17)
