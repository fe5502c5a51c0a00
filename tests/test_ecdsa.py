"""ECDSA circuit tests (mirrors reference lib/circuits/ecdsa/verify_test.cc):
host sign/verify, witness generation, evaluation-backend satisfaction,
and bad-signature rejection."""

import hashlib
import random

import pytest

from longfellow_zk_tpu.circuits.ecdsa.verify import (
    EcdsaWitness,
    VerifyCircuit,
    compute_witness,
)
from longfellow_zk_tpu.compiler.logic import EvaluationBackend, Logic
from longfellow_zk_tpu.ec.curves import (
    ecdsa_sign,
    ecdsa_verify_host,
    p256_curve,
    p256k1_curve,
)
from longfellow_zk_tpu.fields.fp_instances import p256_base


@pytest.mark.parametrize("curve_fn", [p256_curve, p256k1_curve])
def test_host_ecdsa_roundtrip(curve_fn):
    ec = curve_fn()
    rng = random.Random(1)
    d = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), d))
    e = int.from_bytes(hashlib.sha256(b"msg").digest(), "big") % ec.order
    k = rng.randrange(1, ec.order)
    r, s = ecdsa_sign(ec, d, e, k)
    assert ecdsa_verify_host(ec, pk.x, pk.y, e, r, s)
    assert not ecdsa_verify_host(ec, pk.x, pk.y, (e + 1) % ec.order, r, s)


def test_curve_identities():
    ec = p256_curve()
    g = ec.generator()
    # order * g == identity
    P = ec.scalar_mult(g, ec.order)
    assert P.z % ec.p == 0 and P.x % ec.p == 0
    # 2g (doubled) == g+g (complete addition handles the doubling case)
    d1 = ec.normalize(ec.double_point(g))
    d2 = ec.normalize(ec.add_points(g, g))
    assert (d1.x, d1.y) == (d2.x, d2.y)
    assert ec.is_on_curve(d1.x, d1.y)


def test_ecdsa_witness_and_circuit_eval():
    ec = p256_curve()
    F = p256_base()
    rng = random.Random(2)
    d = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), d))
    e = int.from_bytes(hashlib.sha256(b"attestation").digest(), "big") % ec.order
    r, s = ecdsa_sign(ec, d, e, rng.randrange(1, ec.order))
    w = compute_witness(ec, pk.x, pk.y, e, r, s)

    bk = EvaluationBackend(F)
    L = Logic(bk, F)
    vc = VerifyCircuit(L, ec)

    # feed witness values through a fake input stream
    vals = iter(w.fill())

    class _FakeBk(EvaluationBackend):
        def input_wire(self):
            return next(vals)

    fbk = _FakeBk(F)
    L2 = Logic(fbk, F)
    vc2 = VerifyCircuit(L2, ec)
    wi = EcdsaWitness(L2, ec.kBits)
    # must not raise
    vc2.verify_signature3(pk.x, pk.y, e % F.p, wi)


def test_ecdsa_bad_signature_rejected():
    ec = p256_curve()
    rng = random.Random(3)
    d = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), d))
    e = 12345
    r, s = ecdsa_sign(ec, d, e, rng.randrange(1, ec.order))
    # witness computation for a wrong hash must fail the final identity check
    with pytest.raises(AssertionError):
        compute_witness(ec, pk.x, pk.y, (e + 1) % ec.order, r, s)

    # valid witness but wrong public key into the circuit: assertion fires
    from longfellow_zk_tpu.fields.fp_instances import p256_base
    F = p256_base()
    w = compute_witness(ec, pk.x, pk.y, e, r, s)
    vals = iter(w.fill())

    class _FakeBk(EvaluationBackend):
        def input_wire(self):
            return next(vals)

    fbk = _FakeBk(F)
    L2 = Logic(fbk, F)
    vc2 = VerifyCircuit(L2, ec)
    wi = EcdsaWitness(L2, ec.kBits)
    with pytest.raises(AssertionError):
        vc2.verify_signature3((pk.x + 1) % F.p, pk.y, e % F.p, wi)
