"""JWT+KB pipeline (mirrors reference jwt_test.cc): synthesize an
ES256-signed token with a cnf device key, verify witness generation, and
check the circuit under the evaluation backend."""

import base64
import hashlib
import json
import random

import pytest

from longfellow_zk_tpu.circuits.ecdsa.verify import compute_witness
from longfellow_zk_tpu.circuits.jwt.jwt import (
    JWT, JWTWitness, JwtOpenedAttributeW, JwtWitnessW, OpenedAttribute,
    fill_attribute_public)
from longfellow_zk_tpu.compiler.logic import EvaluationBackend, Logic
from longfellow_zk_tpu.ec.curves import ecdsa_sign, p256_curve
from longfellow_zk_tpu.fields.fp_instances import p256_base

MAX_BLOCKS = 9


def _b64url(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).decode().rstrip("=")


def _sign_jws(ec, d, header: dict, payload: bytes, rng) -> str:
    msg = _b64url(json.dumps(header).encode()) + "." + _b64url(payload)
    e = int.from_bytes(hashlib.sha256(msg.encode()).digest(), "big")
    r, s = ecdsa_sign(ec, d, e, rng.randrange(1, ec.order))
    sig = r.to_bytes(32, "big") + s.to_bytes(32, "big")
    return msg + "." + _b64url(sig)


def _make_token(rng):
    ec = p256_curve()
    d_issuer = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), d_issuer))
    d_dev = rng.randrange(1, ec.order)
    dpk = ec.normalize(ec.scalar_mult(ec.generator(), d_dev))

    payload = (
        '{"iss":"https://example.com","family_name":"Mustermann",'
        '"given_name":"Erika","age_over_18":"yes",'
        '"cnf":{"jwk":{"kty":"EC","crv":"P-256",'
        '"x":"%s","y":"%s"}}}' % (
            _b64url(dpk.x.to_bytes(32, "big")),
            _b64url(dpk.y.to_bytes(32, "big")))).encode()
    idt = _sign_jws(ec, d_issuer, {"alg": "ES256", "typ": "vc+sd-jwt"},
                    payload, rng)
    kb = _sign_jws(ec, d_dev, {"alg": "ES256", "typ": "kb+jwt"},
                   b'{"nonce":"abc123","aud":"verifier"}', rng)
    return ec, pk, idt + "~" + kb


def test_jwt_witness_and_eval_backend():
    rng = random.Random(77)
    ec, pk, token = _make_token(rng)
    attrs = [OpenedAttribute(id=b"age_over_18", value=b"yes"),
             OpenedAttribute(id=b"given_name", value=b"Erika")]

    w = JWTWitness(ec, MAX_BLOCKS)
    w.compute_witness(token, pk.x, pk.y, attrs)

    F = p256_base()
    bk = EvaluationBackend(F)
    L = Logic(bk, F)

    # public inputs: pkX, pkY, e2, attribute patterns
    pub = [pk.x, pk.y, w.e2 % F.p]
    for a in attrs:
        pub.extend(fill_attribute_public(F, a))
    priv = w.fill_witness(F)
    bk.feed(pub + priv)

    jwt = JWT(L, ec, ec.order, MAX_BLOCKS)
    pkX = L.eltw_input()
    pkY = L.eltw_input()
    e2 = L.eltw_input()
    oa = [JwtOpenedAttributeW(L) for _ in attrs]
    vw = JwtWitnessW(L, jwt.sha, MAX_BLOCKS, len(attrs), ec.kBits)
    # must not raise
    jwt.assert_jwt_attributes(pkX, pkY, e2, oa, vw)


def _compile_jwt_circuit(num_attrs: int):
    """Compile the JWT circuit over the P-256 base field (the reference
    proves this with the real stack, jwt_test.cc:477 run2_test_zk)."""
    from longfellow_zk_tpu.compiler.logic import CompilerBackend
    from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit

    ec = p256_curve()
    F = p256_base()
    qc = QuadCircuit(F)
    L = Logic(CompilerBackend(qc), F)
    jwt = JWT(L, ec, ec.order, MAX_BLOCKS)
    pkX = L.eltw_input()
    pkY = L.eltw_input()
    e2 = L.eltw_input()
    oa = [JwtOpenedAttributeW(L) for _ in range(num_attrs)]
    qc.private_input()
    vw = JwtWitnessW(L, jwt.sha, MAX_BLOCKS, num_attrs, ec.kBits)
    jwt.assert_jwt_attributes(pkX, pkY, e2, oa, vw)
    return ec, F, qc.mkcircuit(nc=1), qc


@pytest.mark.slow
def test_jwt_compiled_zk():
    """Full compiled prove+verify + bad-witness rejection
    (jwt_test.cc:477-559 run2_test_zk / run2_failing_test_zk)."""
    from longfellow_zk_tpu.compiler.quad_circuit import dump_info
    from longfellow_zk_tpu.fields.fp_instances import (
        P256_FP2_ROOT_ORDER, P256_FP2_ROOT_X, P256_FP2_ROOT_Y)
    from longfellow_zk_tpu.fields.fp2 import Fp2
    from longfellow_zk_tpu.zk.testing import (
        rs_factory_for, run_failing_test_zk, run_test_zk)

    rng = random.Random(79)
    ec, pk, token = _make_token(rng)
    attrs = [OpenedAttribute(id=b"age_over_18", value=b"yes")]
    w = JWTWitness(ec, MAX_BLOCKS)
    w.compute_witness(token, pk.x, pk.y, attrs)

    _ec, F, circ, qc = _compile_jwt_circuit(len(attrs))
    print(dump_info("jwt", qc))

    pub = [1, pk.x, pk.y, w.e2 % F.p]
    for a in attrs:
        pub.extend(fill_attribute_public(F, a))
    W = pub + w.fill_witness(F)
    assert len(W) == circ.ninputs, (len(W), circ.ninputs)

    rs = rs_factory_for(F, F2=Fp2(F),
                        omega2=(P256_FP2_ROOT_X, P256_FP2_ROOT_Y),
                        omega_order=P256_FP2_ROOT_ORDER)
    ok, why = run_test_zk(circ, W, W[: circ.npub_in], F, rs)
    assert ok, why

    # flip one witness wire: the prover must refuse
    W2 = list(W)
    W2[circ.npub_in + 3] = (W2[circ.npub_in + 3] + 1) % F.p
    assert run_failing_test_zk(circ, W2, F, rs)


def test_jwt_wrong_attribute_fails():
    rng = random.Random(78)
    ec, pk, token = _make_token(rng)
    attrs = [OpenedAttribute(id=b"age_over_18", value=b"yes")]
    w = JWTWitness(ec, MAX_BLOCKS)
    w.compute_witness(token, pk.x, pk.y, attrs)

    F = p256_base()
    bk = EvaluationBackend(F)
    L = Logic(bk, F)
    # claim a different value publicly: must fail
    bad = OpenedAttribute(id=b"age_over_18", value=b"no!")
    pub = [pk.x, pk.y, w.e2 % F.p] + fill_attribute_public(F, bad)
    bk.feed(pub + w.fill_witness(F))
    jwt = JWT(L, ec, ec.order, MAX_BLOCKS)
    pkX = L.eltw_input(); pkY = L.eltw_input(); e2 = L.eltw_input()
    oa = [JwtOpenedAttributeW(L)]
    vw = JwtWitnessW(L, jwt.sha, MAX_BLOCKS, 1, ec.kBits)
    with pytest.raises(AssertionError):
        jwt.assert_jwt_attributes(pkX, pkY, e2, oa, vw)
