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
