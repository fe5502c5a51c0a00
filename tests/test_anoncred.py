"""Anoncred small / ptrcred tests (mirrors reference small_test.cc) with
a synthesized credential + issuer/device keys."""

import hashlib
import random

import pytest

from longfellow_zk_tpu.circuits.anoncred import (
    OpenedAttribute, PtrCred, Small, SmallWitness)
from longfellow_zk_tpu.compiler.logic import EvaluationBackend, Logic
from longfellow_zk_tpu.ec.curves import ecdsa_sign, p256_curve
from longfellow_zk_tpu.fields.fp_instances import p256_base


def _make_credential(rng):
    ec = p256_curve()
    mdoc = bytearray(183)
    mdoc[0:5] = b"Erika"
    mdoc[32:42] = b"Mustermann"
    mdoc[64:72] = b"19800101"
    mdoc[72] = ord("F")
    mdoc[73:80] = b"0110011"
    mdoc[80:84] = b"ISSU"
    mdoc[84:92] = b"20240101"
    mdoc[92:100] = b"20251231"
    # device key
    dd = rng.randrange(1, ec.order)
    dpk = ec.normalize(ec.scalar_mult(ec.generator(), dd))
    mdoc[100:132] = int(dpk.x).to_bytes(32, "big")
    mdoc[132:164] = int(dpk.y).to_bytes(32, "big")
    mdoc[164:183] = bytes(rng.randrange(1, 255) for _ in range(19))
    mdoc = bytes(mdoc)

    d = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), d))
    e = int.from_bytes(hashlib.sha256(mdoc).digest(), "big") % ec.order
    r, s = ecdsa_sign(ec, d, e, rng.randrange(1, ec.order))

    transcript = bytes(rng.randrange(256) for _ in range(32))
    e2 = int.from_bytes(hashlib.sha256(transcript).digest(), "big") % ec.order
    dr, ds = ecdsa_sign(ec, dd, e2, rng.randrange(1, ec.order))
    return ec, mdoc, pk, (r, s), transcript, e2, (dr, ds)


def _run(cred_cls, now: bytes, attrs, rng, corrupt=None):
    ec, mdoc, pk, (r, s), transcript, e2, (dr, ds) = _make_credential(rng)
    F = p256_base()
    sw = SmallWitness(ec, F, max_blocks=cred_cls.kMaxSHABlocks)
    sw.compute_witness(pk.x, pk.y, mdoc, transcript, r, s, dr, ds)
    wvals = sw.fill()
    if corrupt is not None:
        wvals[corrupt] = (wvals[corrupt] + 1) % F.p

    bk = EvaluationBackend(F)
    L = Logic(bk, F)
    cred = cred_cls(L, ec, ec.order)

    bk.feed([pk.x, pk.y, e2 % F.p])
    pkX, pkY, hash_tr = L.eltw_input(), L.eltw_input(), L.eltw_input()
    oas = []
    for ind, val in attrs:
        bk.feed([F.of_scalar((ind >> i) & 1) for i in range(8)])
        bk.feed([F.of_scalar((len(val) >> i) & 1) for i in range(8)])
        padded = val + bytes(32 - len(val))
        for byte in padded:
            bk.feed([F.of_scalar((byte >> i) & 1) for i in range(8)])
        oas.append(OpenedAttribute.input(L))
    now_w = [L.bits(8, b) for b in now]
    bk.feed(wvals)
    vw = cred.witness_input()
    cred.assert_credential(pkX, pkY, hash_tr, oas, now_w, vw)


def test_small_credential_ok():
    rng = random.Random(1)
    _run(Small, b"20241005",
         [(0, b"Erika"), (64, b"19800101"), (73, b"0110011")], rng)


def test_small_wrong_attribute_fails():
    rng = random.Random(2)
    with pytest.raises(AssertionError):
        _run(Small, b"20241005", [(0, b"Max")], rng)


def test_small_expired_fails():
    rng = random.Random(3)
    with pytest.raises(AssertionError):
        _run(Small, b"20261005", [(0, b"Erika")], rng)


def test_small_corrupt_witness_fails():
    rng = random.Random(4)
    with pytest.raises(AssertionError):
        _run(Small, b"20241005", [(0, b"Erika")], rng, corrupt=1)


def test_ptrcred_ok():
    rng = random.Random(5)
    _run(PtrCred, b"20241005", [(32, b"Mustermann")], rng)
