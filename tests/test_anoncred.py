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


@pytest.mark.slow
def test_anoncred_small_compiled_zk():
    """Compiled prove+verify for the Small anonymous credential
    (reference small_test.cc ZK tests)."""
    from longfellow_zk_tpu.compiler.logic import CompilerBackend
    from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit, dump_info
    from longfellow_zk_tpu.fields.fp_instances import (
        P256_FP2_ROOT_ORDER, P256_FP2_ROOT_X, P256_FP2_ROOT_Y)
    from longfellow_zk_tpu.fields.fp2 import Fp2
    from longfellow_zk_tpu.zk.testing import (
        rs_factory_for, run_failing_test_zk, run_test_zk)

    rng = random.Random(6)
    now = b"20241005"
    attrs = [(0, b"Erika")]
    ec, mdoc, pk, (r, s), transcript, e2, (dr, ds) = _make_credential(rng)
    F = p256_base()
    sw = SmallWitness(ec, F, max_blocks=Small.kMaxSHABlocks)
    sw.compute_witness(pk.x, pk.y, mdoc, transcript, r, s, dr, ds)

    qc = QuadCircuit(F)
    L = Logic(CompilerBackend(qc), F)
    cred = Small(L, ec, ec.order)
    pkX, pkY, hash_tr = L.eltw_input(), L.eltw_input(), L.eltw_input()
    oas = [OpenedAttribute.input(L) for _ in attrs]
    now_w = [L.vinput(8) for _ in now]
    qc.private_input()
    vw = cred.witness_input()
    cred.assert_credential(pkX, pkY, hash_tr, oas, now_w, vw)
    circ = qc.mkcircuit(nc=1)
    print(dump_info("anoncred_small", qc))

    W = [1, pk.x, pk.y, e2 % F.p]
    for ind, val in attrs:
        W.extend(F.of_scalar((ind >> i) & 1) for i in range(8))
        W.extend(F.of_scalar((len(val) >> i) & 1) for i in range(8))
        padded = val + bytes(32 - len(val))
        for byte in padded:
            W.extend(F.of_scalar((byte >> i) & 1) for i in range(8))
    for b in now:
        W.extend(F.of_scalar((b >> i) & 1) for i in range(8))
    W.extend(sw.fill())
    assert len(W) == circ.ninputs, (len(W), circ.ninputs)

    rs = rs_factory_for(F, F2=Fp2(F),
                        omega2=(P256_FP2_ROOT_X, P256_FP2_ROOT_Y),
                        omega_order=P256_FP2_ROOT_ORDER)
    ok, why = run_test_zk(circ, W, W[: circ.npub_in], F, rs)
    assert ok, why

    W2 = list(W)
    W2[circ.npub_in + 2] = (W2[circ.npub_in + 2] + 1) % F.p
    assert run_failing_test_zk(circ, W2, F, rs)


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
