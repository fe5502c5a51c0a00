"""Flat SHA-256 circuit tests (mirrors reference
flatsha256_circuit_test.cc): witness generation vs hashlib, evaluation
backend satisfaction, and flipped-witness rejection."""

import hashlib
import random

import pytest

from longfellow_zk_tpu.circuits.sha.sha256 import (
    FlatSHA256Circuit,
    message_witness,
    pack_block_witness,
    sha256_pad,
    transform_block_witness,
    SHA256_INIT,
)
from longfellow_zk_tpu.compiler.logic import EvaluationBackend, Logic
from longfellow_zk_tpu.fields.fp_instances import fp128
from longfellow_zk_tpu.fields.gf2 import gf2_128


def test_witness_matches_hashlib():
    for msg in [b"", b"abc", b"a" * 100]:
        nb, padded, bws, digest = message_witness(msg, 4)
        assert digest == hashlib.sha256(msg).digest()


@pytest.mark.parametrize("field_fn", [fp128, gf2_128])
def test_transform_block_eval_backend(field_fn):
    """Single block transform satisfied under the evaluation backend."""
    F = field_fn()
    bk = EvaluationBackend(F)
    L = Logic(bk, F)
    sha = FlatSHA256Circuit(L, plucker_logn=4)
    msg = b"abc"
    padded = sha256_pad(msg)
    assert len(padded) == 64
    bw = transform_block_witness(SHA256_INIT, padded)

    inw = [L.bits(8, byte) for byte in padded]
    tmp = []
    for i in range(16):
        tmp.append(L.vappend(
            L.vappend(inw[4 * i + 3], inw[4 * i + 2]),
            L.vappend(inw[4 * i + 1], inw[4 * i + 0])))
    H0 = [L.bits(32, v) for v in SHA256_INIT]
    outw = [L.bits(32, v) for v in bw.outw]
    oute = [L.bits(32, v) for v in bw.oute]
    outa = [L.bits(32, v) for v in bw.outa]
    H1 = [L.bits(32, v) for v in bw.h1]
    # must not raise
    sha.assert_transform_block(tmp, H0, outw, oute, outa, H1)

    # flip a witness bit: must fail
    bad_oute = list(oute)
    bad_oute[10] = L.bits(32, bw.oute[10] ^ 4)
    with pytest.raises(AssertionError):
        sha.assert_transform_block(tmp, H0, outw, bad_oute, outa, H1)


@pytest.mark.parametrize("field_fn", [fp128, gf2_128])
def test_message_hash_eval_backend_packed(field_fn):
    """Full packed path: assert_message_hash on a 2-block message."""
    F = field_fn()
    bk = EvaluationBackend(F)
    L = Logic(bk, F)
    sha = FlatSHA256Circuit(L, plucker_logn=4)
    msg = b"hello longfellow tpu" * 3  # 60 bytes -> 2 blocks after padding
    max_blocks = 2
    nb, padded, bws, digest = message_witness(msg, max_blocks)
    assert nb == 2

    from longfellow_zk_tpu.compiler.components import BitPluckerEncoder
    enc = BitPluckerEncoder(F, 4)

    nbv = L.bits(8, nb)
    inb = [L.bits(8, byte) for byte in padded]
    bws_wires = []
    for bw in bws:
        d = dict(
            outw=[[bk.konst(e) for e in enc.mkpacked_v32(v)] for v in bw.outw],
            oute=[[bk.konst(e) for e in enc.mkpacked_v32(v)] for v in bw.oute],
            outa=[[bk.konst(e) for e in enc.mkpacked_v32(v)] for v in bw.outa],
            h1=[[bk.konst(e) for e in enc.mkpacked_v32(v)] for v in bw.h1],
        )
        bws_wires.append(d)
    target = []
    digest_bits = []
    for byte in digest:
        for i in range(8):
            digest_bits.append((byte >> i) & 1)
    # target v256: big-endian digest loaded as h[7-j] bit k ordering:
    # mm[(7-j)*32+k] = bit k of h[j]; digest bytes are big-endian words
    tgt = [None] * 256
    hwords = [int.from_bytes(digest[4 * j : 4 * j + 4], "big")
              for j in range(8)]
    for j in range(8):
        for k in range(32):
            tgt[(7 - j) * 32 + k] = L.bit((hwords[j] >> k) & 1)
    sha.assert_message_hash(max_blocks, nbv, inb, tgt, bws_wires)

    # wrong digest must fail
    tgt_bad = list(tgt)
    tgt_bad[0] = L.lnot(tgt_bad[0])
    with pytest.raises(AssertionError):
        sha.assert_message_hash(max_blocks, nbv, inb, tgt_bad, bws_wires)
