"""LFC2 format tests (mirrors rust/core/proto/tests/serialization.rs):
roundtrip through LFC2, id enforcement, size advantage vs LFC1."""

import gzip
import os

import pytest

from longfellow_zk_tpu.fields.fp_instances import fp128
from longfellow_zk_tpu.proto import lfc1, lfc2

ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts")


def _sha_circuit():
    F = fp128()
    path = os.path.join(ART, "sha256_1block_fp128.lfc1.gz")
    return F, lfc1.read_circuit(F, lfc1.FP128_ID,
                                gzip.open(path, "rb").read())


def test_lfc2_roundtrip_sha_circuit():
    F, circ = _sha_circuit()
    data = lfc2.write_circuit(F, lfc1.FP128_ID, circ)
    assert data[:4] == b"LFC2"
    circ2 = lfc2.read_circuit(F, lfc1.FP128_ID, data)
    assert circ2 is not None
    assert circ2.nv == circ.nv and circ2.ninputs == circ.ninputs
    assert circ2.nl == circ.nl and circ2.npub_in == circ.npub_in
    assert lfc1.circuit_id(F, circ2) == lfc1.circuit_id(F, circ)
    for la, lb in zip(circ.layers, circ2.layers):
        assert la.nw == lb.nw and la.logw == lb.logw
        assert la.quad.nterms == lb.quad.nterms
        assert list(la.quad.g) == list(lb.quad.g)
        assert list(la.quad.h0) == list(lb.quad.h0)
        assert list(la.quad.h1) == list(lb.quad.h1)
        assert list(la.quad.v) == list(lb.quad.v)


def test_lfc2_smaller_than_lfc1():
    """rust/README.md:40-41: LFC2 is the compact format."""
    F, circ = _sha_circuit()
    l1 = lfc1.write_circuit(F, lfc1.FP128_ID, circ)
    l2 = lfc2.write_circuit(F, lfc1.FP128_ID, circ)
    assert len(l2) < len(l1), (len(l2), len(l1))


def test_lfc2_rejects_corruption():
    F, circ = _sha_circuit()
    data = bytearray(lfc2.write_circuit(F, lfc1.FP128_ID, circ))
    data[-1] ^= 1  # corrupt the trailing circuit id
    assert lfc2.read_circuit(F, lfc1.FP128_ID, bytes(data)) is None
    assert lfc2.read_circuit(F, lfc1.FP128_ID, b"LFC1" + bytes(data[4:])) \
        is None
    # wrong field id
    assert lfc2.read_circuit(F, lfc1.P256_ID,
                             lfc2.write_circuit(F, lfc1.FP128_ID, circ)) \
        is None
