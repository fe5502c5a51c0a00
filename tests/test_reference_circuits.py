"""Consume the reference-shipped prebuilt mdoc circuit files
(lib/circuits/mdoc/circuits/): zstd-decompress, LFC1-parse both circuits,
and verify the mdoc-level circuit hash against the zk_spec registry
(reference mdoc_circuit_id.cc: SHA256(cid_sig || cid_hash))."""

import hashlib
import os

import pytest

from longfellow_zk_tpu.circuits.mdoc.zk_spec import ZK_SPECS
from longfellow_zk_tpu.fields.fp_instances import p256_base
from longfellow_zk_tpu.fields.gf2 import gf2_128
from longfellow_zk_tpu.proto.lfc1 import (
    GF2_128_ID, P256_ID, circuit_id, read_circuit_buf)
from longfellow_zk_tpu.utils.serialization import ReadBuffer
from longfellow_zk_tpu.utils.zstd import decompress

CIRCUITS_DIR = "/root/reference/lib/circuits/mdoc/circuits"


def _load(circuit_hash):
    path = os.path.join(CIRCUITS_DIR, circuit_hash)
    if not os.path.exists(path):
        pytest.skip("reference circuits not present")
    raw = decompress(open(path, "rb").read())
    buf = ReadBuffer(raw)
    c_sig = read_circuit_buf(p256_base(), P256_ID, buf)
    c_hash = read_circuit_buf(gf2_128(), GF2_128_ID, buf)
    assert buf.remaining() == 0
    return c_sig, c_hash


@pytest.mark.slow
def test_shipped_v7_1attr_parses_and_id_matches():
    spec = next(s for s in ZK_SPECS if s.version == 7
                and s.num_attributes == 1)
    c_sig, c_hash = _load(spec.circuit_hash)
    assert c_sig is not None and c_hash is not None
    # per-circuit ids embedded in the files must verify
    cid_s = circuit_id(p256_base(), c_sig)
    cid_h = circuit_id(gf2_128(), c_hash)
    assert cid_s == c_sig.id
    assert cid_h == c_hash.id
    # mdoc-level hash = SHA256(cid_sig || cid_hash) == zk_spec entry
    assert hashlib.sha256(cid_s + cid_h).hexdigest() == spec.circuit_hash
    # structural expectations (zk_spec.cc; block_enc params assume these)
    assert c_sig.nc == 1 and c_hash.nc == 1
    assert c_hash.subfield_boundary > 0


def test_zstd_roundtrip():
    from longfellow_zk_tpu.utils.zstd import compress

    data = b"longfellow" * 1000
    assert decompress(compress(data)) == data
