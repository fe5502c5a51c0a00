"""Verifier-service tests (twin of reference
reference/verifier-service/server/zk/{cbor,circuits,proofs}_test.go):
container build/parse round trip, spec listing, error paths, and the
slow full HTTP-level prove+verify e2e."""

import json
import os

import pytest

from longfellow_zk_tpu.circuits.cbor.encoder import Tag, encode
from longfellow_zk_tpu.circuits.mdoc.attribute_ids import (
    MDL_NAMESPACE, attributes_in_namespace, is_known_attribute,
    is_supported_namespace)
from longfellow_zk_tpu.circuits.mdoc.zk_spec import ZK_SPECS
from longfellow_zk_tpu.service.verifier_service import (
    LONGFELLOW_SYSTEM, VerifierService, build_device_response,
    extract_p256_pubkey, process_device_response)

CIRCUITS_DIR = "/root/reference/lib/circuits/mdoc/circuits"
EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "mdoc_examples.json")


def _example(i=0):
    ex = json.load(open(EXAMPLES))[i]
    return (bytes.fromhex(ex["mdoc"]), bytes.fromhex(ex["transcript"]),
            int(ex["pkx"], 16), int(ex["pky"], 16), ex["now"].encode())


def _fake_cert(pkx: int, pky: int) -> bytes:
    """Minimal DER SubjectPublicKeyInfo for a P-256 point (enough for
    extract_p256_pubkey, which scans for the OID + BIT STRING)."""
    oid_ec = bytes.fromhex("06072a8648ce3d0201")
    oid_p256 = bytes.fromhex("06082a8648ce3d030107")
    algo = b"\x30" + bytes([len(oid_ec) + len(oid_p256)]) + oid_ec + oid_p256
    point = b"\x04" + pkx.to_bytes(32, "big") + pky.to_bytes(32, "big")
    bits = b"\x03\x42\x00" + point
    inner = algo + bits
    return b"\x30" + bytes([len(inner)]) + inner


def test_cbor_encoder_basics():
    assert encode(0) == b"\x00"
    assert encode(23) == b"\x17"
    assert encode(24) == b"\x18\x18"
    assert encode(-1) == b"\x20"
    assert encode(True) == b"\xf5"
    assert encode("a") == b"\x61a"
    assert encode(b"\x01") == b"\x41\x01"
    assert encode([1, 2]) == b"\x82\x01\x02"
    assert encode({"a": 1}) == b"\xa1\x61a\x01"
    assert encode(Tag(24, b"\x00")) == b"\xd8\x18\x41\x00"
    # round-trip through the host decoder
    from longfellow_zk_tpu.circuits.cbor import host_decoder as hd
    doc = encode({"k": [1, b"xy", "z", True]})
    node, _ = hd.decode(doc)
    assert node.is_variant(hd.MAP)


def test_attribute_registry():
    assert is_supported_namespace(MDL_NAMESPACE)
    assert not is_supported_namespace("com.example.bogus")
    assert is_known_attribute("age_over_18", MDL_NAMESPACE)
    assert is_known_attribute("organ_donor")  # AAMVA
    assert not is_known_attribute("age_over_18x", MDL_NAMESPACE)
    assert len(attributes_in_namespace(MDL_NAMESPACE)) > 50


def test_specs_listing():
    svc = VerifierService(circuit_dir="/nonexistent")
    specs = svc.specs()
    assert len(specs) == len(ZK_SPECS) >= 10
    assert all(s["System"] == LONGFELLOW_SYSTEM for s in specs)


def test_device_response_round_trip():
    mdoc, tr, pkx, pky, now = _example()
    spec = ZK_SPECS[0]
    dr = build_device_response(
        doc_type="org.iso.18013.5.1.mDL",
        zk_system_id="%s %s" % (LONGFELLOW_SYSTEM, spec.circuit_hash),
        issuer_signed={MDL_NAMESPACE: [("age_over_18", b"\xf5")]},
        x5chain=[_fake_cert(pkx, pky)],
        timestamp=now.decode(),
        proof=b"\x01\x02\x03\x04")
    req = process_device_response(dr)
    assert req.system == LONGFELLOW_SYSTEM
    assert req.circuit_id == spec.circuit_hash
    assert req.doc_type == b"org.iso.18013.5.1.mDL"
    assert req.now == now
    assert (req.pkx, req.pky) == (pkx, pky)
    assert req.proof == b"\x01\x02\x03\x04"
    assert len(req.attributes) == 1
    a = req.attributes[0]
    assert a.id == b"age_over_18" and a.cbor_value == b"\xf5"
    assert req.claims[MDL_NAMESPACE][0]["elementIdentifier"] == "age_over_18"


def test_zkverify_error_paths():
    svc = VerifierService(circuit_dir="/nonexistent",
                          check_chain=lambda chain: True)
    out = svc.zkverify(b"tr", b"\x00garbage")
    assert out["Status"] is False and "cbor" in out["Message"]

    mdoc, tr, pkx, pky, now = _example()
    dr = build_device_response(
        doc_type="org.iso.18013.5.1.mDL",
        zk_system_id="%s %s" % (LONGFELLOW_SYSTEM, "ab" * 32),
        issuer_signed={MDL_NAMESPACE: [("age_over_18", b"\xf5")]},
        x5chain=[_fake_cert(pkx, pky)], timestamp=now.decode(),
        proof=b"\x00")
    out = svc.zkverify(tr, dr)
    assert out["Status"] is False and "unknown zk spec" in out["Message"]

    spec = ZK_SPECS[0]
    dr = build_device_response(
        doc_type="org.iso.18013.5.1.mDL",
        zk_system_id="%s %s" % (LONGFELLOW_SYSTEM, spec.circuit_hash),
        issuer_signed={MDL_NAMESPACE: [("age_over_18", b"\xf5")]},
        x5chain=[_fake_cert(pkx, pky)], timestamp=now.decode(),
        proof=b"\x00")
    out = svc.zkverify(tr, dr)
    assert out["Status"] is False and "not available" in out["Message"]

    # unsupported namespace rejected at parse time
    dr = build_device_response(
        doc_type="org.iso.18013.5.1.mDL",
        zk_system_id="%s %s" % (LONGFELLOW_SYSTEM, spec.circuit_hash),
        issuer_signed={"com.example.bogus": [("x", b"\xf5")]},
        x5chain=[_fake_cert(pkx, pky)], timestamp=now.decode(),
        proof=b"\x00")
    out = svc.zkverify(tr, dr)
    assert out["Status"] is False and "namespace" in out["Message"]


def _mk_response(pkx, pky, now, issuer_signed=None, x5chain=None,
                 proof=b"\x00"):
    spec = ZK_SPECS[0]
    return build_device_response(
        doc_type="org.iso.18013.5.1.mDL",
        zk_system_id="%s %s" % (LONGFELLOW_SYSTEM, spec.circuit_hash),
        issuer_signed=issuer_signed
        or {MDL_NAMESPACE: [("age_over_18", b"\xf5")]},
        x5chain=x5chain or [_fake_cert(pkx, pky)],
        timestamp=now.decode(), proof=proof)


def test_issuer_chain_enforced():
    """Requests are rejected unless the chain hook accepts — the
    reference rejects any issuer key not anchored in IssuerRoots
    (zk/cbor.go validateIssuerKey)."""
    mdoc, tr, pkx, pky, now = _example()
    dr = _mk_response(pkx, pky, now)

    # no trust store configured: refuse (no silent self-issued accept)
    svc = VerifierService(circuit_dir="/nonexistent")
    out = svc.zkverify(tr, dr)
    assert out["Status"] is False and "trust" in out["Message"]

    # rejecting hook: refuse with the chain message
    svc = VerifierService(circuit_dir="/nonexistent",
                          check_chain=lambda chain: False)
    out = svc.zkverify(tr, dr)
    assert out["Status"] is False and "chain rejected" in out["Message"]

    # the hook sees the full DER chain
    seen = []
    svc = VerifierService(circuit_dir="/nonexistent",
                          check_chain=lambda c: seen.extend(c) or True)
    svc.zkverify(tr, dr)
    assert seen == [_fake_cert(pkx, pky)]

    # a missing msoX5chain is rejected at parse time
    import re
    raw = _mk_response(pkx, pky, now)
    # build a container without the chain field by re-encoding
    from longfellow_zk_tpu.circuits.cbor import host_decoder as hd
    with pytest.raises(ValueError, match="msoX5chain"):
        dd = encode({"docType": "org.iso.18013.5.1.mDL",
                     "zkSystemID": "%s %s" % (LONGFELLOW_SYSTEM,
                                              ZK_SPECS[0].circuit_hash),
                     "issuerSigned": {MDL_NAMESPACE: []},
                     "timestamp": now.decode()})
        process_device_response(encode({
            "version": "1.0",
            "zkDocuments": [{"documentData": bytes(dd), "proof": b"\x00"}],
            "status": 0}))


def test_x509_chain_checker_real_certs():
    """x509_chain_checker against a real self-signed root + leaf."""
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.hazmat.primitives.serialization import Encoding
    from longfellow_zk_tpu.service.verifier_service import (
        x509_chain_checker)

    def mk_cert(subject, issuer_name, signing_key, pub_key):
        name = x509.Name([x509.NameAttribute(
            x509.NameOID.COMMON_NAME, subject)])
        iname = x509.Name([x509.NameAttribute(
            x509.NameOID.COMMON_NAME, issuer_name)])
        now = datetime.datetime(2026, 1, 1)
        return (x509.CertificateBuilder()
                .subject_name(name).issuer_name(iname)
                .public_key(pub_key).serial_number(1)
                .not_valid_before(now)
                .not_valid_after(now + datetime.timedelta(days=365))
                .sign(signing_key, hashes.SHA256()))

    root_key = ec.generate_private_key(ec.SECP256R1())
    leaf_key = ec.generate_private_key(ec.SECP256R1())
    root = mk_cert("root", "root", root_key, root_key.public_key())
    leaf = mk_cert("leaf", "root", root_key, leaf_key.public_key())
    rogue_key = ec.generate_private_key(ec.SECP256R1())
    rogue = mk_cert("leaf", "root", rogue_key, leaf_key.public_key())

    check = x509_chain_checker([root.public_bytes(Encoding.DER)])
    assert check([leaf.public_bytes(Encoding.DER)])
    assert check([leaf.public_bytes(Encoding.DER),
                  root.public_bytes(Encoding.DER)])
    assert not check([rogue.public_bytes(Encoding.DER)])
    assert not check([])
    assert not check([b"not a certificate"])


def test_container_element_value():
    """Container-valued attributes (e.g. driving_privileges arrays) must
    round-trip whole, like the reference's cbor.RawMessage."""
    mdoc, tr, pkx, pky, now = _example()
    priv = encode([{"vehicle_category_code": "A"}])
    dr = _mk_response(
        pkx, pky, now,
        issuer_signed={MDL_NAMESPACE: [("driving_privileges", bytes(priv)),
                                       ("age_over_18", b"\xf5")]})
    req = process_device_response(dr)
    vals = {a.id: a.cbor_value for a in req.attributes}
    assert vals[b"driving_privileges"] == bytes(priv)
    assert vals[b"age_over_18"] == b"\xf5"


@pytest.mark.slow
def test_http_prove_verify_e2e():
    """Full loop: run_mdoc_prover -> ZKDeviceResponse -> HTTP POST
    /zkverify -> verified claims (handler.go:73-101)."""
    import base64
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from longfellow_zk_tpu.circuits.mdoc import api
    from longfellow_zk_tpu.circuits.mdoc.witness import RequestedAttribute
    from longfellow_zk_tpu.circuits.mdoc.zk_spec import (
        find_zk_spec_by_version)
    from longfellow_zk_tpu.random_oracle.engine import DeterministicEngine
    from longfellow_zk_tpu.service.verifier_service import make_handler

    spec = find_zk_spec_by_version(7, 1)
    path = os.path.join(CIRCUITS_DIR, spec.circuit_hash)
    if not os.path.exists(path):
        pytest.skip("reference circuits not present")
    cb = open(path, "rb").read()
    mdoc, tr, pkx, pky, now = _example()
    attrs = [RequestedAttribute(id=b"age_over_18", cbor_value=b"\xf5")]
    proof = api.run_mdoc_prover(cb, mdoc, pkx, pky, tr, attrs, now, spec,
                                rng=DeterministicEngine())
    dr = build_device_response(
        doc_type="org.iso.18013.5.1.mDL",
        zk_system_id="%s %s" % (LONGFELLOW_SYSTEM, spec.circuit_hash),
        issuer_signed={MDL_NAMESPACE: [("age_over_18", b"\xf5")]},
        x5chain=[_fake_cert(pkx, pky)], timestamp=now.decode(), proof=proof)

    svc = VerifierService(circuit_dir=CIRCUITS_DIR,
                          check_chain=lambda chain: len(chain) == 1)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        body = json.dumps({
            "Transcript": base64.b64encode(tr).decode(),
            "ZKDeviceResponseCBOR": base64.b64encode(dr).decode(),
        }).encode()
        req = urllib.request.Request(
            "http://127.0.0.1:%d/zkverify" % port, data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert out["Status"] is True
        assert out["Claims"][MDL_NAMESPACE][0]["elementIdentifier"] == \
            "age_over_18"
        with urllib.request.urlopen(
                "http://127.0.0.1:%d/specs" % port) as resp:
            specs = json.loads(resp.read())
        assert any(s["CircuitHash"] == spec.circuit_hash for s in specs)
    finally:
        httpd.shutdown()
