"""HTTP verifier service.

TPU-framework twin of the reference's Go verifier demo
(reference/verifier-service/server/{main,handler}.go and zk/*.go):

  GET  /specs     -> JSON list of supported zk specs (handler.go:103-106)
  POST /zkverify  -> {"Transcript": b64, "ZKDeviceResponseCBOR": b64}
                     -> {"Status": bool, "Claims": {...}, "Message": str}
                     (handler.go:73-101)

The CBOR container follows the ISO 18013-5 Second Edition ZKDocument
shape (zk/cbor.go:72-101): a ZKDeviceResponse map with version /
zkDocuments / status, each document = {documentData: bstr(CBOR
{docType, zkSystemID, issuerSigned, msoX5chain, timestamp}),
proof: bstr}.  `build_device_response` produces the same container on
the prover side so a wallet built on this framework can feed the
reference's service and vice versa.

Certificate handling: the issuer public key is extracted from the
first certificate of msoX5chain (SubjectPublicKeyInfo P-256 point,
zk/cbor.go getFirstCert + x509 parse), and — like the reference's
validateIssuerKey (zk/cbor.go), which verifies the chain against
IssuerRoots — the service REJECTS a request unless the supplied
`check_chain` hook accepts the full DER chain.  msoX5chain is a
required field.  `x509_chain_checker(roots)` builds a hook that
verifies each certificate is signed by its successor and anchors the
chain in a trusted root pool; deployments without any trust
configuration must opt in explicitly with require_issuer_chain=False.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, List, Optional, Tuple

from ..circuits.cbor import host_decoder as hd
from ..circuits.cbor.encoder import encode as cbor_encode
from ..circuits.mdoc import api
from ..circuits.mdoc.attribute_ids import is_supported_namespace
from ..circuits.mdoc.witness import MdocError, RequestedAttribute
from ..circuits.mdoc.zk_spec import ZK_SPECS, find_zk_spec

LONGFELLOW_SYSTEM = "longfellow-libzk-v1"
TIMESTAMP_LEN = 20

# P-256 (prime256v1) OID: 1.2.840.10045.3.1.7
_P256_OID = bytes.fromhex("06082a8648ce3d030107")


def extract_p256_pubkey(cert_der: bytes) -> Tuple[int, int]:
    """Extract the uncompressed P-256 public point from a DER
    certificate's SubjectPublicKeyInfo: locate the prime256v1 OID, then
    the following BIT STRING `03 42 00 04 || X || Y`."""
    i = cert_der.find(_P256_OID)
    if i < 0:
        raise ValueError("no P-256 SubjectPublicKeyInfo in certificate")
    j = cert_der.find(b"\x03\x42\x00\x04", i)
    if j < 0 or j + 4 + 64 > len(cert_der):
        raise ValueError("no uncompressed P-256 point in certificate")
    x = int.from_bytes(cert_der[j + 4 : j + 36], "big")
    y = int.from_bytes(cert_der[j + 36 : j + 68], "big")
    return x, y


# ---------------------------------------------------------------------------
# ZKDeviceResponse container (zk/cbor.go:72-101)
# ---------------------------------------------------------------------------

@dataclass
class VerifyRequest:
    """Flat argument set for run_mdoc_verifier (zk/proofs.go:71-87)."""

    system: str = ""
    circuit_id: str = ""
    pkx: int = 0
    pky: int = 0
    now: bytes = b""
    doc_type: bytes = b""
    attributes: List[RequestedAttribute] = field(default_factory=list)
    transcript: bytes = b""
    claims: Dict[str, List[dict]] = field(default_factory=dict)
    proof: bytes = b""
    x5chain: List[bytes] = field(default_factory=list)


def x509_chain_checker(roots_der: List[bytes]) -> Callable[[List[bytes]],
                                                           bool]:
    """Chain validator equivalent to the reference's IssuerRoots check
    (zk/cbor.go validateIssuerKey + zk/roots.go): each certificate must
    be signed by the next one in the chain, and the chain must anchor in
    one of the trusted roots (by exact DER match, or by a root that
    directly issued the last chain certificate)."""
    from cryptography import x509
    from cryptography.hazmat.primitives.serialization import Encoding

    roots = []
    for der in roots_der:
        try:
            roots.append(x509.load_der_x509_certificate(der))
        except ValueError:
            roots.append(x509.load_pem_x509_certificate(der))
    root_bytes = {r.public_bytes(Encoding.DER) for r in roots}

    def check(chain_der: List[bytes]) -> bool:
        if not chain_der:
            return False
        try:
            chain = [x509.load_der_x509_certificate(d) for d in chain_der]
            for child, parent in zip(chain, chain[1:]):
                child.verify_directly_issued_by(parent)
            last = chain[-1]
            if chain_der[-1] in root_bytes:
                # anchor present in the chain itself: verify
                # self-signature
                last.verify_directly_issued_by(last)
                return True
            for root in roots:
                try:
                    last.verify_directly_issued_by(root)
                    return True
                except Exception:
                    continue
            return False
        except Exception:
            return False

    return check


def build_device_response(doc_type: str, zk_system_id: str,
                          issuer_signed: Dict[str, List[Tuple[str, bytes]]],
                          x5chain: List[bytes], timestamp: str,
                          proof: bytes) -> bytes:
    """Wallet-side: wrap one proof in a ZKDeviceResponse container.
    issuer_signed: namespace -> [(elementIdentifier, elementValue CBOR)].
    """
    # elementValue holds already-encoded CBOR: splice raw bytes
    enc_claims = bytearray(_head(5, len(issuer_signed)))
    for ns, items in issuer_signed.items():
        enc_claims += cbor_encode(ns)
        enc_claims += _head(4, len(items))
        for ident, raw_value in items:
            enc_claims += _head(5, 2)
            enc_claims += cbor_encode("elementIdentifier")
            enc_claims += cbor_encode(ident)
            enc_claims += cbor_encode("elementValue")
            enc_claims += raw_value  # raw CBOR value
    document_data = bytearray(_head(5, 5))
    for k, v in (("docType", doc_type), ("zkSystemID", zk_system_id)):
        document_data += cbor_encode(k) + cbor_encode(v)
    document_data += cbor_encode("issuerSigned") + enc_claims
    document_data += cbor_encode("msoX5chain") + cbor_encode(
        x5chain[0] if len(x5chain) == 1 else list(x5chain))
    document_data += cbor_encode("timestamp") + cbor_encode(timestamp)
    return cbor_encode({
        "version": "1.0",
        "zkDocuments": [{"documentData": bytes(document_data),
                         "proof": proof}],
        "status": 0,
    })


def _head(major: int, n: int) -> bytes:
    from ..circuits.cbor.encoder import _head as h
    return h(major, n)


def _text_of(doc: bytes, node: hd.CborDoc) -> bytes:
    return node.text(doc)


def _lookup(doc: bytes, m: hd.CborDoc, *names: str) -> Optional[hd.CborDoc]:
    """Case-insensitive-ish map lookup: try each candidate key name
    (the Go decoder matches struct field names case-insensitively)."""
    for name in names:
        for cand in (name, name[0].upper() + name[1:]):
            hit = m.lookup(doc, cand.encode())
            if hit is not None:
                return hit[1]
    return None


def process_device_response(raw: bytes) -> VerifyRequest:
    """Parse + validate the ZKDeviceResponse CBOR
    (zk/cbor.go ProcessDeviceResponse)."""
    top_r = hd.decode(raw)
    if top_r is None or not top_r[0].is_variant(hd.MAP):
        raise ValueError("ZKDeviceResponse: not a CBOR map")
    top = top_r[0]
    docs = _lookup(raw, top, "zkDocuments", "ZKDocuments")
    if docs is None or not docs.is_variant(hd.ARRAY) or docs.n_items < 1:
        raise ValueError("ZKDeviceResponse: missing zkDocuments")
    d0 = docs.index(0)
    if not d0.is_variant(hd.MAP):
        raise ValueError("zkDocument: not a map")

    dd_node = _lookup(raw, d0, "documentData")
    proof_node = _lookup(raw, d0, "proof")
    if dd_node is None or proof_node is None:
        raise ValueError("zkDocument: need documentData + proof")
    dd_pos, dd_len = dd_node.as_bytes()
    dd = raw[dd_pos : dd_pos + dd_len]
    p_pos, p_len = proof_node.as_bytes()

    inner_r = hd.decode(dd)
    if inner_r is None or not inner_r[0].is_variant(hd.MAP):
        raise ValueError("documentData: not a CBOR map")
    inner = inner_r[0]

    req = VerifyRequest(proof=raw[p_pos : p_pos + p_len])

    dt = _lookup(dd, inner, "docType")
    zid = _lookup(dd, inner, "zkSystemID", "zkSystemId")
    ts = _lookup(dd, inner, "timestamp")
    chain = _lookup(dd, inner, "msoX5chain")
    issuer = _lookup(dd, inner, "issuerSigned")
    if dt is None or zid is None or ts is None or issuer is None:
        raise ValueError("documentData: missing required field")
    req.doc_type = _text_of(dd, dt)

    # zkSystemID: "<system> <circuit_id>" (zk/cbor.go ParseSystemID)
    sysid = _text_of(dd, zid).decode()
    parts = sysid.split(" ")
    if len(parts) != 2 or parts[0] != LONGFELLOW_SYSTEM:
        raise ValueError("unsupported zk system %r" % sysid)
    req.system, req.circuit_id = parts[0], parts[1]

    now = _text_of(dd, ts)
    if len(now) != TIMESTAMP_LEN:
        raise ValueError("timestamp must be %d bytes" % TIMESTAMP_LEN)
    req.now = now

    # msoX5chain is required (zk/cbor.go getFirstCert rejects a missing
    # chain) — without it the issuer key would be unauthenticated.
    if chain is None:
        raise ValueError("documentData: missing msoX5chain")
    cert_nodes = ([chain.index(i) for i in range(chain.n_items)]
                  if chain.is_variant(hd.ARRAY) else [chain])
    if not cert_nodes:
        raise ValueError("msoX5chain: empty certificate chain")
    for cert in cert_nodes:
        c_pos, c_len = cert.as_bytes()
        req.x5chain.append(dd[c_pos : c_pos + c_len])
    req.pkx, req.pky = extract_p256_pubkey(req.x5chain[0])

    # issuerSigned: namespace -> [{elementIdentifier, elementValue}]
    if not issuer.is_variant(hd.MAP):
        raise ValueError("issuerSigned: not a map")
    for i in range(issuer.n_items):
        ns_node = issuer.index(2 * i)
        items = issuer.index(2 * i + 1)
        ns = _text_of(dd, ns_node).decode()
        if not is_supported_namespace(ns):
            raise ValueError("unsupported namespace %r" % ns)
        claim_list = []
        for j in range(items.n_items):
            it = items.index(j)
            ident_node = _lookup(dd, it, "elementIdentifier")
            val_node = _lookup(dd, it, "elementValue")
            if ident_node is None or val_node is None:
                raise ValueError("issuerSigned item missing fields")
            ident = _text_of(dd, ident_node)
            # RequestedAttribute carries the full encoded CBOR extent of
            # the value — re-parse from its header so container values
            # (arrays/maps, e.g. driving_privileges) are captured whole,
            # like the reference's cbor.RawMessage (zk/cbor.go).
            start = val_node.header_pos
            sub = hd.decode(dd, start)
            if sub is None:
                raise ValueError("elementValue: invalid CBOR")
            cbor_value = dd[start : sub[1]]
            claim_list.append({"elementIdentifier": ident.decode(),
                               "elementValue": cbor_value.hex()})
            req.attributes.append(RequestedAttribute(
                namespace_id=ns.encode(), id=ident,
                cbor_value=cbor_value))
        req.claims[ns] = claim_list
    if not 1 <= len(req.attributes) <= 4:
        raise ValueError("need 1-4 attributes, got %d" % len(req.attributes))
    return req


# ---------------------------------------------------------------------------
# the service
# ---------------------------------------------------------------------------

class VerifierService:
    """Circuit store + request handlers (framework twin of zk/proofs.go
    GetZKSpecs/VerifyProofRequest + zk/circuits.go)."""

    def __init__(self, circuit_dir: str,
                 check_chain: Optional[Callable[[List[bytes]], bool]]
                 = None,
                 require_issuer_chain: bool = True):
        self.circuit_dir = circuit_dir
        self.check_chain = check_chain
        # require_issuer_chain=False is the explicit insecure opt-out
        # for deployments that validate the issuer PKI elsewhere.
        self.require_issuer_chain = require_issuer_chain
        self._bytes: Dict[str, bytes] = {}

    def specs(self) -> List[dict]:
        return [dict(Id=s.circuit_hash, System=s.system,
                     CircuitHash=s.circuit_hash,
                     NumAttributes=s.num_attributes, Version=s.version)
                for s in ZK_SPECS]

    def circuit_bytes(self, circuit_id: str) -> Optional[bytes]:
        if circuit_id in self._bytes:
            return self._bytes[circuit_id]
        if not all(c in "0123456789abcdef" for c in circuit_id):
            return None
        path = os.path.join(self.circuit_dir, circuit_id)
        if not os.path.exists(path):
            return None
        data = open(path, "rb").read()
        self._bytes[circuit_id] = data
        return data

    def zkverify(self, transcript: bytes, device_response: bytes) -> dict:
        try:
            req = process_device_response(device_response)
        except (ValueError, AssertionError, IndexError) as e:
            return dict(Status=False,
                        Message="Error processing cbor request: %s" % e)
        req.transcript = transcript
        # issuer chain validation (zk/cbor.go validateIssuerKey): the
        # proof is only as trustworthy as the certificate the issuer key
        # came from.
        if self.check_chain is not None:
            if not self.check_chain(req.x5chain):
                return dict(Status=False,
                            Message="issuer certificate chain rejected")
        elif self.require_issuer_chain:
            return dict(Status=False,
                        Message="no issuer trust store configured "
                                "(refusing unvalidated msoX5chain)")
        spec = find_zk_spec(req.system, req.circuit_id)
        if spec is None:
            return dict(Status=False,
                        Message="unknown zk spec %s" % req.circuit_id)
        cb = self.circuit_bytes(req.circuit_id)
        if cb is None:
            return dict(Status=False,
                        Message="circuit %s not available" % req.circuit_id)
        try:
            ok = api.run_mdoc_verifier(
                cb, req.pkx, req.pky, req.transcript, req.attributes,
                req.now, req.proof, req.doc_type, spec)
        except (MdocError, ValueError, AssertionError) as e:
            return dict(Status=False, Message="verifier error: %s" % e)
        resp = dict(Status=bool(ok), Claims=req.claims)
        if not ok:
            resp["Message"] = "proof did not verify"
        return resp


def make_handler(svc: VerifierService):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, status: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/specs":
                self._json(200, svc.specs())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/zkverify":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n))
                tr = base64.b64decode(req["Transcript"])
                dr = base64.b64decode(req["ZKDeviceResponseCBOR"])
            except (ValueError, KeyError) as e:
                self._json(400, {"error": "Error reading request body: %s"
                                 % e})
                return
            self._json(200, svc.zkverify(tr, dr))

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(circuit_dir: str, port: int = 8888,
          issuer_roots: Optional[str] = None,
          insecure_no_chain_check: bool = False) -> None:
    check = None
    if issuer_roots:
        roots = [open(os.path.join(issuer_roots, f), "rb").read()
                 for f in sorted(os.listdir(issuer_roots))]
        check = x509_chain_checker(roots)
    svc = VerifierService(circuit_dir, check_chain=check,
                          require_issuer_chain=not insecure_no_chain_check)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(svc))
    print("verifier service on :%d (circuits: %s)" % (port, circuit_dir))
    httpd.serve_forever()


def main() -> None:
    ap = argparse.ArgumentParser(description="longfellow_zk_tpu verifier "
                                 "service (twin of the Go demo server)")
    ap.add_argument("--circuit_dir", required=True)
    ap.add_argument("--port", type=int, default=8888)
    ap.add_argument("--issuer_roots", default=None,
                    help="directory of trusted issuer root certificates "
                         "(DER or PEM); required unless "
                         "--insecure_no_chain_check")
    ap.add_argument("--insecure_no_chain_check", action="store_true",
                    help="accept any msoX5chain (issuer PKI validated "
                         "elsewhere)")
    args = ap.parse_args()
    serve(args.circuit_dir, args.port, args.issuer_roots,
          args.insecure_no_chain_check)


if __name__ == "__main__":
    main()
