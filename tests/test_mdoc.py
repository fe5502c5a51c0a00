"""mdoc layer tests (mirrors reference mdoc_zk_test.cc): real-wallet
example parsing, witness satisfaction of the reference-shipped circuits,
and the full run_mdoc_prover/run_mdoc_verifier round trip."""

import hashlib
import json
import os

import pytest

from longfellow_zk_tpu.circuits.mac.mac import MACReference
from longfellow_zk_tpu.circuits.mdoc import api
from longfellow_zk_tpu.circuits.mdoc.witness import (
    MdocHashWitness, MdocSignatureWitness, ParsedMdoc, RequestedAttribute,
    compute_transcript_hash)
from longfellow_zk_tpu.circuits.mdoc.zk_spec import find_zk_spec_by_version
from longfellow_zk_tpu.ec.curves import ecdsa_verify_host, p256_curve
from longfellow_zk_tpu.random_oracle.engine import DeterministicEngine

CIRCUITS_DIR = "/root/reference/lib/circuits/mdoc/circuits"
EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "mdoc_examples.json")


def _example(i=0):
    ex = json.load(open(EXAMPLES))[i]
    return (bytes.fromhex(ex["mdoc"]), bytes.fromhex(ex["transcript"]),
            int(ex["pkx"], 16), int(ex["pky"], 16), ex["now"].encode())


def _attrs():
    return [RequestedAttribute(id=b"age_over_18", cbor_value=b"\xf5")]


def test_parse_device_response():
    mdoc, tr, pkx, pky, now = _example()
    pm = ParsedMdoc()
    pm.parse_device_response(mdoc)
    assert pm.doc_type == b"org.iso.18013.5.1.mDL"
    ids = [mdoc[a.id_ind : a.id_ind + a.id_len] for a in pm.attributes]
    assert b"age_over_18" in ids
    assert pm.sig.len == 64 and pm.dksig.len == 64


def test_issuer_and_device_signatures_verify():
    """Host ECDSA check of both real-wallet signatures, incl. the COSE1
    transcript hash computation (mdoc_witness.h:436-495)."""
    mdoc, tr, pkx, pky, now = _example()
    pm = ParsedMdoc()
    pm.parse_device_response(mdoc)
    ec = p256_curve()
    e = int.from_bytes(hashlib.sha256(pm.tagged_mso_bytes).digest(), "big")
    ln = pm.sig.len
    r = int.from_bytes(mdoc[pm.sig.pos : pm.sig.pos + ln // 2], "big")
    s = int.from_bytes(mdoc[pm.sig.pos + ln // 2 : pm.sig.pos + ln], "big")
    assert ecdsa_verify_host(ec, pkx, pky, e, r, s)

    e2 = compute_transcript_hash(tr, pm.doc_type)
    pmso = pm.t_mso.pos + 5
    dpkx = int.from_bytes(mdoc[pmso + pm.dev_key_pkx.pos :
                               pmso + pm.dev_key_pkx.pos + 32], "big")
    dpky = int.from_bytes(mdoc[pmso + pm.dev_key_pky.pos :
                               pmso + pm.dev_key_pky.pos + 32], "big")
    r2 = int.from_bytes(mdoc[pm.dksig.pos : pm.dksig.pos + 32], "big")
    s2 = int.from_bytes(mdoc[pm.dksig.pos + 32 : pm.dksig.pos + 64], "big")
    assert ecdsa_verify_host(ec, dpkx, dpky, e2, r2, s2)


def test_witness_layout_matches_shipped_circuits():
    """Wire counts of our witness builders match the reference-shipped
    v7 1-attribute circuits exactly."""
    spec = find_zk_spec_by_version(7, 1)
    path = os.path.join(CIRCUITS_DIR, spec.circuit_hash)
    if not os.path.exists(path):
        pytest.skip("reference circuits not present")
    c_sig, c_hash = api.load_circuits(open(path, "rb").read())

    mdoc, tr, pkx, pky, now = _example()
    attrs = _attrs()
    GF, FB = api.GF, api.FB
    hw = MdocHashWitness(1, GF, 7)
    hw.compute_witness(mdoc, tr, attrs)
    sw = MdocSignatureWitness(p256_curve(), FB)
    sw.compute_witness(pkx, pky, mdoc, tr)
    assert hw.e_nat == sw.e_nat

    rng = DeterministicEngine(b"layout")
    ap = MACReference().sample(6, rng)
    av = int.from_bytes(rng.bytes(16), "little")
    macs, _ = api.compute_macs(
        [hw.e_nat % FB.p, hw.dpkx_nat, hw.dpky_nat], ap, av)

    W_sig = api.fill_sig_public(pkx, pky, sw.e2_nat, macs, av)
    assert len(W_sig) == c_sig.npub_in
    W_sig.extend(sw.fill_witness(ap))
    assert len(W_sig) == c_sig.ninputs

    W_hash = api.fill_hash_public(attrs, now, macs, av, 7)
    assert len(W_hash) == c_hash.npub_in
    for val in (hw.e_nat % FB.p, hw.dpkx_nat, hw.dpky_nat):
        W_hash.extend(GF.of_scalar((val >> i) & 1) for i in range(256))
    W_hash.extend(hw.fill_witness())
    for i in range(3):
        W_hash.extend(ap[2 * i : 2 * i + 2])
    assert len(W_hash) == c_hash.ninputs
    assert c_hash.subfield_boundary == c_hash.ninputs - 6


@pytest.mark.slow
def test_shipped_circuits_satisfied():
    """eval_circuit == 0 on both reference-shipped circuits under our
    witness (the strongest layout/semantics cross-check available
    without building the C++ library)."""
    import jax.numpy as jnp
    import numpy as np

    from longfellow_zk_tpu.sumcheck.prover_device import DeviceSumcheckProver

    spec = find_zk_spec_by_version(7, 1)
    path = os.path.join(CIRCUITS_DIR, spec.circuit_hash)
    if not os.path.exists(path):
        pytest.skip("reference circuits not present")
    c_sig, c_hash = api.load_circuits(open(path, "rb").read())

    mdoc, tr, pkx, pky, now = _example()
    attrs = _attrs()
    GF, FB = api.GF, api.FB
    hw = MdocHashWitness(1, GF, 7)
    hw.compute_witness(mdoc, tr, attrs)
    sw = MdocSignatureWitness(p256_curve(), FB)
    sw.compute_witness(pkx, pky, mdoc, tr)
    rng = DeterministicEngine(b"evalcheck")
    ap = MACReference().sample(6, rng)
    av = int.from_bytes(rng.bytes(16), "little")
    macs, _ = api.compute_macs(
        [hw.e_nat % FB.p, hw.dpkx_nat, hw.dpky_nat], ap, av)

    W_sig = api.fill_sig_public(pkx, pky, sw.e2_nat, macs, av)
    W_sig.extend(sw.fill_witness(ap))
    p = DeviceSumcheckProver(FB)
    W0 = jnp.asarray(FB.to_limbs(W_sig)).reshape(FB.L, c_sig.ninputs, 1)
    _, finalV = p.eval_circuit(c_sig, W0)
    assert finalV is not None
    assert all(v == 0 for v in np.ravel(FB.from_limbs(np.asarray(finalV))))

    W_hash = api.fill_hash_public(attrs, now, macs, av, 7)
    for val in (hw.e_nat % FB.p, hw.dpkx_nat, hw.dpky_nat):
        W_hash.extend(GF.of_scalar((val >> i) & 1) for i in range(256))
    W_hash.extend(hw.fill_witness())
    for i in range(3):
        W_hash.extend(ap[2 * i : 2 * i + 2])
    ph = DeviceSumcheckProver(GF)
    W0h = jnp.asarray(GF.to_limbs(W_hash)).reshape(8, c_hash.ninputs, 1)
    _, finalVh = ph.eval_circuit(c_hash, W0h)
    assert finalVh is not None
    assert all(v == 0 for v in np.ravel(GF.from_limbs(np.asarray(finalVh))))


@pytest.mark.slow
def test_run_mdoc_prover_verifier_e2e():
    """The full product path: run_mdoc_prover on a real wallet example
    against the shipped circuit, then run_mdoc_verifier accepts."""
    spec = find_zk_spec_by_version(7, 1)
    path = os.path.join(CIRCUITS_DIR, spec.circuit_hash)
    if not os.path.exists(path):
        pytest.skip("reference circuits not present")
    circuit_bytes = open(path, "rb").read()
    mdoc, tr, pkx, pky, now = _example()
    attrs = _attrs()

    proof = api.run_mdoc_prover(circuit_bytes, mdoc, pkx, pky, tr, attrs,
                                now, spec, rng=DeterministicEngine(b"e2e"))
    assert len(proof) > 20000
    ok = api.run_mdoc_verifier(circuit_bytes, pkx, pky, tr, attrs, now,
                               proof, b"org.iso.18013.5.1.mDL", spec)
    assert ok


ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "mdoc_v7_1attr.zst")


def test_generated_circuit_parses_and_matches_layout():
    """api.generate_circuit output (artifacts/mdoc_v7_1attr.zst, built by
    scripts/gen_mdoc_circuit.py) parses through load_circuits with the
    same wire layout as the reference-shipped v7 1-attribute circuits
    (mdoc_generate_circuit.cc:53-118 duty)."""
    data = open(ARTIFACT, "rb").read()
    c_sig, c_hash = api.load_circuits(data)
    assert c_sig.ninputs == 3739 and c_sig.npub_in == 900
    assert c_hash.npub_in == 952
    assert c_hash.subfield_boundary == c_hash.ninputs - 6
    cid = api.circuit_id(data)
    assert len(cid) == 64


@pytest.mark.slow
def test_generated_circuits_satisfied_by_wallet_witness():
    """Both OUR generated circuits evaluate to zero on the real wallet
    example witness (the strongest self-consistency check short of the
    full prove, which test_run_mdoc_prover_verifier_e2e covers for the
    shipped bytes)."""
    import jax.numpy as jnp
    import numpy as np

    from longfellow_zk_tpu.sumcheck.prover_device import DeviceSumcheckProver

    GF, FB = api.GF, api.FB
    c_sig, c_hash = api.load_circuits(open(ARTIFACT, "rb").read())
    mdoc, tr, pkx, pky, now = _example()
    attrs = _attrs()
    hw = MdocHashWitness(1, GF, 7)
    hw.compute_witness(mdoc, tr, attrs)
    sw = MdocSignatureWitness(p256_curve(), FB)
    sw.compute_witness(pkx, pky, mdoc, tr)
    rng = DeterministicEngine(b"gencheck")
    ap = MACReference().sample(6, rng)
    av = int.from_bytes(rng.bytes(16), "little")
    macs, _ = api.compute_macs(
        [hw.e_nat % FB.p, hw.dpkx_nat, hw.dpky_nat], ap, av)

    W_sig = api.fill_sig_public(pkx, pky, sw.e2_nat, macs, av)
    W_sig.extend(sw.fill_witness(ap))
    assert len(W_sig) == c_sig.ninputs
    p = DeviceSumcheckProver(FB)
    W0 = jnp.asarray(FB.to_limbs(W_sig)).reshape(FB.L, c_sig.ninputs, 1)
    _, fv = p.eval_circuit(c_sig, W0)
    assert fv is not None
    assert all(v == 0 for v in np.ravel(FB.from_limbs(np.asarray(fv))))

    W_hash = api.fill_hash_public(attrs, now, macs, av, 7)
    for val in (hw.e_nat % FB.p, hw.dpkx_nat, hw.dpky_nat):
        W_hash.extend(GF.of_scalar((val >> i) & 1) for i in range(256))
    W_hash.extend(hw.fill_witness())
    for i in range(3):
        W_hash.extend(ap[2 * i : 2 * i + 2])
    assert len(W_hash) == c_hash.ninputs
    ph = DeviceSumcheckProver(GF)
    W0h = jnp.asarray(GF.to_limbs(W_hash)).reshape(8, c_hash.ninputs, 1)
    _, fvh = ph.eval_circuit(c_hash, W0h)
    assert fvh is not None
    assert all(v == 0 for v in np.ravel(GF.from_limbs(np.asarray(fvh))))
