"""Our OWN MdocSignature/MdocHash circuits under the evaluation backend
with real-wallet witnesses (wire-free satisfaction check, the same
pattern as reference mdoc circuit tests)."""

import json
import os

import pytest

from longfellow_zk_tpu.circuits.mac.mac import MACReference, fill_gf2k_bits
from longfellow_zk_tpu.circuits.mdoc import api
from longfellow_zk_tpu.circuits.mdoc.signature_circuit import (
    MdocSignature, MdocSignatureWitnessW)
from longfellow_zk_tpu.circuits.mdoc.witness import (
    MdocHashWitness, MdocSignatureWitness, RequestedAttribute)
from longfellow_zk_tpu.circuits.mdoc.zk_spec import find_zk_spec_by_version
from longfellow_zk_tpu.compiler.logic import EvaluationBackend, Logic
from longfellow_zk_tpu.ec.curves import p256_curve
from longfellow_zk_tpu.random_oracle.engine import DeterministicEngine

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "mdoc_examples.json")


def _setup():
    ex = json.load(open(EXAMPLES))[0]
    mdoc = bytes.fromhex(ex["mdoc"])
    tr = bytes.fromhex(ex["transcript"])
    pkx, pky = int(ex["pkx"], 16), int(ex["pky"], 16)
    now = ex["now"].encode()
    attrs = [RequestedAttribute(id=b"age_over_18", cbor_value=b"\xf5")]
    GF, FB = api.GF, api.FB
    hw = MdocHashWitness(1, GF, 7)
    hw.compute_witness(mdoc, tr, attrs)
    sw = MdocSignatureWitness(p256_curve(), FB)
    sw.compute_witness(pkx, pky, mdoc, tr)
    rng = DeterministicEngine(b"eval backend")
    ap = MACReference().sample(6, rng)
    av = int.from_bytes(rng.bytes(16), "little")
    macs, _ = api.compute_macs(
        [hw.e_nat % FB.p, hw.dpkx_nat, hw.dpky_nat], ap, av)
    return mdoc, tr, pkx, pky, now, attrs, hw, sw, ap, av, macs


@pytest.mark.slow
def test_our_signature_circuit_eval_backend():
    mdoc, tr, pkx, pky, now, attrs, hw, sw, ap, av, macs = _setup()
    FB = api.FB
    bk = EvaluationBackend(FB)
    L = Logic(bk, FB)

    W_sig = api.fill_sig_public(pkx, pky, sw.e2_nat, macs, av)
    W_sig = W_sig[1:]  # drop the implicit one-wire
    W_sig.extend(sw.fill_witness(ap))
    bk.feed(W_sig)

    ec = p256_curve()
    ms = MdocSignature(L, ec, ec.order)
    pkX = L.eltw_input()
    pkY = L.eltw_input()
    htr = L.eltw_input()
    mac_w = [[L.input() for _ in range(128)] for _ in range(7)]
    vw = MdocSignatureWitnessW()
    vw.input(L, ec.kBits, ms.mac)
    # must not raise
    ms.assert_signatures(pkX, pkY, htr, mac_w[0:2], mac_w[2:4], mac_w[4:6],
                         mac_w[6], vw)

    # flipped MAC must fail
    bad = list(W_sig)
    bad[3] ^= 1  # first mac bit
    bk2 = EvaluationBackend(FB)
    L2 = Logic(bk2, FB)
    bk2.feed(bad)
    ms2 = MdocSignature(L2, ec, ec.order)
    pkX = L2.eltw_input(); pkY = L2.eltw_input(); htr = L2.eltw_input()
    mac_w = [[L2.input() for _ in range(128)] for _ in range(7)]
    vw = MdocSignatureWitnessW()
    vw.input(L2, ec.kBits, ms2.mac)
    with pytest.raises(AssertionError):
        ms2.assert_signatures(pkX, pkY, htr, mac_w[0:2], mac_w[2:4],
                              mac_w[4:6], mac_w[6], vw)


@pytest.mark.slow
def test_our_hash_circuit_eval_backend():
    mdoc, tr, pkx, pky, now, attrs, hw, sw, ap, av, macs = _setup()
    GF, FB = api.GF, api.FB
    bk = EvaluationBackend(GF)
    L = Logic(bk, GF)

    W_hash = api.fill_hash_public(attrs, now, macs, av, 7)
    W_hash = W_hash[1:]  # drop the implicit one-wire
    for val in (hw.e_nat % FB.p, hw.dpkx_nat, hw.dpky_nat):
        W_hash.extend(GF.of_scalar((val >> i) & 1) for i in range(256))
    W_hash.extend(hw.fill_witness())
    for i in range(3):
        W_hash.extend(ap[2 * i : 2 * i + 2])
    bk.feed(W_hash)

    from longfellow_zk_tpu.circuits.mac.mac import MACGF2
    from longfellow_zk_tpu.circuits.mdoc.hash_circuit import (
        MdocHash, MdocHashWitnessW, OpenedAttribute)

    mh = MdocHash(L, version=7)
    mac_check = MACGF2(L)
    oa = []
    for _ in attrs:
        o = OpenedAttribute()
        o.input(L)
        oa.append(o)
    noww = [L.vinput(8) for _ in range(20)]
    mac_in = [L.eltw_input() for _ in range(7)]
    e = L.vinput(256)
    dpkx = L.vinput(256)
    dpky = L.vinput(256)
    vw = MdocHashWitnessW(num_attr=1, version=7)
    vw.input(L, mh.sha)
    macw = [mac_check.witness_input() for _ in range(3)]

    # must not raise
    mh.assert_valid_hash_mdoc(oa, noww, e, dpkx, dpky, vw)
    a_v = mac_in[6]
    mac_check.verify_mac(mac_in[0:2], a_v, e, macw[0])
    mac_check.verify_mac(mac_in[2:4], a_v, dpkx, macw[1])
    mac_check.verify_mac(mac_in[4:6], a_v, dpky, macw[2])
