"""CBOR parser v2 tests (mirrors reference cbor_parser_v2/parser_test.cc
and parser_circuit_test.cc): decode+parse under the eval backend over
both field families, positional assertions, negative cases, compiled ZK."""

import pytest

from longfellow_zk_tpu.circuits.cbor.parser_v2 import (
    CborParserV2, CborWitnessV2, K_NCOUNTERS)
from longfellow_zk_tpu.compiler.logic import (
    CompilerBackend, EvaluationBackend, Logic)
from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit, dump_info
from longfellow_zk_tpu.fields.fp_instances import (
    fp128, P128_OMEGA, P128_OMEGA_ORDER)
from longfellow_zk_tpu.fields.gf2 import gf2_128
from longfellow_zk_tpu.zk.testing import rs_factory_for, run_test_zk

# {"a": 1, "b": [2, 3]}
DOC = bytes([0xA2, 0x61, 0x61, 0x01, 0x61, 0x62, 0x82, 0x02, 0x03])
# tag0("2023-11-01T09:00:00Z")
DATE_DOC = bytes([0xC0, 0x74]) + b"2023-11-01T09:00:00Z"

IBITS = 5  # small index space for tests (kIndexBits=12 in production)


def _setup(F, doc: bytes, n: int):
    wit = CborWitnessV2(F, index_bits=IBITS)
    data = bytes(n - len(doc)) + doc
    in_bits, pws = wit.compute_witnesses(n, len(doc), data)
    bk = EvaluationBackend(F)
    bk.feed(in_bits)
    bk.feed(wit.fill(pws))
    L = Logic(bk, F)
    cbor = CborParserV2(L, index_bits=IBITS)
    inp = [L.vinput(8) for _ in range(n)]
    pw = cbor.witness_wires(n)
    ds, ps = cbor.decode_and_assert_decode_and_parse(n, inp, pw)
    return wit, L, cbor, ds, ps


@pytest.mark.parametrize("mkF", [fp128, gf2_128])
def test_decode_parse_and_assertions(mkF):
    F = mkF()
    n = 16
    jroot = n - len(DOC)
    wit, L, cbor, ds, ps = _setup(F, DOC, n)

    cbor.assert_input_starts_at(
        n, L.bits(IBITS, jroot), L.bits(IBITS, len(DOC)), ds)
    cbor.assert_map_header(n, L.bits(IBITS, jroot), ds)
    cbor.assert_text_at(n, L.bits(IBITS, jroot + 1), b"a", ds)
    cbor.assert_unsigned_at(n, L.bits(IBITS, jroot + 3), 1, ds)
    cbor.assert_text_at(n, L.bits(IBITS, jroot + 4), b"b", ds)
    # ("a" -> 1) is pair 0; ("b" -> [2,3]) is pair 1 of the map at jroot
    cbor.assert_map_entry(n, L.bits(IBITS, jroot), 0, L.bits(IBITS, jroot + 1),
                          L.bits(IBITS, jroot + 3), 0, ds, ps)
    cbor.assert_map_entry(n, L.bits(IBITS, jroot), 0, L.bits(IBITS, jroot + 4),
                          L.bits(IBITS, jroot + 6), 1, ds, ps)
    # the array [2,3] is a header at jroot+6; 2 and 3 at +7, +8
    cbor.assert_header(n, L.bits(IBITS, jroot + 6), ds)
    cbor.assert_unsigned_at(n, L.bits(IBITS, jroot + 7), 2, ds)
    cbor.assert_unsigned_at(n, L.bits(IBITS, jroot + 8), 3, ds)


@pytest.mark.parametrize("mkF", [fp128, gf2_128])
def test_wrong_assertions_fail(mkF):
    F = mkF()
    n = 16
    jroot = n - len(DOC)
    wit, L, cbor, ds, ps = _setup(F, DOC, n)
    with pytest.raises(AssertionError):
        cbor.assert_text_at(n, L.bits(IBITS, jroot + 1), b"x", ds)
    with pytest.raises(AssertionError):
        cbor.assert_unsigned_at(n, L.bits(IBITS, jroot + 3), 2, ds)
    with pytest.raises(AssertionError):
        # jroot+2 is inside the text "a", not a header
        cbor.assert_header(n, L.bits(IBITS, jroot + 2), ds)
    with pytest.raises(AssertionError):
        # not a map at jroot+6 (it's an array)
        cbor.assert_map_header(n, L.bits(IBITS, jroot + 6), ds)
    with pytest.raises(AssertionError):
        # wrong pair index j
        cbor.assert_map_entry(n, L.bits(IBITS, jroot), 0, L.bits(IBITS, jroot + 1),
                              L.bits(IBITS, jroot + 3), 1, ds, ps)


def test_date_assertions():
    F = fp128()
    n = 32
    jroot = n - len(DATE_DOC)
    wit, L, cbor, ds, ps = _setup(F, DATE_DOC, n)
    after = [L.bits(8, b) for b in b"2023-10-31T00:00:00Z"]
    before = [L.bits(8, b) for b in b"2024-01-01T00:00:00Z"]
    cbor.assert_date_before_at(n, L.bits(IBITS, jroot), before, ds)
    cbor.assert_date_after_at(n, L.bits(IBITS, jroot), after, ds)
    with pytest.raises(AssertionError):
        cbor.assert_date_before_at(n, L.bits(IBITS, jroot), after, ds)


def test_corrupt_witness_fails():
    F = fp128()
    n = 16
    data = bytes(n - len(DOC)) + DOC
    wit = CborWitnessV2(F, index_bits=IBITS)
    in_bits, pws = wit.compute_witnesses(n, len(DOC), data)
    pws[5].slen_next += 1  # corrupt one countdown
    bk = EvaluationBackend(F)
    bk.feed(in_bits)
    bk.feed(wit.fill(pws))
    L = Logic(bk, F)
    cbor = CborParserV2(L, index_bits=IBITS)
    inp = [L.vinput(8) for _ in range(n)]
    pw = cbor.witness_wires(n)
    with pytest.raises(AssertionError):
        cbor.decode_and_assert_decode_and_parse(n, inp, pw)


def _compile_parser(F, n: int):
    qc = QuadCircuit(F)
    L = Logic(CompilerBackend(qc), F)
    cbor = CborParserV2(L, index_bits=IBITS)
    inp = [L.vinput(8) for _ in range(n)]
    qc.private_input()
    pw = cbor.witness_wires(n)
    ds, ps = cbor.decode_and_assert_decode_and_parse(n, inp, pw)
    wit = CborWitnessV2(F, index_bits=IBITS)
    jroot = n - len(DOC)
    cbor.assert_map_header(n, L.bits(IBITS, jroot), ds)
    cbor.assert_text_at(n, L.bits(IBITS, jroot + 1), b"a", ds)
    return qc.mkcircuit(nc=1), qc


@pytest.mark.slow
def test_parser_compiled_zk():
    F = fp128()
    n = 16
    circ, qc = _compile_parser(F, n)
    print(dump_info("cbor_v2", qc))
    wit = CborWitnessV2(F, index_bits=IBITS)
    data = bytes(n - len(DOC)) + DOC
    in_bits, pws = wit.compute_witnesses(n, len(DOC), data)
    W = [F.of_scalar(1)] + in_bits + wit.fill(pws)
    assert len(W) == circ.ninputs, (len(W), circ.ninputs)
    rs = rs_factory_for(F, P128_OMEGA, P128_OMEGA_ORDER)
    ok, why = run_test_zk(circ, W, W[:circ.npub_in], F, rs)
    assert ok, why
