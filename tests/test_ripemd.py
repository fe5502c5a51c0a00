"""RIPEMD-160 tests (mirrors reference ripemd_circuit_test.cc)."""

import random

import pytest

from longfellow_zk_tpu.circuits.ripemd import (
    KL, KR, RL, RR, Ripemd160Circuit, compute_witness, fill_witness,
    message_wires, ripemd160)
from longfellow_zk_tpu.compiler.logic import (
    CompilerBackend, EvaluationBackend, Logic)
from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit, dump_info
from longfellow_zk_tpu.fields.fp_instances import (
    fp128, P128_OMEGA, P128_OMEGA_ORDER)
from longfellow_zk_tpu.zk.testing import rs_factory_for, run_test_zk


def test_computed_constants_match_paper():
    # spot-check vs ripemd_constants.h tables
    assert RL[1] == [7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8]
    assert RL[4] == [4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13]
    assert RR[0] == [5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12]
    assert RR[4] == [12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11]
    assert KL == [0, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xA953FD4E]
    assert KR == [0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0]


def test_reference_vectors():
    # Dobbertin-Bosselaers-Preneel test vectors
    assert ripemd160(b"").hex() == \
        "9c1185a5c5e9fc54612808977ee8f548b2258d31"
    assert ripemd160(b"abc").hex() == \
        "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc"
    assert ripemd160(b"message digest").hex() == \
        "5d0689ef49d2fae572b881b123a85ffa21595f36"
    assert ripemd160(b"a" * 64).hex() == \
        ripemd160(bytes(b"a" * 64)).hex()  # multi-block path smoke
    assert ripemd160(
        b"abcdefghijklmnopqrstuvwxyz").hex() == \
        "f71c27109c692c1b56bbdceb5b9d2865b3708dbc"


def _eval_logic(F, witness_vals):
    vals = iter(witness_vals)

    class _Bk(EvaluationBackend):
        def input_wire(self):
            return next(vals)

    return Logic(_Bk(F), F)


@pytest.mark.parametrize("msg,maxb", [(b"abc", 1), (b"abc", 2),
                                      (b"x" * 80, 2)])
def test_message_hash_eval_backend(msg, maxb):
    F = fp128()
    traces = compute_witness(msg, maxb)
    wvals = fill_witness(F, traces)
    L = _eval_logic(F, wvals)
    rc = Ripemd160Circuit(L)
    bws = [rc.block_witness_input() for _ in range(maxb)]

    from longfellow_zk_tpu.circuits.ripemd.reference import ripemd160_pad
    nblocks = len(ripemd160_pad(msg)) // 64
    inp_bits = message_wires(F, msg, maxb)
    inp = [[L.bitw_of(L.konst(inp_bits[8 * i + j])) for j in range(8)]
           for i in range(64 * maxb)]
    nb = L.bits(8, nblocks)
    digest = ripemd160(msg)
    target = []
    for byte in digest:
        target.extend(L.bit((byte >> i) & 1) for i in range(8))
    rc.assert_message_hash(maxb, nb, inp, target, bws)  # asserts inside


def test_bad_digest_fails_eval_backend():
    F = fp128()
    msg = b"abc"
    traces = compute_witness(msg, 1)
    L = _eval_logic(F, fill_witness(F, traces))
    rc = Ripemd160Circuit(L)
    bws = [rc.block_witness_input()]
    inp_bits = message_wires(F, msg, 1)
    inp = [[L.bitw_of(L.konst(inp_bits[8 * i + j])) for j in range(8)]
           for i in range(64)]
    digest = bytearray(ripemd160(msg))
    digest[3] ^= 4
    target = []
    for byte in digest:
        target.extend(L.bit((byte >> i) & 1) for i in range(8))
    with pytest.raises(AssertionError):
        rc.assert_message_hash(1, L.bits(8, 1), inp, target, bws)


def _compile_ripemd(maxb: int):
    F = fp128()
    qc = QuadCircuit(F)
    L = Logic(CompilerBackend(qc), F)
    rc = Ripemd160Circuit(L)
    nb = L.vinput(8)
    inp = [L.vinput(8) for _ in range(64 * maxb)]
    target = L.vinput(160)
    qc.private_input()
    bws = [rc.block_witness_input() for _ in range(maxb)]
    rc.assert_message_hash(maxb, nb, inp, target, bws)
    return F, qc.mkcircuit(nc=1), qc


@pytest.mark.slow
def test_ripemd_compiled_zk():
    maxb = 1
    F, circ, qc = _compile_ripemd(maxb)
    print(dump_info("ripemd", qc))

    msg = b"abc"
    W = [F.of_scalar(1)]
    W.extend(F.of_scalar((1 >> i) & 1) for i in range(8))  # nb = 1
    W.extend(message_wires(F, msg, maxb))
    for byte in ripemd160(msg):
        W.extend(F.of_scalar((byte >> i) & 1) for i in range(8))
    W.extend(fill_witness(F, compute_witness(msg, maxb)))
    assert len(W) == circ.ninputs, (len(W), circ.ninputs)

    rs = rs_factory_for(F, P128_OMEGA, P128_OMEGA_ORDER)
    ok, why = run_test_zk(circ, W, W[:circ.npub_in], F, rs)
    assert ok, why
