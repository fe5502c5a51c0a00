"""SHA-3/SHAKE256 tests (mirrors reference sha3_reference_test.cc and
sha3_circuit_test.cc, over GF(2^128) instead of Fp24_6)."""

import hashlib
import random

import pytest

from longfellow_zk_tpu.circuits.sha3 import (
    Sha3Circuit, Sha3Reference, Sha3Witness, keccak_rc, keccak_rotc,
    sha3_slice_at)
from longfellow_zk_tpu.compiler.logic import (
    CompilerBackend, EvaluationBackend, Logic)
from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit, dump_info
from longfellow_zk_tpu.fields.gf2 import gf2_128
from longfellow_zk_tpu.zk.testing import (
    rs_factory_for, run_failing_test_zk, run_test_zk)


def test_computed_constants_match_fips():
    # spot values from FIPS 202 (sha3_round_constants.cc:24-36)
    rc = keccak_rc()
    assert rc[0] == 0x0000000000000001
    assert rc[1] == 0x0000000000008082
    assert rc[12] == 0x000000008000808B
    assert rc[23] == 0x8000000080008008
    assert keccak_rotc() == [1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 2, 14,
                             27, 41, 56, 8, 25, 43, 62, 18, 39, 61, 20, 44]


@pytest.mark.parametrize("seedlen,outlen", [(0, 32), (3, 32), (64, 64),
                                            (135, 32), (136, 32),
                                            (200, 300)])
def test_reference_shake256_matches_hashlib(seedlen, outlen):
    seed = bytes(random.Random(seedlen).randrange(256)
                 for _ in range(seedlen))
    want = hashlib.shake_256(seed).digest(outlen)
    assert Sha3Reference.shake256(seed, outlen) == want


def _eval_logic(F, witness_vals):
    vals = iter(witness_vals)

    class _Bk(EvaluationBackend):
        def input_wire(self):
            return next(vals)

    return Logic(_Bk(F), F)


def _bits_to_bytes(L, v8s):
    out = bytearray()
    for v in v8s:
        b = 0
        for i, bit in enumerate(v):
            b |= int(L.eval(bit) == L.F.of_scalar(1)) << i
        out.append(b)
    return bytes(out)


@pytest.mark.parametrize("seed,outlen", [(b"", 32), (b"abc", 32),
                                         (b"x" * 140, 200)])
def test_shake256_circuit_eval_backend(seed, outlen):
    F = gf2_128()
    bws_host = Sha3Witness.compute_witness_shake256(seed, outlen)
    wvals = Sha3Witness.fill_witness(F, bws_host)
    L = _eval_logic(F, wvals)
    shac = Sha3Circuit(L)
    assert shac.num_block_witnesses(len(seed), outlen) == len(bws_host)
    seed_w = [L.bits(8, b) for b in seed]
    bws = [shac.block_witness_input() for _ in bws_host]
    out = shac.assert_shake256(seed_w, outlen, bws)  # asserts internally
    got = _bits_to_bytes(L, out)
    assert got == hashlib.shake_256(seed).digest(outlen)


def test_shake256_eval_backend_bad_witness_fails():
    F = gf2_128()
    seed = b"abc"
    bws_host = Sha3Witness.compute_witness_shake256(seed, 32)
    wvals = Sha3Witness.fill_witness(F, bws_host)
    wvals[5] = F.of_scalar(1) if wvals[5] == 0 else 0  # flip one bit
    L = _eval_logic(F, wvals)
    shac = Sha3Circuit(L)
    bws = [shac.block_witness_input() for _ in bws_host]
    with pytest.raises(AssertionError):
        shac.assert_shake256([L.bits(8, b) for b in seed], 32, bws)


def _compile_keccak_w():
    F = gf2_128()
    qc = QuadCircuit(F)
    L = Logic(CompilerBackend(qc), F)
    shac = Sha3Circuit(L)
    A = shac.input_state()
    qc.private_input()
    bw = shac.block_witness_input()
    shac.keccak_f_1600_w(A, bw)
    return F, qc.mkcircuit(nc=1), qc


@pytest.mark.slow
def test_keccak_witnessed_circuit_zk():
    F, circ, qc = _compile_keccak_w()
    print(dump_info("sha3", qc))

    rng = random.Random(7)
    A = [[rng.getrandbits(64) for _ in range(5)] for _ in range(5)]
    A_in = [[A[x][y] for y in range(5)] for x in range(5)]
    bw_host = []
    Sha3Witness.compute_witness_block(A, bw_host)

    W = [F.of_scalar(1)]
    for x in range(5):
        for y in range(5):
            W.extend(F.of_scalar((A_in[x][y] >> i) & 1) for i in range(64))
    W.extend(Sha3Witness.fill_witness(F, [bw_host]))
    assert len(W) == circ.ninputs, (len(W), circ.ninputs)

    rs = rs_factory_for(F)
    ok, why = run_test_zk(circ, W, W[:circ.npub_in], F, rs)
    assert ok, why

    # corrupt one witnessed round bit: the prover must refuse
    W2 = list(W)
    i = 1 + 1600 + 17
    W2[i] = F.of_scalar(0) if W2[i] == F.of_scalar(1) else F.of_scalar(1)
    assert run_failing_test_zk(circ, W2, F, rs)
