"""Logic DSL + compiler tests (mirrors reference logic_test.cc,
compiler_test.cc): evaluation-backend truth tables, adders vs integer
oracle, compile-vs-evaluate agreement, and prove/verify of a compiled
circuit."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.compiler.logic import (
    CompilerBackend,
    EvaluationBackend,
    Logic,
)
from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit
from longfellow_zk_tpu.fields.fp_instances import fp128
from longfellow_zk_tpu.fields.gf2 import gf2_128


def _eval_logic(F):
    bk = EvaluationBackend(F)
    return Logic(bk, F), bk


@pytest.mark.parametrize("field_fn", [fp128, gf2_128])
def test_gates_truth_tables(field_fn):
    F = field_fn()
    L, bk = _eval_logic(F)
    for a in (0, 1):
        for b in (0, 1):
            ba, bb = L.bit(a), L.bit(b)
            assert L.eval(L.land(ba, bb)) == F.of_scalar(a & b)
            assert L.eval(L.lor(ba, bb)) == F.of_scalar(a | b)
            assert L.eval(L.lxor(ba, bb)) == F.of_scalar(a ^ b)
            assert L.eval(L.lnot(ba)) == F.of_scalar(1 - a)
            assert L.eval(L.limplies(ba, bb)) == F.of_scalar((1 - a) | b)
            for c in (0, 1):
                bc = L.bit(c)
                ch = (a & b) ^ ((1 - a) & c)
                maj = (a & b) ^ (a & c) ^ (b & c)
                assert L.eval(L.lCh(ba, bb, bc)) == F.of_scalar(ch)
                assert L.eval(L.lMaj(ba, bb, bc)) == F.of_scalar(maj)
                assert L.eval(L.mux(ba, bb, bc)) == F.of_scalar(b if a else c)


@pytest.mark.parametrize("field_fn", [fp128, gf2_128])
def test_adders_vs_int_oracle(field_fn):
    F = field_fn()
    L, _ = _eval_logic(F)
    rng = random.Random(1)
    for _ in range(10):
        x, y = rng.getrandbits(16), rng.getrandbits(16)
        bx, by = L.bits(16, x), L.bits(16, y)
        carry, s = L.ripple_carry_add(bx, by)
        got = sum(int(L.eval(b) == F.of_scalar(1)) << i
                  for i, b in enumerate(s))
        assert got == (x + y) & 0xFFFF
        assert (L.eval(carry) == F.of_scalar(1)) == ((x + y) >> 16 == 1)
        carry2, s2 = L.parallel_prefix_add(bx, by)
        got2 = sum(int(L.eval(b) == F.of_scalar(1)) << i
                   for i, b in enumerate(s2))
        assert got2 == (x + y) & 0xFFFF
        # comparisons
        assert (L.eval(L.vlt(bx, by)) == F.of_scalar(1)) == (x < y)
        assert (L.eval(L.veq(bx, by)) == F.of_scalar(1)) == (x == y)
        assert (L.eval(L.vleq(bx, by)) == F.of_scalar(1)) == (x <= y)


def test_compile_and_prove_small_circuit():
    """Build (pub + priv1*priv2 == 0) via the DSL, compile, evaluate,
    prove, verify."""
    from longfellow_zk_tpu.random_oracle.transcript import Transcript
    from longfellow_zk_tpu.sumcheck.prover_device import (
        DeviceSumcheckProver as SumcheckProver)
    from longfellow_zk_tpu.sumcheck.transcript_sumcheck import (
        TranscriptSumcheck)
    from longfellow_zk_tpu.sumcheck.verifier import verify

    F = fp128()
    qc = QuadCircuit(F)
    bk = CompilerBackend(qc)
    L = Logic(bk, F)
    pub = L.eltw_input()
    qc.private_input()
    x = L.eltw_input()
    y = L.eltw_input()
    xy = L.mul(x, y)
    z = L.add(pub, xy)
    L.assert0_elt(z)
    circ = qc.mkcircuit(nc=1)
    assert circ.ninputs == 4  # one-wire, pub, x, y
    assert circ.npub_in == 2

    rng = random.Random(3)
    xv, yv = rng.randrange(F.p), rng.randrange(F.p)
    pubv = F.neg_i(F.mul_i(xv, yv))
    W = [F.of_scalar(1), pubv, xv, yv]

    # evaluation backend agreement
    ebk = EvaluationBackend(F)
    EL = Logic(ebk, F)
    e_z = EL.add(pubv, EL.mul(xv, yv))
    ebk.assert0(e_z)  # should not raise

    prover = SumcheckProver(F)
    W0 = jnp.asarray(F.to_limbs(W)).reshape(F.L, 4, 1)
    inputs, finalV = prover.eval_circuit(circ, W0)
    assert finalV is not None
    out = F.from_limbs(np.asarray(finalV))
    assert all(v == 0 for v in np.ravel(out))
    tsp = Transcript(b"testing")
    tss = TranscriptSumcheck(tsp, F)
    tss.write_input([W])
    proof, _, _ = prover.prove(circ, inputs, tss)
    tsv = Transcript(b"testing")
    ok, why = verify(circ, proof, [W], TranscriptSumcheck(tsv, F), F)
    assert ok, why


def test_bit_plucker_roundtrip():
    from longfellow_zk_tpu.compiler.components import (
        BitPlucker, BitPluckerEncoder)

    for F in (fp128(), gf2_128()):
        L, _ = _eval_logic(F)
        bp = BitPlucker(L, 4)
        enc = BitPluckerEncoder(F, 4)
        for v in [0, 1, 7, 15]:
            e = enc.encode(v)
            bits = bp.pluck(e)
            got = sum(int(L.eval(b) == F.of_scalar(1)) << i
                      for i, b in enumerate(bits))
            assert got == v, (F.name, v, got)


def test_bit_adder_eqmod():
    from longfellow_zk_tpu.compiler.components import BitAdder

    for F in (fp128(), gf2_128()):
        L, bk = _eval_logic(F)
        BA = BitAdder(L, 8)
        rng = random.Random(9)
        for _ in range(5):
            x, y = rng.getrandbits(8), rng.getrandbits(8)
            s = (x + y) & 0xFF
            total = BA.add([L.bits(8, x), L.bits(8, y)])
            BA.assert_eqmod(L.bits(8, s), total, 2)  # no raise
