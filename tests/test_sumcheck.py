"""Sumcheck prover/verifier roundtrip tests (mirrors reference
lib/sumcheck/sumcheck_test.cc coverage: prove+verify, data-parallel
copies, assert0 layers, corrupted-proof rejection)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.fields.fp_instances import fp128
from longfellow_zk_tpu.fields.gf2 import gf2_128
from longfellow_zk_tpu.random_oracle.transcript import Transcript
from longfellow_zk_tpu.sumcheck.circuit import Circuit, Layer, Proof, Quad
from longfellow_zk_tpu.sumcheck.prover import SumcheckProver
from longfellow_zk_tpu.sumcheck.transcript_sumcheck import TranscriptSumcheck
from longfellow_zk_tpu.sumcheck.verifier import verify


def _mul_check_circuit(F, nc):
    """Two-layer circuit checking a*b == c per copy (output must be 0).

    Inputs per copy: (a, b, c, one).
    Inner layer (layers[1]): t0 = a*b, t1 = c*one, t2 = one*one,
                             t3 = a*one.
    Output layer (layers[0]): o0 = t0*t2 - t1*t2  (zero iff a*b == c),
                              o1 = t3*t2 - t3*t2  (trivially zero).
    """
    one = F.of_scalar(1)
    mone = F.neg_i(one) if not F.kCharacteristicTwo else one
    l0 = Layer(
        nw=4, logw=2,
        quad=Quad(g=np.array([0, 0, 1, 1]), h0=np.array([0, 1, 3, 3]),
                  h1=np.array([2, 2, 2, 2]), v=[one, mone, one, mone]),
    )
    l1 = Layer(
        nw=4, logw=2,
        quad=Quad(g=np.array([0, 1, 2, 3]), h0=np.array([0, 2, 3, 0]),
                  h1=np.array([1, 3, 3, 3]), v=[one, one, one, one]),
    )
    logc = (nc - 1).bit_length() if nc > 1 else 0
    return Circuit(nv=2, logv=1, nc=nc, logc=logc, nl=2, ninputs=4,
                   npub_in=4, subfield_boundary=4, layers=[l0, l1])


def _witness(F, rng):
    if F.kCharacteristicTwo:
        a, b = rng.getrandbits(128), rng.getrandbits(128)
    else:
        a, b = rng.randrange(F.p), rng.randrange(F.p)
    return [a, b, F.mul_i(a, b), F.of_scalar(1)]


def _device_w(F, W_host):
    nc = len(W_host)
    nw = len(W_host[0])
    flat = [W_host[c][w] for w in range(nw) for c in range(nc)]
    lead = 8 if F.kCharacteristicTwo else F.L
    return jnp.asarray(F.to_limbs(flat)).reshape(lead, nw, nc)


@pytest.mark.parametrize("nc", [
    1, pytest.param(2, marks=pytest.mark.slow),
    pytest.param(3, marks=pytest.mark.slow),
    pytest.param(8, marks=pytest.mark.slow)])
def test_sumcheck_roundtrip_fp128(nc):
    F = fp128()
    circ = _mul_check_circuit(F, nc)
    rng = random.Random(nc)
    W_host = [_witness(F, rng) for _ in range(nc)]
    W0 = _device_w(F, W_host)

    prover = SumcheckProver(F)
    inputs, finalV = prover.eval_circuit(circ, W0)
    assert finalV is not None
    out = F.from_limbs(np.asarray(finalV))
    assert all(v == 0 for v in np.ravel(out))

    tsp = Transcript(b"testing")
    tss = TranscriptSumcheck(tsp, F)
    tss.write_input(W_host)
    proof, aux, bnd = prover.prove(circ, inputs, tss)

    tsv = Transcript(b"testing")
    tsv_s = TranscriptSumcheck(tsv, F)
    ok, why = verify(circ, proof, W_host, tsv_s, F)
    assert ok, why


@pytest.mark.slow
def test_sumcheck_rejects_corruption():
    F = fp128()
    nc = 2
    circ = _mul_check_circuit(F, nc)
    rng = random.Random(5)
    W_host = [_witness(F, rng) for _ in range(nc)]
    W0 = _device_w(F, W_host)
    prover = SumcheckProver(F)
    inputs, _ = prover.eval_circuit(circ, W0)
    tsp = Transcript(b"testing")
    tss0 = TranscriptSumcheck(tsp, F)
    tss0.write_input(W_host)
    proof, _, _ = prover.prove(circ, inputs, tss0)
    # corrupt one round polynomial evaluation
    proof.layers[0].hp[0][0][2] = F.add_i(proof.layers[0].hp[0][0][2], 1)
    tsv = Transcript(b"testing")
    ok, why = verify(circ, proof, W_host, TranscriptSumcheck(tsv, F), F)
    assert not ok
    # corrupt witness instead
    tsp2 = Transcript(b"testing")
    tss2 = TranscriptSumcheck(tsp2, F)
    tss2.write_input(W_host)
    proof2, _, _ = prover.prove(circ, inputs, tss2)
    W_bad = [list(w) for w in W_host]
    W_bad[0][0] = F.add_i(W_bad[0][0], 1)
    tsv2 = Transcript(b"testing")
    ok2, _ = verify(circ, proof2, W_bad, TranscriptSumcheck(tsv2, F), F)
    assert not ok2


def test_sumcheck_assert0():
    """Layer with a beta (assert-zero) term: witness satisfying it proves."""
    F = fp128()
    one = F.of_scalar(1)
    # single layer: output o0 = a*b; assert0 term: c*d must be 0
    l0 = Layer(nw=4, logw=2,
               quad=Quad(g=np.array([0, 0]), h0=np.array([0, 2]),
                         h1=np.array([1, 3]), v=[one, 0]))
    circ = Circuit(nv=1, logv=0, nc=1, logc=0, nl=1, ninputs=4, npub_in=4,
                   subfield_boundary=4, layers=[l0])
    rng = random.Random(7)
    a = rng.randrange(F.p)
    # output o0 = a*b must be zero (all circuit outputs are asserted
    # zero by the protocol), so pick b = 0; the beta term checks c*d == 0.
    b = 0
    W_host = [[a, b, 0, rng.randrange(F.p)]]
    W0 = jnp.asarray(F.to_limbs(W_host[0])).reshape(F.L, 4, 1)
    prover = SumcheckProver(F)
    inputs, finalV = prover.eval_circuit(circ, W0)
    assert finalV is not None
    tsp = Transcript(b"testing")
    tss = TranscriptSumcheck(tsp, F)
    tss.write_input(W_host)
    proof, _, _ = prover.prove(circ, inputs, tss)
    tsv = Transcript(b"testing")
    ok, why = verify(circ, proof, W_host, TranscriptSumcheck(tsv, F), F)
    assert ok, why
    # violating witness: eval_circuit refuses
    W_bad = [[a, b, 1, 2]]
    W0b = jnp.asarray(F.to_limbs(W_bad[0])).reshape(F.L, 4, 1)
    inputs_b, finalV_b = prover.eval_circuit(circ, W0b)
    assert finalV_b is None


def test_sumcheck_gf2():
    F = gf2_128()
    circ = _mul_check_circuit(F, 2)
    rng = random.Random(11)
    W_host = [_witness(F, rng) for _ in range(2)]
    W0 = _device_w(F, W_host)
    prover = SumcheckProver(F)
    inputs, finalV = prover.eval_circuit(circ, W0)
    assert finalV is not None
    tsp = Transcript(b"testing")
    tss = TranscriptSumcheck(tsp, F)
    tss.write_input(W_host)
    proof, _, _ = prover.prove(circ, inputs, tss)
    tsv = Transcript(b"testing")
    ok, why = verify(circ, proof, W_host, TranscriptSumcheck(tsv, F), F)
    assert ok, why
