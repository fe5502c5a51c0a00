"""The device sumcheck prover must produce bit-identical proofs and
transcript states to the host-round prover."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.fields.fp_instances import fp128
from longfellow_zk_tpu.fields.gf2 import gf2_128
from longfellow_zk_tpu.random_oracle.transcript import Transcript
from longfellow_zk_tpu.sumcheck.prover import SumcheckProver
from longfellow_zk_tpu.sumcheck.prover_device import DeviceSumcheckProver
from longfellow_zk_tpu.sumcheck.transcript_sumcheck import TranscriptSumcheck
from longfellow_zk_tpu.sumcheck.verifier import verify

from test_sumcheck import _device_w, _mul_check_circuit, _witness


def _proofs_equal(F, p1, p2):
    assert len(p1.layers) == len(p2.layers)
    for l1, l2 in zip(p1.layers, p2.layers):
        assert l1.cp == l2.cp
        assert l1.hp == l2.hp
        assert l1.wc == l2.wc


@pytest.mark.slow
@pytest.mark.parametrize("field_fn,nc", [
    (fp128, 1), (fp128, 3), (fp128, 8), (gf2_128, 1), (gf2_128, 4)])
def test_device_prover_matches_host(field_fn, nc):
    F = field_fn()
    circ = _mul_check_circuit(F, nc)
    rng = random.Random(42 + nc)
    W_host = [_witness(F, rng) for _ in range(nc)]
    W0 = _device_w(F, W_host)

    host_p = SumcheckProver(F)
    inputs_h, finalV = host_p.eval_circuit(circ, W0)
    assert finalV is not None

    dev_p = DeviceSumcheckProver(F)
    inputs_d, finalV_d = dev_p.eval_circuit(circ, W0)
    assert finalV_d is not None
    np.testing.assert_array_equal(np.asarray(finalV), np.asarray(finalV_d))

    ts1 = Transcript(b"devtest")
    tss1 = TranscriptSumcheck(ts1, F)
    tss1.write_input(W_host)
    proof1, aux1, bnd1 = host_p.prove(circ, inputs_h, tss1, with_aux=True)

    ts2 = Transcript(b"devtest")
    tss2 = TranscriptSumcheck(ts2, F)
    tss2.write_input(W_host)
    proof2, aux2, bnd2 = dev_p.prove(circ, inputs_d, tss2, with_aux=True)

    _proofs_equal(F, proof1, proof2)
    assert aux1.bound_quad == aux2.bound_quad
    assert bnd1["q"] == bnd2["q"]
    assert bnd1["g"] == bnd2["g"]
    # post-sumcheck transcript states agree (same downstream challenges)
    assert ts1.elt(F) == ts2.elt(F)

    # and the proof verifies
    tsv = Transcript(b"devtest")
    ok, why = verify(circ, proof2, W_host, TranscriptSumcheck(tsv, F), F)
    assert ok, why


@pytest.mark.slow
def test_device_prover_with_pad():
    """ZK mode: pad-encrypted transcript must match the host prover."""
    from longfellow_zk_tpu.random_oracle.engine import DeterministicEngine
    from longfellow_zk_tpu.sumcheck.circuit import LayerProof, Proof

    F = fp128()
    circ = _mul_check_circuit(F, 1)
    rng = random.Random(7)
    W_host = [_witness(F, rng)]
    W0 = _device_w(F, W_host)

    def mkpad(eng):
        pad = Proof()
        for layer in circ.layers:
            lp = LayerProof(cp=[], hp=[[], []], wc=[None, None])
            for _ in range(circ.logc):
                lp.cp.append([F.sample(eng.bytes) if k != 1 else 0
                              for k in range(4)])
            for _ in range(layer.logw):
                for h in range(2):
                    lp.hp[h].append([F.sample(eng.bytes) if k != 1 else 0
                                     for k in range(3)])
            lp.wc = [F.sample(eng.bytes), F.sample(eng.bytes)]
            pad.layers.append(lp)
        return pad

    pad = mkpad(DeterministicEngine(b"padseed"))
    pad2 = mkpad(DeterministicEngine(b"padseed"))

    host_p = SumcheckProver(F)
    inputs, _ = host_p.eval_circuit(circ, W0)
    ts1 = Transcript(b"padtest")
    tss1 = TranscriptSumcheck(ts1, F)
    tss1.write_input(W_host)
    proof1, _, _ = host_p.prove(circ, inputs, tss1, pad=pad)

    dev_p = DeviceSumcheckProver(F)
    inputs_d, _ = dev_p.eval_circuit(circ, W0)
    ts2 = Transcript(b"padtest")
    tss2 = TranscriptSumcheck(ts2, F)
    tss2.write_input(W_host)
    proof2, _, _ = dev_p.prove(circ, inputs_d, tss2, pad=pad2)

    _proofs_equal(F, proof1, proof2)
    assert ts1.elt(F) == ts2.elt(F)


def test_device_prover_sgonal():
    """Real LFC1-loaded reference circuit through the device prover."""
    import itertools

    from longfellow_zk_tpu.proto.lfc1 import FP128_ID, read_circuit
    from test_lfc1 import SGONAL_HEX

    F = fp128()
    circ = read_circuit(F, FP128_ID, bytes.fromhex(SGONAL_HEX))
    dev_p = DeviceSumcheckProver(F)
    good = None
    for perm in itertools.permutations([12, 3, 5, 1]):
        W0 = jnp.asarray(F.to_limbs(list(perm))).reshape(F.L, 4, 1)
        inputs, finalV = dev_p.eval_circuit(circ, W0)
        if finalV is not None and all(
                v == 0 for v in np.ravel(F.from_limbs(np.asarray(finalV)))):
            good = list(perm)
            break
    assert good is not None
    W0 = jnp.asarray(F.to_limbs(good)).reshape(F.L, 4, 1)
    inputs, _ = dev_p.eval_circuit(circ, W0)
    tsp = Transcript(b"testing")
    tss = TranscriptSumcheck(tsp, F)
    tss.write_input([good])
    proof, _, _ = dev_p.prove(circ, inputs, tss)
    tsv = Transcript(b"testing")
    ok, why = verify(circ, proof, [good], TranscriptSumcheck(tsv, F), F)
    assert ok, why
