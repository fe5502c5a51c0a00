"""Chunked multi-layer device programs (prove_chunked) must produce
bit-identical proofs and transcript states to the fused/host provers —
this is the mdoc-scale prove path (reference
lib/sumcheck/prover_layers.h:37-497 semantics, chunked per compile
budget)."""

import random

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
from test_prover_device import _proofs_equal


@pytest.mark.parametrize("field_fn,layer_budget", [
    (fp128, 1), (fp128, 2), (gf2_128, 1), (gf2_128, 3)])
def test_chunked_matches_host(field_fn, layer_budget, monkeypatch):
    F = field_fn()
    circ = _mul_check_circuit(F, 1)
    assert circ.nl >= 2, "need a multi-layer circuit to chunk"
    rng = random.Random(99)
    W_host = [_witness(F, rng)]
    W0 = _device_w(F, W_host)

    host_p = SumcheckProver(F)
    inputs_h, finalV = host_p.eval_circuit(circ, W0)
    assert finalV is not None
    ts1 = Transcript(b"chunktest")
    tss1 = TranscriptSumcheck(ts1, F)
    tss1.write_input(W_host)
    proof1, aux1, bnd1 = host_p.prove(circ, inputs_h, tss1, with_aux=True)

    dev_p = DeviceSumcheckProver(F)
    monkeypatch.setattr(dev_p, "CHUNK_LAYER_BUDGET", layer_budget)
    ts2 = Transcript(b"chunktest")
    tss2 = TranscriptSumcheck(ts2, F)
    tss2.write_input(W_host)
    proof2, aux2, bnd2 = dev_p.prove_chunked(circ, tss2, with_aux=True,
                                             W0=W0)
    _proofs_equal(F, proof1, proof2)
    assert aux1.bound_quad == aux2.bound_quad
    assert bnd1["q"] == bnd2["q"]
    assert bnd1["g"] == bnd2["g"]
    assert ts1.elt(F) == ts2.elt(F)

    tsv = Transcript(b"chunktest")
    ok, why = verify(circ, proof2, W_host, TranscriptSumcheck(tsv, F), F)
    assert ok, why


@pytest.mark.parametrize("field_fn", [fp128, gf2_128])
def test_wire_merge_matches_host(field_fn, monkeypatch):
    """Term-merged wire rounds (every (h0,h1)-duplicate summed, staged
    re-merges) must keep proof bytes identical to the host prover."""
    F = field_fn()
    circ = _mul_check_circuit(F, 1)
    rng = random.Random(123)
    W_host = [_witness(F, rng)]
    W0 = _device_w(F, W_host)

    host_p = SumcheckProver(F)
    inputs_h, finalV = host_p.eval_circuit(circ, W0)
    assert finalV is not None
    ts1 = Transcript(b"wmtest")
    tss1 = TranscriptSumcheck(ts1, F)
    tss1.write_input(W_host)
    proof1, aux1, _ = host_p.prove(circ, inputs_h, tss1, with_aux=True)

    dev_p = DeviceSumcheckProver(F)
    monkeypatch.setattr(dev_p, "K_MERGE_MIN_TERMS", 1)
    monkeypatch.setattr(dev_p, "CHUNK_LAYER_BUDGET", 2)
    # clear any cached plans computed under the default threshold
    for layer in circ.layers:
        if hasattr(layer.quad, "_wm_cache"):
            del layer.quad._wm_cache
    ts2 = Transcript(b"wmtest")
    tss2 = TranscriptSumcheck(ts2, F)
    tss2.write_input(W_host)
    proof2, aux2, _ = dev_p.prove_chunked(circ, tss2, with_aux=True,
                                          W0=W0)
    _proofs_equal(F, proof1, proof2)
    assert aux1.bound_quad == aux2.bound_quad
    assert ts1.elt(F) == ts2.elt(F)
    # a plan with at least one merge stage must actually have been used
    assert any(getattr(layer.quad, "_wm_cache", (None, None))[1]
               for layer in circ.layers)
    for layer in circ.layers:
        if hasattr(layer.quad, "_wm_cache"):
            del layer.quad._wm_cache

    tsv = Transcript(b"wmtest")
    ok, why = verify(circ, proof2, W_host, TranscriptSumcheck(tsv, F), F)
    assert ok, why


def test_chunked_bad_witness_untouched_transcript(monkeypatch):
    F = fp128()
    circ = _mul_check_circuit(F, 1)
    rng = random.Random(5)
    W_host = [_witness(F, rng)]
    bad = list(W_host[0])
    bad[0] = F.add_i(bad[0], 1)  # breaks the product relation
    W0 = _device_w(F, [bad])

    dev_p = DeviceSumcheckProver(F)
    monkeypatch.setattr(dev_p, "CHUNK_LAYER_BUDGET", 1)
    ts = Transcript(b"badw")
    tss = TranscriptSumcheck(ts, F)
    tss.write_input([bad])
    before = ts.clone().elt(F)
    proof, aux, bnd = dev_p.prove_chunked(circ, tss, W0=W0)
    assert proof is None
    assert ts.elt(F) == before
