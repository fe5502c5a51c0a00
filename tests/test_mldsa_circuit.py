"""ML-DSA circuit tests under the eval backend over Fp24_6 (mirrors
reference ml_dsa_circuit_test.cc / ml_dsa_eval_test.cc) using a real
ML-DSA-44 signature from the reference example vectors."""

import os

import pytest

from longfellow_zk_tpu.circuits.mldsa import MLDSA_44
from longfellow_zk_tpu.circuits.mldsa.circuit import MLDSAVerify
from longfellow_zk_tpu.circuits.mldsa.witness import MLDsaWitness
from longfellow_zk_tpu.compiler.logic import EvaluationBackend, Logic
from longfellow_zk_tpu.fields.fp24 import Fp24_6, fp24

from test_mldsa_ref import REF, _load_examples


def _example():
    path = os.path.join(REF, "ml_dsa_44_examples.cc")
    if not os.path.exists(path):
        pytest.skip("reference examples unavailable")
    return _load_examples(path, "GetMlDsa44Examples")[0]


def _run(corrupt=None):
    msg, pkey, ctx, mu, sig = _example()
    p = MLDSA_44
    w = MLDsaWitness(p)
    assert w.compute_witness(pkey, sig, msg, ctx)
    assert w.mu == mu

    F = Fp24_6(fp24(), beta=7)
    bk = EvaluationBackend(F)
    L = Logic(bk, F)
    mld = MLDSAVerify(L, p)

    wvals = w.fill_pk(F) + w.fill_sig(F) + w.fill_mu(F) + w.fill_witness(F)
    if corrupt is not None:
        v = wvals[corrupt]
        wvals[corrupt] = F.add_i(v, F.of_scalar(1))
    bk.feed(wvals)
    pk = mld.pk_input()
    sg = mld.sig_input()
    mu_w = [L.vinput(8) for _ in range(64)]
    ww = mld.witness_input()
    assert bk._next == len(wvals), (bk._next, len(wvals))
    mld.assert_valid_signature_on_mu(pk, sg, mu_w, ww)


@pytest.mark.slow
def test_mldsa44_circuit_eval_ok():
    _run()


@pytest.mark.slow
def test_mldsa44_circuit_eval_corrupt_fails():
    # corrupt a z_bits wire (inside the fill_sig region)
    with pytest.raises(AssertionError):
        _run(corrupt=20123)
