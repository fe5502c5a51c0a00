"""EC public-key circuit tests (mirrors reference ec/pk_circuit_test.cc)."""

import random

import pytest

from longfellow_zk_tpu.circuits.ecdsa.pk import (
    Ecpk, EcpkWitness, compute_pk_witness, fill_pk_witness)
from longfellow_zk_tpu.compiler.logic import EvaluationBackend, Logic
from longfellow_zk_tpu.ec.curves import p256_curve
from longfellow_zk_tpu.fields.fp_instances import p256_base


def _run(sk: int, pkx: int, pky: int, corrupt=None):
    ec = p256_curve()
    F = p256_base()
    w = compute_pk_witness(ec, sk)
    wvals = fill_pk_witness(F, w)
    if corrupt is not None:
        wvals[corrupt] = (wvals[corrupt] + 1) % F.p
    bk = EvaluationBackend(F)
    L = Logic(bk, F)
    bk.feed([pkx, pky])
    pk_x, pk_y = L.eltw_input(), L.eltw_input()
    bk.feed(wvals)
    ww = EcpkWitness(L, ec.kBits)
    Ecpk(L, ec).assert_public_key(pk_x, pk_y, ww)


@pytest.mark.slow
def test_pk_compiled_zk():
    """Compiled prove+verify for the EC-pk circuit (reference
    tests/ec/pk_circuit.h has the matching ZK tests)."""
    from longfellow_zk_tpu.compiler.logic import CompilerBackend
    from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit, dump_info
    from longfellow_zk_tpu.fields.fp_instances import (
        P256_FP2_ROOT_ORDER, P256_FP2_ROOT_X, P256_FP2_ROOT_Y)
    from longfellow_zk_tpu.fields.fp2 import Fp2
    from longfellow_zk_tpu.zk.testing import (
        rs_factory_for, run_failing_test_zk, run_test_zk)

    ec = p256_curve()
    F = p256_base()
    rng = random.Random(12)
    sk = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), sk))

    qc = QuadCircuit(F)
    L = Logic(CompilerBackend(qc), F)
    pk_x, pk_y = L.eltw_input(), L.eltw_input()
    qc.private_input()
    ww = EcpkWitness(L, ec.kBits)
    Ecpk(L, ec).assert_public_key(pk_x, pk_y, ww)
    circ = qc.mkcircuit(nc=1)
    print(dump_info("ecpk", qc))

    w = compute_pk_witness(ec, sk)
    W = [1, pk.x, pk.y] + fill_pk_witness(F, w)
    assert len(W) == circ.ninputs, (len(W), circ.ninputs)

    rs = rs_factory_for(F, F2=Fp2(F),
                        omega2=(P256_FP2_ROOT_X, P256_FP2_ROOT_Y),
                        omega_order=P256_FP2_ROOT_ORDER)
    ok, why = run_test_zk(circ, W, W[: circ.npub_in], F, rs)
    assert ok, why

    W2 = list(W)
    W2[circ.npub_in + 5] = (W2[circ.npub_in + 5] + 1) % F.p
    assert run_failing_test_zk(circ, W2, F, rs)


def test_pk_ok():
    ec = p256_curve()
    rng = random.Random(9)
    sk = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), sk))
    _run(sk, pk.x, pk.y)


def test_pk_wrong_key_fails():
    ec = p256_curve()
    rng = random.Random(10)
    sk = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), sk + 1))
    with pytest.raises(AssertionError):
        _run(sk, pk.x, pk.y)


def test_pk_corrupt_witness_fails():
    ec = p256_curve()
    rng = random.Random(11)
    sk = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), sk))
    with pytest.raises(AssertionError):
        _run(sk, pk.x, pk.y, corrupt=17)
