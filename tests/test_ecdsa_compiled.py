"""Compiled ECDSA: VerifyCircuit through QuadCircuit, full ZK
prove+verify (mirrors reference ecdsa/verify_test.cc:452-589)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.circuits.ecdsa.verify import (
    VerifyCircuit, EcdsaWitness, compute_witness)
from longfellow_zk_tpu.compiler.logic import CompilerBackend, Logic
from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit, dump_info
from longfellow_zk_tpu.ec.curves import ecdsa_sign, p256_curve
from longfellow_zk_tpu.fields.fp_instances import (
    P256_FP2_ROOT_ORDER, P256_FP2_ROOT_X, P256_FP2_ROOT_Y, p256_base)
from longfellow_zk_tpu.fields.fp2 import Fp2
from longfellow_zk_tpu.zk.testing import rs_factory_for, run_test_zk


def _compile_ecdsa():
    F = p256_base()
    ec = p256_curve()
    qc = QuadCircuit(F)
    L = Logic(CompilerBackend(qc), F)
    vc = VerifyCircuit(L, ec)
    pkx = L.eltw_input()
    pky = L.eltw_input()
    e = L.eltw_input()
    qc.private_input()
    w = EcdsaWitness(L, ec.kBits)
    vc.verify_signature3(pkx, pky, e, w)
    circ = qc.mkcircuit(nc=1)
    return F, ec, circ, qc


@pytest.mark.slow
def test_ecdsa_compile_prove_verify():
    F, ec, circ, qc = _compile_ecdsa()
    print(dump_info("ecdsa", qc))

    rng = random.Random(1234)
    d = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), d))
    e = rng.randrange(1, ec.order)
    r, s = ecdsa_sign(ec, d, e, rng.randrange(1, ec.order))
    vw = compute_witness(ec, pk.x, pk.y, e, r, s)

    W = [F.of_scalar(1), pk.x, pk.y, e % F.p]
    W.extend(vw.fill())
    assert len(W) == circ.ninputs, (len(W), circ.ninputs)

    rs = rs_factory_for(F, F2=Fp2(F),
                        omega2=(P256_FP2_ROOT_X, P256_FP2_ROOT_Y),
                        omega_order=P256_FP2_ROOT_ORDER)
    ok, why = run_test_zk(circ, W, W[:circ.npub_in], F, rs)
    assert ok, why
