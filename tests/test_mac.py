"""MAC circuit tests (mirrors reference mac_circuit_test.cc)."""

import random

import pytest

from longfellow_zk_tpu.circuits.mac.mac import (
    MAC,
    MACGF2,
    MACReference,
    mac_witness_values,
)
from longfellow_zk_tpu.compiler.logic import EvaluationBackend, Logic
from longfellow_zk_tpu.fields.fp_instances import p256_base, P256_ORDER
from longfellow_zk_tpu.fields.gf2 import gf2_128, gf_mul_int
from longfellow_zk_tpu.random_oracle.engine import DeterministicEngine


def test_gf2_128_mul_in_circuit():
    G = gf2_128()
    F = p256_base()
    bk = EvaluationBackend(F)
    L = Logic(bk, F)
    rng = random.Random(1)
    for _ in range(3):
        a = rng.getrandbits(128)
        b = rng.getrandbits(128)
        want = gf_mul_int(a, b)
        av = [L.bit((a >> i) & 1) for i in range(128)]
        bv = [L.bit((b >> i) & 1) for i in range(128)]
        cv = L.gf2_128_mul(av, bv)
        got = sum(int(L.eval(x) == F.of_scalar(1)) << i
                  for i, x in enumerate(cv))
        assert got == want


def test_mac_prime_field_eval():
    F = p256_base()
    ref = MACReference()
    rng = DeterministicEngine(b"mac")
    ap = ref.sample(2, rng)
    av = ref.sample(1, rng)[0]
    value = random.Random(7).getrandbits(250)  # < order
    msg = value.to_bytes(32, "little")
    macs = ref.compute(av, ap, msg)

    vals = iter(mac_witness_values(F, 2, ap, value))

    class _FakeBk(EvaluationBackend):
        def input_wire(self):
            return next(vals)

    fbk = _FakeBk(F)
    L = Logic(fbk, F)
    mac = MAC(L, plucker_logn=2)
    vw = mac.witness_input()
    msg_w = fbk.konst(F.of_scalar(value % F.p))
    mac_bits = [[L.bit((m >> i) & 1) for i in range(128)] for m in macs]
    av_bits = [L.bit((av >> i) & 1) for i in range(128)]
    mac.verify_mac(msg_w, mac_bits, av_bits, vw, P256_ORDER)  # no raise

    # flipped mac must fail
    bad = [list(b) for b in mac_bits]
    bad[0][3] = L.lnot(bad[0][3])
    vals2 = iter(mac_witness_values(F, 2, ap, value))
    fbk2 = _FakeBk.__new__(_FakeBk)
    EvaluationBackend.__init__(fbk2, F)
    fbk2.input_wire = lambda: next(vals2)
    L2 = Logic(fbk2, F)
    mac2 = MAC(L2, plucker_logn=2)
    vw2 = mac2.witness_input()
    with pytest.raises(AssertionError):
        mac2.verify_mac(fbk2.konst(F.of_scalar(value % F.p)), bad, av_bits,
                        vw2, P256_ORDER)


def test_mac_gf2_native_eval():
    G = gf2_128()
    ref = MACReference()
    rng = DeterministicEngine(b"mac2")
    ap = ref.sample(2, rng)
    av = ref.sample(1, rng)[0]
    value = random.Random(9).getrandbits(256)
    msg = value.to_bytes(32, "little")
    macs = ref.compute(av, ap, msg)

    vals = iter(ap)

    class _FakeBk(EvaluationBackend):
        def input_wire(self):
            return next(vals)

    fbk = _FakeBk(G)
    L = Logic(fbk, G)
    m = MACGF2(L)
    vw = m.witness_input()
    msg_bits = [L.bit((value >> i) & 1) for i in range(256)]
    mac_w = [fbk.konst(x) for x in macs]
    av_w = fbk.konst(av)
    m.verify_mac(mac_w, av_w, msg_bits, vw)  # no raise
