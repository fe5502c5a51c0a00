"""Fp24 / Fp24_6 tests (mirrors reference fp24_test.cc, fp24_6_test.cc;
the SHA3 circuit test's field configuration Fp24_6(8380417, beta=7))."""

import hashlib
import random

import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.circuits.sha3 import Sha3Circuit, Sha3Witness
from longfellow_zk_tpu.compiler.logic import EvaluationBackend, Logic
from longfellow_zk_tpu.fields.fp24 import FP24_P, Fp24_6, fp24


def test_fp24_device_field_ops():
    F = fp24()
    rng = random.Random(0)
    xs = [rng.randrange(F.p) for _ in range(16)]
    ys = [rng.randrange(F.p) for _ in range(16)]
    xa, ya = jnp.asarray(F.to_limbs(xs)), jnp.asarray(F.to_limbs(ys))
    got = F.from_limbs(np.asarray(F.mul(xa, ya)))
    assert [int(v) for v in got] == [(x * y) % F.p for x, y in zip(xs, ys)]
    got = F.from_limbs(np.asarray(F.inv(xa)))
    assert [int(v) for v in got] == [pow(x, -1, F.p) for x in xs]


def test_fp24_6_host_axioms():
    F6 = Fp24_6(fp24(), beta=7)
    rng = random.Random(1)

    def rnd():
        return tuple(rng.randrange(FP24_P) for _ in range(6))

    for _ in range(10):
        a, b, c = rnd(), rnd(), rnd()
        assert F6.mul_i(a, b) == F6.mul_i(b, a)
        assert F6.mul_i(a, F6.add_i(b, c)) == \
            F6.add_i(F6.mul_i(a, b), F6.mul_i(a, c))
        ia = F6.inv_i(a)
        assert F6.mul_i(a, ia) == F6.of_scalar(1)
    # serialization roundtrip
    a = rnd()
    assert F6.of_bytes(F6.to_bytes(a)) == a


def test_fp24_6_device_matches_host():
    F6 = Fp24_6(fp24(), beta=7)
    rng = random.Random(2)
    xs = [tuple(rng.randrange(FP24_P) for _ in range(6)) for _ in range(5)]
    ys = [tuple(rng.randrange(FP24_P) for _ in range(6)) for _ in range(5)]
    xa, ya = jnp.asarray(F6.to_limbs(xs)), jnp.asarray(F6.to_limbs(ys))
    got = F6.from_limbs(np.asarray(F6.mul(xa, ya)))
    for j in range(5):
        assert got[j] == F6.mul_i(xs[j], ys[j])
    got = F6.from_limbs(np.asarray(F6.inv(xa)))
    for j in range(5):
        assert got[j] == F6.inv_i(xs[j])


def test_logic_gates_over_fp24_6():
    F6 = Fp24_6(fp24(), beta=7)
    L = Logic(EvaluationBackend(F6), F6)
    one, zero = L.bit(1), L.bit(0)
    assert L.eval(L.lxor(one, one)) == F6.of_scalar(0)
    assert L.eval(L.lxor(one, zero)) == F6.of_scalar(1)
    assert L.eval(L.land(one, one)) == F6.of_scalar(1)
    assert L.eval(L.lCh(one, zero, one)) == F6.of_scalar(0)
    # as_scalar packs powers of two of the characteristic
    v = L.bits(20, 0xABCDE)
    assert L.as_scalar(v) == F6.of_scalar(0xABCDE)


def test_shake256_eval_backend_over_fp24_6():
    """The reference sha3_circuit_test.cc configuration: Fp24_6, 22-bit
    lane packing."""
    F6 = Fp24_6(fp24(), beta=7)
    seed = b"fp24"
    bws_host = Sha3Witness.compute_witness_shake256(seed, 32)
    bk = EvaluationBackend(F6)
    bk.feed(Sha3Witness.fill_witness(F6, bws_host))
    L = Logic(bk, F6)
    shac = Sha3Circuit(L)
    bws = [shac.block_witness_input() for _ in bws_host]
    out = shac.assert_shake256([L.bits(8, b) for b in seed], 32, bws)
    got = bytearray()
    for v in out:
        byte = 0
        for i, bit in enumerate(v):
            byte |= int(L.eval(bit) == F6.of_scalar(1)) << i
        got.append(byte)
    assert bytes(got) == hashlib.shake_256(seed).digest(32)
