"""Routing / memcmp / unary plucker tests (mirror reference
routing_test.cc, memcmp_test.cc)."""

import random

import pytest

from longfellow_zk_tpu.compiler.components import Memcmp, UnaryPlucker, \
    bit_plucker_point
from longfellow_zk_tpu.compiler.logic import EvaluationBackend, Logic
from longfellow_zk_tpu.compiler.routing import Routing
from longfellow_zk_tpu.fields.fp_instances import fp128


def _logic():
    F = fp128()
    return Logic(EvaluationBackend(F), F), F


def _val(L, F, b):
    return int(L.eval(b) == F.of_scalar(1))


@pytest.mark.parametrize("unroll", [1, 2])
def test_shift_bits(unroll):
    L, F = _logic()
    r = Routing(L)
    rng = random.Random(5)
    n, k = 16, 8
    data = [rng.randrange(2) for _ in range(n)]
    A = [L.bit(v) for v in data]
    for amount in [0, 1, 5, 15]:
        amt = L.bits(4, amount)
        B = r.shift(amt, k, A, L.bit(0), unroll=unroll)
        got = [_val(L, F, b) for b in B]
        want = [data[i + amount] if i + amount < n else 0 for i in range(k)]
        assert got == want, (amount, got, want)


@pytest.mark.parametrize("unroll", [1, 2])
def test_unshift_bits(unroll):
    L, F = _logic()
    r = Routing(L)
    rng = random.Random(6)
    n, k = 16, 6
    data = [rng.randrange(2) for _ in range(k)]
    B = [L.bit(v) for v in data]
    for amount in [0, 3, 9]:
        amt = L.bits(4, amount)
        A = r.unshift(amt, n, k, B, L.bit(0), unroll=unroll)
        got = [_val(L, F, b) for b in A]
        want = [0] * n
        for i in range(k):
            if i + amount < n:
                want[i + amount] = data[i]
        assert got == want, (amount, got, want)


def test_shift_bytevecs():
    L, F = _logic()
    r = Routing(L)
    data = [[(v >> j) & 1 for j in range(8)] for v in [10, 20, 30, 40]]
    A = [[L.bit(b) for b in byte] for byte in data]
    amt = L.bits(2, 1)
    B = r.shift(amt, 2, A, [L.bit(0)] * 8, unroll=1)
    got = [sum(_val(L, F, b) << j for j, b in enumerate(byte)) for byte in B]
    assert got == [20, 30]


def test_memcmp():
    L, F = _logic()
    m = Memcmp(L)

    def v8s(data):
        return [[L.bit((b >> j) & 1) for j in range(8)] for b in data]

    cases = [(b"abc", b"abd"), (b"abc", b"abc"), (b"abd", b"abc"),
             (b"\x00\x01", b"\x01\x00")]
    for A, B in cases:
        lt = _val(L, F, m.lt(v8s(A), v8s(B)))
        leq = _val(L, F, m.leq(v8s(A), v8s(B)))
        assert lt == (1 if A < B else 0), (A, B)
        assert leq == (1 if A <= B else 0), (A, B)


def test_unary_plucker():
    L, F = _logic()
    up = UnaryPlucker(L, 4)
    for i in range(5):  # point 4 decodes to all zeros
        e = bit_plucker_point(F, 5, i)
        bits = [_val(L, F, b) for b in up.pluck(L.bk.konst(e))]
        want = [1 if j == i else 0 for j in range(4)]
        assert bits == want, (i, bits)
