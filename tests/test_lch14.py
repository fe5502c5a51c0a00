"""LCH14 additive FFT / RS tests vs host Lagrange oracle
(mirrors reference lib/gf2k/lch14_test.cc coverage)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.fields.gf2 import gf2_128, gf_mul_int
from longfellow_zk_tpu.transforms.lch14 import (
    LCH14,
    LCH14ReedSolomon,
    halfwords_to_bits,
    bits_to_halfwords,
    mul_const_bits,
)


def test_bits_roundtrip():
    F = gf2_128()
    rng = random.Random(1)
    xs = [rng.getrandbits(128) for _ in range(7)]
    a = jnp.asarray(F.to_limbs(xs))
    bits = halfwords_to_bits(a)
    assert bits.shape == (7, 128)
    back = F.from_limbs(bits_to_halfwords(bits))
    assert list(back) == xs


def test_mul_const_bits():
    F = gf2_128()
    rng = random.Random(2)
    xs = [rng.getrandbits(128) for _ in range(9)]
    c = rng.getrandbits(128)
    bits = halfwords_to_bits(jnp.asarray(F.to_limbs(xs)))
    got = F.from_limbs(bits_to_halfwords(mul_const_bits(bits, c)))
    for i, x in enumerate(xs):
        assert got[i] == gf_mul_int(x, c)


@pytest.mark.parametrize("l", [
    1, pytest.param(3, marks=pytest.mark.slow),
    pytest.param(4, marks=pytest.mark.slow)])
def test_fft_ifft_roundtrip(l):
    F = gf2_128()
    rng = random.Random(l)
    n = 1 << l
    xs = [rng.getrandbits(128) for _ in range(n)]
    bits = halfwords_to_bits(jnp.asarray(F.to_limbs(xs)))
    fft = LCH14(F)
    for coset in [0, n, 3 * n]:
        ev = fft.fft(bits, coset)
        back = fft.ifft(ev, coset)
        assert F.from_limbs(bits_to_halfwords(back)).tolist() == xs


def _lagrange_extend_gf2(F, vals, m):
    """Host oracle: extend evals at of_scalar(0..n-1) to of_scalar(0..m-1)."""
    n = len(vals)
    pts = [F.of_scalar(i) for i in range(m)]
    out = list(vals)
    for k in range(n, m):
        acc = 0
        for j in range(n):
            num, den = 1, 1
            for i in range(n):
                if i != j:
                    num = gf_mul_int(num, pts[k] ^ pts[i])
                    den = gf_mul_int(den, pts[j] ^ pts[i])
            acc ^= gf_mul_int(vals[j], gf_mul_int(num, F.inv_i(den)))
        out.append(acc)
    return out


def test_fft_evaluates_polynomial():
    """fft(coeffs restricted to degree<k) must give Lagrange-consistent
    evaluations across the whole domain."""
    F = gf2_128()
    rng = random.Random(7)
    l, k = 3, 3  # poly with 3 basis coefficients, domain size 8
    n = 1 << l
    coeffs = [rng.getrandbits(128) for _ in range(k)] + [0] * (n - k)
    bits = halfwords_to_bits(jnp.asarray(F.to_limbs(coeffs)))
    fft = LCH14(F)
    ev = F.from_limbs(bits_to_halfwords(fft.fft(bits, 0))).tolist()
    # evals of a degree<k polynomial: Lagrange-extend the first k and compare
    want = _lagrange_extend_gf2(F, ev[:k], n)
    assert ev == want


@pytest.mark.parametrize("n,m", [
    (4, 4), (5, 12), pytest.param(8, 24, marks=pytest.mark.slow),
    pytest.param(7, 40, marks=pytest.mark.slow)])
def test_lch14_reed_solomon(n, m):
    F = gf2_128()
    rng = random.Random(n * m)
    vals = [rng.getrandbits(128) for _ in range(n)]
    rs = LCH14ReedSolomon(n, m, F)
    y = jnp.asarray(F.to_limbs(vals))
    got = F.from_limbs(jax.jit(rs.interpolate)(y)).tolist()
    want = _lagrange_extend_gf2(F, vals, m)
    assert got == want


@pytest.mark.slow
def test_lch14_reed_solomon_batched():
    F = gf2_128()
    rng = random.Random(77)
    n, m, rows = 5, 13, 3
    data = [[rng.getrandbits(128) for _ in range(n)] for _ in range(rows)]
    flat = [v for row in data for v in row]
    y = jnp.asarray(F.to_limbs(flat)).reshape(8, rows, n)
    rs = LCH14ReedSolomon(n, m, F)
    got = F.from_limbs(jax.jit(rs.interpolate)(y))
    for r in range(rows):
        assert list(got[r]) == _lagrange_extend_gf2(F, data[r], m)
