"""NTT / convolution / Reed-Solomon tests vs naive host oracles,
mirroring reference lib/algebra/fft_test.cc and reed_solomon_test.cc."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.fields.fp_instances import (
    fp128,
    P128_OMEGA,
    P128_OMEGA_ORDER,
    p256_base,
    P256_FP2_ROOT_X,
    P256_FP2_ROOT_Y,
    P256_FP2_ROOT_ORDER,
)
from longfellow_zk_tpu.fields.fp2 import Fp2
from longfellow_zk_tpu.transforms.ntt import (
    NTT,
    FFTConvolution,
    ReedSolomon,
    make_fft_convolution_factory,
    make_fft_ext_convolution_factory,
)


def naive_dft(F, a, w):
    """Backward DFT: T[j] = sum_k a[k] w^{jk}."""
    n = len(a)
    out = []
    for j in range(n):
        acc = F.of_scalar(0)
        for k in range(n):
            e = pow(w, (j * k) % n if False else j * k, F.p) if F.p else None
            acc = F.add_i(acc, F.mul_i(a[k], pow(w, j * k, F.p)))
        out.append(acc)
    return out


@pytest.mark.parametrize("n", [
    1, 2, pytest.param(8, marks=pytest.mark.slow),
    pytest.param(64, marks=pytest.mark.slow)])
def test_ntt_matches_naive_dft(n):
    F = fp128()
    ntt = NTT(F, P128_OMEGA, P128_OMEGA_ORDER)
    rng = random.Random(n)
    a = [rng.randrange(F.p) for _ in range(n)]
    x = jnp.asarray(F.to_limbs(a)).reshape(F.L, n)
    got = F.from_limbs(jax.jit(ntt.fftb)(x))
    if n == 1:
        assert got == a[0]
        return
    w = pow(P128_OMEGA, P128_OMEGA_ORDER // n, F.p)
    want = naive_dft(F, a, w)
    assert list(got) == want


@pytest.mark.slow
def test_ntt_roundtrip_scaling():
    F = fp128()
    ntt = NTT(F, P128_OMEGA, P128_OMEGA_ORDER)
    rng = random.Random(9)
    n = 128
    a = [rng.randrange(F.p) for _ in range(n)]
    x = jnp.asarray(F.to_limbs(a))
    rt = F.from_limbs(jax.jit(lambda v: ntt.fftb(ntt.fftf(v)))(x))
    assert list(rt) == [(v * n) % F.p for v in a]


def test_ntt_batched():
    F = fp128()
    ntt = NTT(F, P128_OMEGA, P128_OMEGA_ORDER)
    rng = random.Random(11)
    rows, n = 3, 16
    data = [[rng.randrange(F.p) for _ in range(n)] for _ in range(rows)]
    flat = [v for row in data for v in row]
    x = jnp.asarray(F.to_limbs(flat)).reshape(F.L, rows, n)
    got = F.from_limbs(jax.jit(ntt.fftb)(x))
    w = pow(P128_OMEGA, P128_OMEGA_ORDER // n, F.p)
    for r in range(rows):
        want = naive_dft(F, data[r], w)
        assert list(got[r]) == want


def test_convolution_cyclic():
    F = fp128()
    rng = random.Random(13)
    n, m = 5, 12
    y = [rng.randrange(F.p) for _ in range(m)]
    xs = [rng.randrange(F.p) for _ in range(n)]
    conv = FFTConvolution(n, m, F, P128_OMEGA, P128_OMEGA_ORDER, y)
    x = jnp.asarray(F.to_limbs(xs))
    got = F.from_limbs(jax.jit(conv.convolution)(x))
    # oracle: cyclic convolution over padding, first m entries
    P = conv.padding
    ypad = y + [0] * (P - m)
    xpad = xs + [0] * (P - n)
    want = [
        sum(xpad[i] * ypad[(k - i) % P] for i in range(P)) % F.p for k in range(m)
    ]
    assert list(got) == want


def _rs_oracle(F, vals, m):
    """Lagrange-extend evaluations at 0..n-1 to 0..m-1 (host, O(n*m))."""
    n = len(vals)
    out = list(vals)
    for k in range(n, m):
        # p(k) = sum_j vals[j] * prod_{i != j} (k - i)/(j - i)
        acc = 0
        for j in range(n):
            num, den = 1, 1
            for i in range(n):
                if i != j:
                    num = num * (k - i) % F.p
                    den = den * (j - i) % F.p
            acc = (acc + vals[j] * num * pow(den, -1, F.p)) % F.p
        out.append(acc)
    return out


def test_reed_solomon_fp128():
    F = fp128()
    rng = random.Random(17)
    n, m = 7, 25
    factory = make_fft_convolution_factory(F, P128_OMEGA, P128_OMEGA_ORDER)
    rs = ReedSolomon(n, m, F, factory)
    vals = [rng.randrange(F.p) for _ in range(n)]
    x = jnp.asarray(F.to_limbs(vals))
    got = F.from_limbs(jax.jit(rs.interpolate)(x))
    want = _rs_oracle(F, vals, m)
    assert list(got) == want


@pytest.mark.slow
def test_reed_solomon_batched_rows():
    F = fp128()
    rng = random.Random(19)
    n, m, rows = 4, 11, 3
    factory = make_fft_convolution_factory(F, P128_OMEGA, P128_OMEGA_ORDER)
    rs = ReedSolomon(n, m, F, factory)
    data = [[rng.randrange(F.p) for _ in range(n)] for _ in range(rows)]
    flat = [v for row in data for v in row]
    x = jnp.asarray(F.to_limbs(flat)).reshape(F.L, rows, n)
    got = F.from_limbs(jax.jit(rs.interpolate)(x))
    for r in range(rows):
        assert list(got[r]) == _rs_oracle(F, data[r], m)


@pytest.mark.slow
def test_reed_solomon_p256_via_fp2():
    Fb = p256_base()
    F2 = Fp2(Fb)
    rng = random.Random(23)
    n, m = 4, 14
    omega2 = (P256_FP2_ROOT_X, P256_FP2_ROOT_Y)
    factory = make_fft_ext_convolution_factory(Fb, F2, omega2, P256_FP2_ROOT_ORDER)
    rs = ReedSolomon(n, m, Fb, factory)
    vals = [rng.randrange(Fb.p) for _ in range(n)]
    x = jnp.asarray(Fb.to_limbs(vals))
    got = Fb.from_limbs(jax.jit(rs.interpolate)(x))
    want = _rs_oracle(Fb, vals, m)
    assert list(got) == want
