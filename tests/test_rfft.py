"""RFFT half-complex transform tests (mirrors reference rfft_test.cc):
layout vs a naive Fp2 DFT, roundtrip scaling, and the half-complex
convolver vs the full-lift FFTExtConvolution."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.fields.fp_instances import (
    P256_FP2_ROOT_ORDER, P256_FP2_ROOT_X, P256_FP2_ROOT_Y, p256_base)
from longfellow_zk_tpu.fields.fp2 import Fp2
from longfellow_zk_tpu.transforms.ntt import (
    FFTExtConvolution, _pow)
from longfellow_zk_tpu.transforms.rfft import RFFT, RFFTExtConvolution

OMEGA2 = (P256_FP2_ROOT_X, P256_FP2_ROOT_Y)


def _naive_dft(F2, xs, omega, order, n):
    w = _pow(F2, omega, order // n)
    winv = F2.inv_i(w)
    out = []
    for j in range(n):
        acc = F2.of_scalar(0)
        for k, x in enumerate(xs):
            acc = F2.add_i(acc, F2.mul_i(F2.of_scalar(x),
                                         _pow(F2, winv, j * k)))
        out.append(acc)
    return out


@pytest.mark.parametrize("n", [2, 4, 8, 32])
def test_r2hc_matches_naive_dft(n):
    Fb = p256_base()
    F2 = Fp2(Fb)
    rf = RFFT(F2, OMEGA2, P256_FP2_ROOT_ORDER)
    rng = random.Random(n)
    xs = [rng.randrange(Fb.p) for _ in range(n)]
    hc = np.asarray(rf.r2hc(jnp.asarray(Fb.to_limbs(xs))))
    got = Fb.from_limbs(hc)
    F = _naive_dft(F2, xs, OMEGA2, P256_FP2_ROOT_ORDER, n)
    # conjugate symmetry of the true spectrum
    for j in range(1, n // 2):
        assert F[n - j] == (F[j][0], Fb.neg_i(F[j][1]))
    # half-complex layout (rfft.h:33-37)
    for j in range(n):
        want = F[j][0] if 2 * j <= n else F[n - j][1]
        assert int(got[j]) == want, j


@pytest.mark.parametrize("n", [4, 16])
def test_roundtrip_scale(n):
    Fb = p256_base()
    F2 = Fp2(Fb)
    rf = RFFT(F2, OMEGA2, P256_FP2_ROOT_ORDER)
    rng = random.Random(7 * n)
    xs = [rng.randrange(Fb.p) for _ in range(n)]
    xa = jnp.asarray(Fb.to_limbs(xs))
    back = Fb.from_limbs(np.asarray(rf.hc2r(rf.r2hc(xa))))
    assert [int(v) for v in back] == [(x * n) % Fb.p for x in xs]


def test_half_complex_convolution_matches_full_lift():
    Fb = p256_base()
    F2 = Fp2(Fb)
    rng = random.Random(5)
    n, m = 6, 20
    ys = [rng.randrange(Fb.p) for _ in range(m)]
    xs = [rng.randrange(Fb.p) for _ in range(n)]
    full = FFTExtConvolution(n, m, Fb, F2, OMEGA2, P256_FP2_ROOT_ORDER, ys)
    half = RFFTExtConvolution(n, m, Fb, F2, OMEGA2, P256_FP2_ROOT_ORDER, ys)
    xa = jnp.asarray(Fb.to_limbs(xs))
    a = Fb.from_limbs(np.asarray(full.convolution(xa)))
    b = Fb.from_limbs(np.asarray(half.convolution(xa)))
    assert [int(v) for v in a] == [int(v) for v in b]
