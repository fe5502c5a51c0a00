"""FFT interpolation tests (mirrors reference fft_interpolation_test.cc):
fftf/fftb inverses; bidir fill reproduces the full transforms for every
(k, b0)."""

import random

import pytest

from longfellow_zk_tpu.fields.fp_instances import (
    fp128, P128_OMEGA, P128_OMEGA_ORDER)
from longfellow_zk_tpu.transforms.fft_interpolation import FFTInterpolation


@pytest.mark.parametrize("n", [1, 2, 4, 8, 16])
def test_fftf_fftb_inverse(n):
    F = fp128()
    fi = FFTInterpolation(F, P128_OMEGA, P128_OMEGA_ORDER, n)
    rng = random.Random(n)
    A = [rng.randrange(F.p) for _ in range(n)]
    if n == 1:
        return
    B = fi.fftf(A)
    A2 = fi.fftb(B)
    assert A2 == A
    assert fi.fftf(fi.fftb(B)) == B


@pytest.mark.parametrize("n", [4, 8, 16])
def test_bidir_fills_consistently(n):
    F = fp128()
    fi = FFTInterpolation(F, P128_OMEGA, P128_OMEGA_ORDER, n)
    rng = random.Random(100 + n)
    for k in range(0, n + 1):
        for b0 in range(n):
            A_full = [rng.randrange(F.p) for _ in range(n)]
            B_full = fi.fftf(A_full)
            # erase everything not "given"
            A = [A_full[j] if j < k else None for j in range(n)]
            B = [None] * n
            for j in range(b0, b0 + (n - k)):
                B[j % n] = B_full[j % n]
            A = [0 if v is None else v for v in A]
            B = [0 if v is None else v for v in B]
            fi.interpolate(A, B, k, b0)
            assert A == A_full, (k, b0, "A")
            assert B == B_full, (k, b0, "B")
