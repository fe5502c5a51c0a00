"""Matmul-NTT vs reference-semantics NTT (small sizes, CPU)."""

import pytest
pytestmark = pytest.mark.slow
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.fields.fp_instances import (
    fp128, P128_OMEGA, P128_OMEGA_ORDER)
from longfellow_zk_tpu.transforms.matmul_ntt import MatmulNTT
from longfellow_zk_tpu.transforms.ntt import NTT


@pytest.mark.parametrize("n", [2, 16, 64, 256])
def test_matmul_ntt_matches(n):
    F = fp128()
    ntt = NTT(F, P128_OMEGA, P128_OMEGA_ORDER)
    mnt = MatmulNTT(F, P128_OMEGA, P128_OMEGA_ORDER, radix=16)
    rng = random.Random(n)
    vals = [rng.randrange(F.p) for _ in range(n)]
    x = jnp.asarray(F.to_limbs(vals))
    want = F.from_limbs(np.asarray(jax.jit(ntt.fftb)(x)))
    got = F.from_limbs(np.asarray(jax.jit(mnt.fftb)(x)))
    assert list(got) == list(want)
    wantf = F.from_limbs(np.asarray(jax.jit(ntt.fftf)(x)))
    gotf = F.from_limbs(np.asarray(jax.jit(mnt.fftf)(x)))
    assert list(gotf) == list(wantf)


def test_matmul_ntt_batched():
    F = fp128()
    mnt = MatmulNTT(F, P128_OMEGA, P128_OMEGA_ORDER, radix=16)
    ntt = NTT(F, P128_OMEGA, P128_OMEGA_ORDER)
    rng = random.Random(7)
    rows, n = 3, 64
    vals = [[rng.randrange(F.p) for _ in range(n)] for _ in range(rows)]
    flat = [v for row in vals for v in row]
    x = jnp.asarray(F.to_limbs(flat)).reshape(8, rows, n)
    got = F.from_limbs(np.asarray(jax.jit(mnt.fftb)(x)))
    want = F.from_limbs(np.asarray(jax.jit(ntt.fftb)(x)))
    for r in range(rows):
        assert list(got[r]) == list(want[r])
