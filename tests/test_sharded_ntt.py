"""Multi-chip sharded NTT vs single-device reference (8 virtual devices)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.fields.fp_instances import (
    fp128, P128_OMEGA, P128_OMEGA_ORDER)
from longfellow_zk_tpu.parallel.mesh import make_mesh
from longfellow_zk_tpu.parallel.ntt_sharded import ShardedNTT
from longfellow_zk_tpu.transforms.ntt import NTT


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_ntt_matches_single_device():
    F = fp128()
    mesh = make_mesh(8, 1)
    snt = ShardedNTT(F, P128_OMEGA, P128_OMEGA_ORDER, mesh, radix=8)
    ntt = NTT(F, P128_OMEGA, P128_OMEGA_ORDER)
    rng = random.Random(5)
    n = 64
    vals = [rng.randrange(F.p) for _ in range(n)]
    x = jnp.asarray(F.to_limbs(vals))
    got = F.from_limbs(np.asarray(snt.fftb(x)))
    want = F.from_limbs(np.asarray(jax.jit(ntt.fftb)(x)))
    assert list(got) == list(want)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_ntt_radix16():
    """radix-16 kernel path + larger transform (n=256)."""
    F = fp128()
    mesh = make_mesh(8, 1)
    snt = ShardedNTT(F, P128_OMEGA, P128_OMEGA_ORDER, mesh, radix=16)
    ntt = NTT(F, P128_OMEGA, P128_OMEGA_ORDER)
    rng = random.Random(6)
    n = 256
    vals = [rng.randrange(F.p) for _ in range(n)]
    x = jnp.asarray(F.to_limbs(vals))
    got = F.from_limbs(np.asarray(snt.fftb(x)))
    want = F.from_limbs(np.asarray(jax.jit(ntt.fftb)(x)))
    assert list(got) == list(want)
