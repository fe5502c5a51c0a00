"""Sharded sumcheck copy-round kernel: bit-exact vs single device on the
8-virtual-device CPU mesh."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.fields.fp_instances import fp128
from longfellow_zk_tpu.parallel.mesh import make_mesh
from longfellow_zk_tpu.parallel.sumcheck_sharded import (
    copy_round_coeffs, sharded_copy_round_coeffs)


def test_sharded_copy_round_bit_exact():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    F = fp128()
    mesh = make_mesh(8, 1)
    rng = random.Random(11)
    T, nw, C = 24, 8, 32
    hv_host = [rng.randrange(F.p) for _ in range(T)]
    W_host = [rng.randrange(F.p) for _ in range(nw * C)]
    EQ_host = [rng.randrange(F.p) for _ in range(C)]
    h0 = jnp.asarray(np.array([rng.randrange(nw) for _ in range(T)],
                              np.int32))
    h1 = jnp.asarray(np.array([rng.randrange(nw) for _ in range(T)],
                              np.int32))
    EQ = jnp.asarray(F.to_limbs(EQ_host)).reshape(F.L, C)
    W = jnp.asarray(F.to_limbs(W_host)).reshape(F.L, nw, C)
    hv = jnp.asarray(F.to_limbs(hv_host)).reshape(F.L, T)

    ref = copy_round_coeffs(F, EQ, W, hv, h0, h1)
    got = sharded_copy_round_coeffs(F, mesh, EQ, W, hv, h0, h1)
    for r, g in zip(ref, got):
        assert F.from_limbs(np.asarray(r)) == F.from_limbs(np.asarray(g))
