"""Sparse reference array vs the dense device bind (mirrors the
reference's use of Sparse as a testing oracle)."""

import random

import jax.numpy as jnp
import numpy as np

from longfellow_zk_tpu.arrays.dense import bind_all
from longfellow_zk_tpu.arrays.sparse import Corner, Sparse
from longfellow_zk_tpu.fields.fp_instances import fp128


def test_sparse_matches_dense_bind():
    F = fp128()
    rng = random.Random(3)
    logv = 4
    n = 1 << logv
    dense_vals = [0] * n
    corners = []
    for _ in range(10):
        p = rng.randrange(n)
        v = rng.randrange(F.p)
        corners.append(Corner(p, 0, 0, v))
        dense_vals[p] = F.add_i(dense_vals[p], v)
    s = Sparse(corners)
    s.canonicalize(F)
    rs = [rng.randrange(F.p) for _ in range(logv)]
    s.bind_all(F, logv, rs)

    x = jnp.asarray(F.to_limbs(dense_vals)).reshape(F.L, n)
    for r in rs:
        from longfellow_zk_tpu.arrays.dense import bind

        x = bind(F, x, F.broadcast_const(r))
    got = F.from_limbs(np.asarray(x[..., 0]))
    assert got == s.scalar()


def test_sparse_coalesce_and_reshape():
    F = fp128()
    s = Sparse([Corner(1, 2, 3, 5), Corner(1, 2, 3, F.p - 5),
                Corner(0, 1, 0, 7)])
    s.canonicalize(F)
    assert len(s.c) == 1 and s.c[0].v == 7
    s.c[0].p0 = 0
    s.reshape()
    assert (s.c[0].p0, s.c[0].p1, s.c[0].p2) == (1, 0, 0)
