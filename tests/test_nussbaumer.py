"""Nussbaumer convolution tests (mirrors reference nussbaumer_test.cc):
negacyclic/cyclic/linear vs O(n^2) references, and the RS-extend drop-in
over a field without big 2-adic roots."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.fields.fp_instances import fp128, p256k1_base
from longfellow_zk_tpu.transforms import nussbaumer as nb
from longfellow_zk_tpu.transforms.ntt import ReedSolomon


def _naive_negacyclic(p, x, y):
    n = len(x)
    z = [0] * n
    for j in range(n):
        for k in range(n):
            i = (j + k) % n
            s = 1 if j + k < n else -1
            z[i] = (z[i] + s * x[j] * y[k]) % p
    return z


def _naive_cyclic(p, x, y):
    n = len(x)
    z = [0] * n
    for j in range(n):
        for k in range(n):
            z[(j + k) % n] = (z[(j + k) % n] + x[j] * y[k]) % p
    return z


@pytest.mark.parametrize("n", [4, 16, 64, 256])
def test_negacyclic_matches_naive(n):
    F = fp128()
    rng = random.Random(n)
    xs = [rng.randrange(F.p) for _ in range(n)]
    ys = [rng.randrange(F.p) for _ in range(n)]
    xa = jnp.asarray(F.to_limbs(xs))
    ya = jnp.asarray(F.to_limbs(ys))
    got = F.from_limbs(np.asarray(nb.negacyclic(F, xa, ya)))
    assert [int(v) for v in got] == _naive_negacyclic(F.p, xs, ys)


@pytest.mark.parametrize("n", [4, 8, 128])
def test_cyclic_and_linear_match_naive(n):
    F = fp128()
    rng = random.Random(n + 1)
    xs = [rng.randrange(F.p) for _ in range(n)]
    ys = [rng.randrange(F.p) for _ in range(n)]
    xa = jnp.asarray(F.to_limbs(xs))
    ya = jnp.asarray(F.to_limbs(ys))
    got = F.from_limbs(np.asarray(nb.cyclic(F, xa, ya)))
    assert [int(v) for v in got] == _naive_cyclic(F.p, xs, ys)
    got = F.from_limbs(np.asarray(nb.linear(F, xa, ya)))
    want = [0] * (2 * n)
    for j in range(n):
        for k in range(n):
            want[j + k] = (want[j + k] + xs[j] * ys[k]) % F.p
    assert [int(v) for v in got] == want


def test_negacyclic_batched():
    F = fp128()
    rng = random.Random(5)
    B, n = 3, 128
    xs = [[rng.randrange(F.p) for _ in range(n)] for _ in range(B)]
    ys = [[rng.randrange(F.p) for _ in range(n)] for _ in range(B)]
    xa = jnp.stack([jnp.asarray(F.to_limbs(r)) for r in xs], axis=1)
    ya = jnp.stack([jnp.asarray(F.to_limbs(r)) for r in ys], axis=1)
    got = F.from_limbs(np.asarray(nb.negacyclic(F, xa, ya)))
    for b in range(B):
        assert [int(v) for v in got[b]] == \
            _naive_negacyclic(F.p, xs[b], ys[b])


def test_rs_extend_via_nussbaumer():
    """ReedSolomon with the Nussbaumer factory over secp256k1 base
    (no big 2-adic root) matches Lagrange."""
    F = p256k1_base()
    rs = ReedSolomon(6, 20, F, nb.make_nussbaumer_convolution_factory(F))
    rng = random.Random(42)
    ys = [rng.randrange(F.p) for _ in range(6)]
    out = rs.interpolate(jnp.asarray(F.to_limbs(ys)))
    got = [int(v) for v in F.from_limbs(np.asarray(out))]
    # Lagrange oracle
    for k in range(6, 20):
        acc = 0
        for i in range(6):
            num, den = 1, 1
            for j in range(6):
                if j != i:
                    num = num * (k - j) % F.p
                    den = den * (i - j) % F.p
            acc = (acc + ys[i] * num * pow(den, -1, F.p)) % F.p
        assert got[k] == acc, k
