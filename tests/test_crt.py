"""CRT convolution tests (mirrors reference crt_test.cc +
reed_solomon_test.cc's CRT strategy): Reed-Solomon extension over fields
without large 2-adic roots of unity."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.fields.fp_instances import (
    p256k1_base, p384_base, p256_scalar)
from longfellow_zk_tpu.fields.multiprime import (
    MultiPrimeField, basis_size_for, crt_primes)
from longfellow_zk_tpu.transforms.crt_conv import (
    CRTContext, make_crt_convolution_factory)
from longfellow_zk_tpu.transforms.ntt import ReedSolomon


def test_basis_primes():
    ps = crt_primes(36)
    assert len(set(ps)) == 36
    for p in ps:
        assert p % (1 << 22) == 1 and p < (1 << 32) and p > (1 << 31)
    assert basis_size_for(256) >= 18
    assert basis_size_for(521) >= 34


def test_multiprime_field_ops():
    mp = MultiPrimeField(5)
    rng = random.Random(3)
    xs = [rng.getrandbits(64) for _ in range(7)]
    ys = [rng.getrandbits(64) for _ in range(7)]
    xa = jnp.asarray(mp.to_limbs([mp.to_crt(x) for x in xs]))
    ya = jnp.asarray(mp.to_limbs([mp.to_crt(y) for y in ys]))
    got = mp.from_limbs(np.asarray(mp.mul(xa, ya)))
    for b, p in enumerate(mp.primes):
        for j in range(7):
            assert int(got[b][j]) == (xs[j] * ys[j]) % p
    got = mp.from_limbs(np.asarray(mp.add(xa, ya)))
    for b, p in enumerate(mp.primes):
        for j in range(7):
            assert int(got[b][j]) == (xs[j] + ys[j]) % p
    got = mp.from_limbs(np.asarray(mp.sub(xa, ya)))
    for b, p in enumerate(mp.primes):
        for j in range(7):
            assert int(got[b][j]) == (xs[j] - ys[j]) % p


@pytest.mark.parametrize("mkfield", [p256k1_base, p256_scalar, p384_base])
def test_crt_roundtrip(mkfield):
    F = mkfield()
    ctx = CRTContext(F)
    rng = random.Random(17)
    xs = [rng.randrange(F.p) for _ in range(9)]
    xa = jnp.asarray(F.to_limbs(xs))
    back = F.from_limbs(np.asarray(ctx.from_crt(ctx.to_crt(xa))))
    assert [int(v) for v in back] == xs


def _naive_rs_extend(F, ys, m):
    """Lagrange evaluation of the interpolating polynomial at n..m-1."""
    n = len(ys)
    out = list(ys)
    for k in range(n, m):
        acc = 0
        for i in range(n):
            num, den = 1, 1
            for j in range(n):
                if j != i:
                    num = num * (k - j) % F.p
                    den = den * (i - j) % F.p
            acc = (acc + ys[i] * num * pow(den, -1, F.p)) % F.p
        out.append(acc)
    return out


@pytest.mark.parametrize("mkfield,n,m", [(p256k1_base, 8, 24),
                                         (p256_scalar, 5, 17)])
def test_crt_reed_solomon_matches_lagrange(mkfield, n, m):
    F = mkfield()
    factory = make_crt_convolution_factory(F)
    rs = ReedSolomon(n, m, F, factory)
    rng = random.Random(99)
    rows = 3
    ys = [[rng.randrange(F.p) for _ in range(n)] for _ in range(rows)]
    ya = jnp.stack([jnp.asarray(F.to_limbs(r)) for r in ys], axis=1)
    out = rs.interpolate(ya)
    got = F.from_limbs(np.asarray(out))
    for r in range(rows):
        want = _naive_rs_extend(F, ys[r], m)
        assert [int(v) for v in got[r]] == want
