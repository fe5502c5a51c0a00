"""Field arithmetic tests, mirroring reference lib/algebra/fp_test.cc and
lib/gf2k/gf2_128_test.cc coverage: axioms, Montgomery edge cases,
serialization round trips, device-vs-host-oracle cross checks."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.fields.fp_instances import (
    fp64,
    fp128,
    p256_base,
    p256_scalar,
    p256k1_base,
    P128_OMEGA,
    P128_OMEGA_ORDER,
)
from longfellow_zk_tpu.fields.fp2 import Fp2
from longfellow_zk_tpu.fields.gf2 import gf2_128, gf_mul_int, clmul_int

FIELDS = [fp64, fp128, p256_base, p256_scalar, p256k1_base]


@pytest.mark.parametrize("field_fn", FIELDS)
def test_fp_device_matches_oracle(field_fn):
    F = field_fn()
    rng = random.Random(42)
    n = 64
    xs = [rng.randrange(F.p) for _ in range(n)]
    ys = [rng.randrange(F.p) for _ in range(n)]
    # include edge cases
    xs[:4] = [0, 1, F.p - 1, F.p - 1]
    ys[:4] = [0, F.p - 1, F.p - 1, 1]
    a = jnp.asarray(F.to_limbs(xs))
    b = jnp.asarray(F.to_limbs(ys))
    s = F.from_limbs(jax.jit(F.add)(a, b))
    d = F.from_limbs(jax.jit(F.sub)(a, b))
    m = F.from_limbs(jax.jit(F.mul)(a, b))
    ng = F.from_limbs(jax.jit(F.neg)(a))
    for i in range(n):
        assert s[i] == (xs[i] + ys[i]) % F.p
        assert d[i] == (xs[i] - ys[i]) % F.p
        assert m[i] == (xs[i] * ys[i]) % F.p
        assert ng[i] == (-xs[i]) % F.p


@pytest.mark.parametrize("field_fn", [fp64, fp128])
def test_fp_inverse(field_fn):
    F = field_fn()
    rng = random.Random(7)
    xs = [rng.randrange(1, F.p) for _ in range(16)]
    a = jnp.asarray(F.to_limbs(xs))
    iv = F.from_limbs(jax.jit(F.inv)(a))
    for i, x in enumerate(xs):
        assert iv[i] == pow(x, -1, F.p)


def test_fp128_root_of_unity():
    F = fp128()
    # omega has order exactly 2^108 (fp_p128.h:37-46)
    w = P128_OMEGA
    assert pow(w, P128_OMEGA_ORDER, F.p) == 1
    assert pow(w, P128_OMEGA_ORDER // 2, F.p) == F.p - 1


@pytest.mark.parametrize("field_fn", [fp128, p256_base])
def test_fp_serialization(field_fn):
    F = field_fn()
    rng = random.Random(3)
    for _ in range(10):
        x = rng.randrange(F.p)
        b = F.to_bytes(x)
        assert len(b) == F.kBytes
        assert F.of_bytes(b) == x
    # out-of-range rejects
    assert F.of_bytes(F.p.to_bytes(F.kBytes, "little")) is None
    assert F.of_bytes(b"\xff" * F.kBytes) is None


def test_fp_sample_rejection():
    F = fp128()
    # deterministic byte feeder
    stream = [b"\xff" * 16, (F.p - 3).to_bytes(17, "little")[:16]]

    def fill(n):
        return stream.pop(0)[:n]

    # first attempt is >= p (all ones masked to exact bits still >= p), retry
    v = F.sample(fill)
    assert v < F.p


def test_gf2_host_axioms():
    F = gf2_128()
    rng = random.Random(5)
    for _ in range(20):
        a = rng.getrandbits(128)
        b = rng.getrandbits(128)
        c = rng.getrandbits(128)
        assert F.mul_i(a, F.add_i(b, c)) == F.add_i(F.mul_i(a, b), F.mul_i(a, c))
        assert F.mul_i(a, b) == F.mul_i(b, a)
    # clmul distributes
    assert clmul_int(3, 3) == 5  # (x+1)^2 = x^2+1


def test_gf2_subfield():
    F = gf2_128()
    # g generates the multiplicative group of GF(2^16)
    x = F.g
    seen_one_at = None
    acc = F.g
    # order divides 2^16-1; full order check via factor exponents
    e = (1 << 16) - 1
    r = 1
    b = F.g
    while e:
        if e & 1:
            r = gf_mul_int(r, b)
        b = gf_mul_int(b, b)
        e >>= 1
    assert r == 1
    for q in [3, 5, 17, 257]:  # prime factors of 65535
        e = ((1 << 16) - 1) // q
        r = 1
        b = F.g
        while e:
            if e & 1:
                r = gf_mul_int(r, b)
            b = gf_mul_int(b, b)
            e >>= 1
        assert r != 1, f"g order divides (2^16-1)/{q}"
    # of_scalar/solve round trip + subfield closure
    for u in [0, 1, 2, 0xABCD, 0xFFFF]:
        e = F.of_scalar(u)
        assert F.in_subfield(e)
        assert F.of_bytes_subfield(F.to_bytes_subfield(e)) == e
    # product of subfield elements stays in subfield
    a = F.of_scalar(1234)
    b = F.of_scalar(4321)
    assert F.in_subfield(F.mul_i(a, b))


def test_gf2_device_matches_host():
    F = gf2_128()
    rng = random.Random(6)
    xs = [rng.getrandbits(128) for _ in range(32)]
    ys = [rng.getrandbits(128) for _ in range(32)]
    xs[:3] = [0, 1, (1 << 128) - 1]
    ys[:3] = [1, (1 << 128) - 1, (1 << 128) - 1]
    a = jnp.asarray(F.to_limbs(xs))
    b = jnp.asarray(F.to_limbs(ys))
    m = F.from_limbs(jax.jit(F.mul)(a, b))
    s = F.from_limbs(jax.jit(F.sqr)(a))
    for i in range(32):
        assert m[i] == gf_mul_int(xs[i], ys[i])
        assert s[i] == gf_mul_int(xs[i], xs[i])


def test_gf2_device_inverse():
    F = gf2_128()
    rng = random.Random(8)
    xs = [rng.getrandbits(128) | 1 for _ in range(8)]
    a = jnp.asarray(F.to_limbs(xs))
    iv = F.from_limbs(jax.jit(F.inv)(a))
    for i, x in enumerate(xs):
        assert gf_mul_int(iv[i], x) == 1


def test_fp2_ops():
    F2 = Fp2(p256_base())
    p = F2.f.p
    rng = random.Random(9)
    xs = [(rng.randrange(p), rng.randrange(p)) for _ in range(8)]
    ys = [(rng.randrange(p), rng.randrange(p)) for _ in range(8)]
    a = jnp.asarray(F2.to_limbs(xs))
    b = jnp.asarray(F2.to_limbs(ys))
    m = F2.from_limbs(jax.jit(F2.mul)(a, b))
    for i in range(8):
        exp = F2.mul_i(xs[i], ys[i])
        assert tuple(m[i]) == exp
    # host inverse
    for x in xs:
        assert F2.mul_i(x, F2.inv_i(x)) == (1, 0)
    # device inverse
    iv = F2.from_limbs(jax.jit(F2.inv)(a))
    for i, x in enumerate(xs):
        assert F2.mul_i(tuple(iv[i]), x) == (1, 0)


def test_fp2_root_of_unity():
    from longfellow_zk_tpu.fields.fp_instances import (
        P256_FP2_ROOT_X,
        P256_FP2_ROOT_Y,
        P256_FP2_ROOT_ORDER,
    )

    F2 = Fp2(p256_base())
    w = (P256_FP2_ROOT_X, P256_FP2_ROOT_Y)
    # w^(2^31) == 1 and w^(2^30) == -1
    e = P256_FP2_ROOT_ORDER
    r = (1, 0)
    b = w
    while e:
        if e & 1:
            r = F2.mul_i(r, b)
        b = F2.mul_i(b, b)
        e >>= 1
    assert r == (1, 0)
    e = P256_FP2_ROOT_ORDER // 2
    r = (1, 0)
    b = w
    while e:
        if e & 1:
            r = F2.mul_i(r, b)
        b = F2.mul_i(b, b)
        e >>= 1
    assert r == (F2.f.p - 1, 0)
