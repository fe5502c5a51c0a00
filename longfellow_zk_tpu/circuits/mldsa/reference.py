"""Host ML-DSA (FIPS 204) verification reference.

Semantic twin of reference lib/circuits/tests/pq/ml_dsa/ml_dsa_ref.{h,cc}
(verification path only — the circuit proves possession of a valid
signature, it never signs).  Coefficients are plain ints mod Q.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

from .params import D, MLDsaParams, N, Q, zetas

_INV256 = pow(256, -1, Q)


def shake256(data: bytes, n: int) -> bytes:
    return hashlib.shake_256(data).digest(n)


def shake128(data: bytes, n: int) -> bytes:
    return hashlib.shake_128(data).digest(n)


# -- polynomial arithmetic (Algorithms 41/42) --------------------------------

def ntt(a: List[int]) -> List[int]:
    a = list(a)
    k = 1
    ln = 128
    while ln >= 1:
        for start in range(0, 256, 2 * ln):
            z = zetas[k]
            k += 1
            for j in range(start, start + ln):
                t = z * a[j + ln] % Q
                a[j + ln] = (a[j] - t) % Q
                a[j] = (a[j] + t) % Q
        ln >>= 1
    return a


def inv_ntt(a: List[int]) -> List[int]:
    a = list(a)
    k = 255
    ln = 1
    while ln < 256:
        for start in range(0, 256, 2 * ln):
            z = (-zetas[k]) % Q
            k -= 1
            for j in range(start, start + ln):
                t = a[j]
                a[j] = (t + a[j + ln]) % Q
                a[j + ln] = (t - a[j + ln]) * z % Q
        ln <<= 1
    return [x * _INV256 % Q for x in a]


def poly_pointwise(a, b):
    return [x * y % Q for x, y in zip(a, b)]


def poly_add(a, b):
    return [(x + y) % Q for x, y in zip(a, b)]


def poly_sub(a, b):
    return [(x - y) % Q for x, y in zip(a, b)]


# -- sampling (Algorithms 29/32/34) -------------------------------------------

def rej_ntt_poly(rho: bytes, num_blocks: int = 5) -> List[int]:
    out = shake128(rho, num_blocks * 168)
    a = []
    i = 0
    while i + 2 < len(out) and len(a) < 256:
        z = out[i] | (out[i + 1] << 8) | ((out[i + 2] & 0x7F) << 16)
        if z < Q:
            a.append(z)
        i += 3
    assert len(a) == 256, "failed to sample polynomial"
    return a


def expand_a(params: MLDsaParams, rho: bytes):
    return [[rej_ntt_poly(rho + bytes([s, r])) for s in range(params.L)]
            for r in range(params.K)]


def sample_in_ball(params: MLDsaParams, rho: bytes) -> List[int]:
    out = shake256(rho, 136)
    c = [0] * N
    idx = 8
    for i in range(256 - params.tau, 256):
        while True:
            assert idx < len(out), "not enough pseudorandom bytes"
            j = out[idx]
            idx += 1
            if j <= i:
                break
        c[i] = c[j]
        bit_idx = i + params.tau - 256
        bit = (out[bit_idx // 8] >> (bit_idx % 8)) & 1
        c[j] = (Q - 1) if bit else 1
    return c


# -- rounding (Algorithms 35-40) ----------------------------------------------

def decompose(params: MLDsaParams, r: int) -> Tuple[int, int]:
    r_plus = r % Q
    alpha = 2 * params.gamma_2
    r0 = r_plus % alpha
    if r0 > alpha // 2:
        r0 -= alpha
    if r_plus - r0 == Q - 1:
        return 0, r0 - 1
    return (r_plus - r0) // alpha, r0


def use_hint(params: MLDsaParams, h: bool, r: int) -> int:
    m = params.M
    r1, r0 = decompose(params, r)
    if h and r0 > 0:
        return (r1 + 1) % m
    if h:
        return (r1 - 1) % m
    return r1


# -- (un)packing (Algorithms 18/19/21/23/27) -----------------------------------

def bit_unpack(v: bytes, b: int, c: int) -> Optional[List[int]]:
    if len(v) != 32 * c:
        return None
    w = []
    for i in range(N):
        off = i * c
        val = int.from_bytes(v[off // 8 : off // 8 + 4], "little")
        val = (val >> (off % 8)) & ((1 << c) - 1)
        w.append((b - val) % Q)
    return w


def simple_bit_unpack(v: bytes, b: int) -> List[int]:
    c = b.bit_length()
    assert len(v) == 32 * c
    w = []
    for i in range(N):
        off = i * c
        val = int.from_bytes(v[off // 8 : off // 8 + 4], "little")
        w.append((val >> (off % 8)) & ((1 << c) - 1))
    return w


def simple_bit_pack(w: List[int], b: int) -> bytes:
    c = max(1, b.bit_length())
    acc = 0
    for i in range(N - 1, -1, -1):
        acc = (acc << c) | (w[i] & ((1 << c) - 1))
    return acc.to_bytes((256 * c + 7) // 8, "little")


def hint_bit_unpack(params: MLDsaParams, y: bytes):
    h = [[False] * N for _ in range(params.K)]
    index = 0
    for i in range(params.K):
        limit = y[params.omega + i]
        if limit < index or limit > params.omega:
            return None
        last = -1
        while index < limit:
            byte = y[index]
            index += 1
            if last >= 0 and byte <= last:
                return None
            last = byte
            h[i][byte] = True
    while index < params.omega:
        if y[index] != 0:
            return None
        index += 1
    return h


def sig_decode(params: MLDsaParams, sigma: bytes):
    c = params.z_coeff_bits
    expected = params.c_tilde_bytes + params.L * 32 * c + params.omega \
        + params.K
    if len(sigma) < expected:
        return None
    off = 0
    c_tilde = sigma[: params.c_tilde_bytes]
    off += params.c_tilde_bytes
    z = []
    for _ in range(params.L):
        # BitUnpack(v, a=gamma_1-1, b=gamma_1): w_i = b - val
        zp = bit_unpack(sigma[off : off + 32 * c], params.gamma_1, c)
        if zp is None:
            return None
        z.append(zp)
        off += 32 * c
    h = hint_bit_unpack(params, sigma[off : off + params.omega + params.K])
    if h is None:
        return None
    return c_tilde, z, h


def pk_decode(params: MLDsaParams, pk: bytes):
    c = 10
    assert len(pk) >= 32 + 32 * params.K * c
    rho = pk[:32]
    a_hat = expand_a(params, rho)
    t1 = []
    off = 32
    for _ in range(params.K):
        t1.append(simple_bit_unpack(pk[off : off + 32 * c], 1023))
        off += 32 * c
    tr = shake256(pk, 64)
    return a_hat, t1, tr


def w1_encode(params: MLDsaParams, w1: List[List[int]]) -> bytes:
    b = params.M - 1
    return b"".join(simple_bit_pack(p, b) for p in w1)


def compute_mu(tr: bytes, msg: bytes, ctx: bytes) -> bytes:
    assert len(ctx) <= 255
    return shake256(tr + bytes([0, len(ctx)]) + ctx + msg, 64)


# -- top-level verification (FIPS 204 Algorithm 3/8) ---------------------------

def verify(params: MLDsaParams, pk: bytes, msg: bytes, ctx: bytes,
           sigma: bytes) -> bool:
    dec = sig_decode(params, sigma)
    if dec is None:
        return False
    c_tilde, z, h = dec
    a_hat, t1, tr = pk_decode(params, pk)
    mu = compute_mu(tr, msg, ctx)

    # ||z||_inf < gamma_1 - beta
    bound = params.gamma_1 - params.beta
    for zp in z:
        for v in zp:
            centered = v if v <= Q // 2 else v - Q
            if abs(centered) >= bound:
                return False

    c = sample_in_ball(params, c_tilde)
    nttc = ntt(c)
    nttz = [ntt(zp) for zp in z]
    scale = pow(2, D, Q)
    nttt1 = [ntt([x * scale % Q for x in t1p]) for t1p in t1]

    w1p = []
    for i in range(params.K):
        acc = [0] * N
        for j in range(params.L):
            acc = poly_add(acc, poly_pointwise(a_hat[i][j], nttz[j]))
        acc = poly_sub(acc, poly_pointwise(nttc, nttt1[i]))
        wpa = inv_ntt(acc)
        w1p.append([use_hint(params, h[i][k], wpa[k]) for k in range(N)])

    c_prime = shake256(mu + w1_encode(params, w1p), params.c_tilde_bytes)
    return c_prime == c_tilde
