"""LCH14 additive FFT over GF(2^128), TPU-native.

Semantic twin of the reference LCH14 (lib/gf2k/lch14.h:36-238, following
[LCH14] arXiv:1404.3458 and [DP24] eprint 2024/504 Algorithm 2): FFT /
IFFT over the novel polynomial basis on cosets of the subfield domain,
plus the van-der-Hoeven-style BidirectionalFFT used by the Reed-Solomon
"extend" encoder (lib/gf2k/lch14_reed_solomon.h:29-110).

TPU-native design (this is NOT how the reference computes): every
twiddle factor of a stage is an *affine* GF(2)-combination of the
per-stage basis values w_hat[i][*]:

    tw(u) = tw(coset) XOR sum_{k} u_k * w_hat[i][i+1+k]

and multiplication by any *constant* c is GF(2)-linear in the element
bits: y = x @ M_c over GF(2).  So a whole butterfly stage becomes a
handful of 128x128 bit-matrix products executed as int8 MXU matmuls with
a parity (&1) epilogue, plus masked XOR combines — no carry-less
multiplier needed (the reference needs PCLMULQDQ/NEON per element,
gf2k/sysdep.h).  Elements are held in bit form int8[..., n, 128] inside
the transform; the halfword planar form uint32[8, ...] is the external
interchange format.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.gf2 import GF2_128, gf_mul_int, POLY_LOW

INT8 = jnp.int8


# ---------------------------------------------------------------------------
# bit-form conversion
# ---------------------------------------------------------------------------

def halfwords_to_bits(x: jax.Array) -> jax.Array:
    """uint32[8, ...] halfwords -> int8[..., 128] bits."""
    # [..., 8]
    hw = jnp.moveaxis(x, 0, -1)
    shifts = jnp.arange(16, dtype=jnp.uint32)
    bits = (hw[..., None] >> shifts) & np.uint32(1)  # [..., 8, 16]
    return bits.reshape(bits.shape[:-2] + (128,)).astype(INT8)


@functools.lru_cache(maxsize=1)
def _pack_weights() -> np.ndarray:
    w = np.zeros((128, 8), dtype=np.int32)
    for k in range(128):
        w[k, k // 16] = 1 << (k % 16)
    return w


def bits_to_halfwords(bits: jax.Array) -> jax.Array:
    """int8[..., 128] bits -> uint32[8, ...] halfwords."""
    w = jnp.asarray(_pack_weights())
    hw = jax.lax.dot_general(
        bits.astype(jnp.int32), w,
        dimension_numbers=(((bits.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [..., 8]
    return jnp.moveaxis(hw.astype(jnp.uint32), -1, 0)


@functools.lru_cache(maxsize=None)
def _const_mul_matrix_or_trivial(c: int) -> np.ndarray:
    """_const_mul_matrix with the 0/1 shortcuts materialized."""
    if c == 0:
        return np.zeros((128, 128), dtype=np.int8)
    if c == 1:
        return np.eye(128, dtype=np.int8)
    return _const_mul_matrix(c)


@functools.lru_cache(maxsize=4096)
def _const_mul_matrix(c: int) -> np.ndarray:
    """M_c[j, k] = bit k of (c * x^j mod poly): y = x @ M_c over GF(2)."""
    M = np.zeros((128, 128), dtype=np.int8)
    cur = c
    for j in range(128):
        for k in range(128):
            M[j, k] = (cur >> k) & 1
        # multiply by x
        cur <<= 1
        if cur >> 128:
            cur = (cur & ((1 << 128) - 1)) ^ POLY_LOW
    return M


def mul_const_bits(x: jax.Array, c: int) -> jax.Array:
    """Multiply bit-form elements by the constant c (parity matmul)."""
    if c == 0:
        return jnp.zeros_like(x)
    if c == 1:
        return x
    M = jnp.asarray(_const_mul_matrix(c))
    y = jax.lax.dot_general(
        x, M,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y & 1).astype(INT8)


# ---------------------------------------------------------------------------
# LCH14 transform
# ---------------------------------------------------------------------------

class LCH14:
    """Additive FFT machinery; all methods act on int8[..., n, 128] bits
    along the second-to-last axis."""

    def __init__(self, F: GF2_128):
        self.F = F
        k = F.kSubFieldBits
        # W_0(X) = X on the basis; W_{i+1}(X) = W_i(X)(W_i(X)+W_i(beta_i))
        W = [[0] * k for _ in range(k)]
        for j in range(k):
            W[0][j] = F.beta[j]
        for i in range(k - 1):
            for j in range(k):
                W[i + 1][j] = gf_mul_int(W[i][j], W[i][j] ^ W[i][i])
        self.w_hat = [[0] * k for _ in range(k)]
        for i in range(k):
            scale = F.inv_i(W[i][i])
            for j in range(k):
                self.w_hat[i][j] = gf_mul_int(scale, W[i][j])

    def twiddle(self, i: int, u: int) -> int:
        """Single twiddle (lch14.h:81-89)."""
        t = 0
        k = 0
        while u:
            if u & 1:
                t ^= self.w_hat[i][k]
            u >>= 1
            k += 1
        return t

    # -- stage application --------------------------------------------------

    def _stage(self, B: jax.Array, l: int, i: int, coset: int,
               forward: bool) -> jax.Array:
        """One butterfly stage over int8[..., 2^l, 128]."""
        s = 1 << i
        G = 1 << (l - 1 - i)  # number of twiddle groups
        head = B.shape[:-2]
        X = B.reshape(head + (G, 2, s, 128))
        lo = X[..., 0, :, :]
        hi = X[..., 1, :, :]

        tw0 = self.twiddle(i, coset)

        def tw_mul(v: jax.Array) -> jax.Array:
            """t[u] = tw(u) * v[u] via the affine decomposition — all
            constants of the stage in ONE parity matmul ([128,
            (nk+1)*128] concatenated matrices), then nk masked XOR
            combines.  One dot_general per stage instead of up to l;
            the per-matmul trace cost is what made mdoc-scale encode
            programs uncompilable within the relay budget."""
            nk = l - 1 - i
            consts = [tw0] + [self.w_hat[i][(i + 1) + k]
                              for k in range(nk)]
            Mcat = jnp.asarray(np.concatenate(
                [_const_mul_matrix_or_trivial(c) for c in consts],
                axis=1))
            Y = jax.lax.dot_general(
                v, Mcat,
                dimension_numbers=(((v.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            Y = (Y & 1).astype(INT8)
            t = Y[..., :128]
            for k in range(nk):
                mask = ((np.arange(G) >> k) & 1).astype(np.int8)
                maskj = jnp.asarray(mask).reshape(
                    (1,) * len(head) + (G, 1, 1))
                t = t ^ (Y[..., (k + 1) * 128 : (k + 2) * 128] & maskj)
            return t

        if forward:
            lo2 = lo ^ tw_mul(hi)
            hi2 = hi ^ lo2
        else:
            hi2 = hi ^ lo
            lo2 = lo ^ tw_mul(hi2)
        out = jnp.stack([lo2, hi2], axis=-3)
        return out.reshape(head + (1 << l, 128))

    def fft(self, B: jax.Array, coset: int = 0) -> jax.Array:
        """Evaluate basis coefficients -> values on the coset
        (lch14.h:106-124)."""
        n = B.shape[-2]
        l = n.bit_length() - 1
        assert 1 << l == n and l <= self.F.kSubFieldBits
        for i in reversed(range(l)):
            B = self._stage(B, l, i, coset, forward=True)
        return B

    def ifft(self, B: jax.Array, coset: int = 0) -> jax.Array:
        """Values on the coset -> basis coefficients (lch14.h:126-144)."""
        n = B.shape[-2]
        l = n.bit_length() - 1
        assert 1 << l == n and l <= self.F.kSubFieldBits
        for i in range(l):
            B = self._stage(B, l, i, coset, forward=False)
        return B

    # -- bidirectional (truncated) transform --------------------------------

    def bidirectional_fft(self, B: jax.Array, k: int) -> jax.Array:
        """Flip time/frequency with k known evaluations (lch14.h:146-217).

        B[..., 0:k, :] holds evaluations, B[..., k:n, :] holds (zero)
        coefficients on input; on output positions [0:k] hold coefficients
        and [k:n] hold the missing evaluations.
        """
        n = B.shape[-2]
        l = n.bit_length() - 1
        assert 1 << l == n
        return self._bidir(B, l, 0, k)

    def _butterflies(self, B, a: int, b: int, s: int, tw0: int, kind: str):
        """Apply butterflies on positions uv in [a, b) with partner uv+s."""
        if a >= b:
            return B
        lo = B[..., a:b, :]
        hi = B[..., a + s : b + s, :]
        if kind == "fwd":
            lo2 = lo ^ mul_const_bits(hi, tw0)
            hi2 = hi ^ lo2
        elif kind == "bwd":
            hi2 = hi ^ lo
            lo2 = lo ^ mul_const_bits(hi2, tw0)
        else:  # diag: forward at uv+s, backward at uv
            hi2 = hi ^ lo
            lo2 = lo ^ mul_const_bits(hi, tw0)
        parts = []
        if a > 0:
            parts.append(B[..., :a, :])
        parts.append(lo2)
        if b < a + s:
            parts.append(B[..., b : a + s, :])
        parts.append(hi2)
        if b + s < B.shape[-2]:
            parts.append(B[..., b + s :, :])
        return jnp.concatenate(parts, axis=-2)

    def _bidir(self, B: jax.Array, i: int, coset: int, k: int) -> jax.Array:
        if i == 0:
            return B
        i -= 1
        s = 1 << i
        tw0 = self.twiddle(i, coset)
        if k < s:
            B = self._butterflies(B, k, s, s, tw0, "fwd")
            first = self._bidir(B[..., :s, :], i, coset, k)
            B = jnp.concatenate([first, B[..., s:, :]], axis=-2)
            B = self._butterflies(B, 0, k, s, tw0, "diag")
            second = self.fft(B[..., s:, :], coset + s)
            return jnp.concatenate([B[..., :s, :], second], axis=-2)
        else:
            first = self.ifft(B[..., :s, :], coset)
            B = jnp.concatenate([first, B[..., s:, :]], axis=-2)
            B = self._butterflies(B, k - s, s, s, tw0, "diag")
            second = self._bidir(B[..., s:, :], i, coset + s, k - s)
            B = jnp.concatenate([B[..., :s, :], second], axis=-2)
            return self._butterflies(B, 0, k - s, s, tw0, "bwd")


class LCH14ReedSolomon:
    """RS "extend" for GF(2^128) (reference lch14_reed_solomon.h:29-110).

    Interpolates values at points of_scalar(0..n-1) of a degree <n
    polynomial to points of_scalar(0..m-1), batched over leading axes.
    Input/output in halfword planar form uint32[8, ..., m]; positions
    [0, n) must hold the inputs.
    """

    def __init__(self, n: int, m: int, F: GF2_128):
        self.F = F
        self.n = n
        self.m = m
        self.fft = LCH14(F)
        l = 0
        fftn = 1
        while fftn < n:
            fftn <<= 1
            l += 1
        self.l = l
        self.fftn = fftn

    def interpolate(self, y: jax.Array) -> jax.Array:
        """y: uint32[8, ..., n] -> uint32[8, ..., m]."""
        F, n, m, l, fftn = self.F, self.n, self.m, self.l, self.fftn
        assert y.shape[-1] == n
        bits = halfwords_to_bits(y)  # [..., n, 128]
        pad = [(0, 0)] * (bits.ndim - 2) + [(0, fftn - n), (0, 0)]
        C = jnp.pad(bits, pad)
        C = self.fft.bidirectional_fft(C, n)
        outs = [bits]  # evaluations 0..n-1 (unchanged)
        if n < min(m, fftn):
            outs.append(C[..., n : min(m, fftn), :])
        # coefficients for the remaining cosets
        coeffs = jnp.concatenate(
            [C[..., :n, :], jnp.zeros_like(C[..., n:, :])], axis=-2
        )
        coset = 1
        while (coset << l) < m:
            b = coset << l
            ev = self.fft.fft(coeffs, b)
            take = min(fftn, m - b)
            outs.append(ev[..., :take, :])
            coset += 1
        full = jnp.concatenate(outs, axis=-2)
        return bits_to_halfwords(full)
