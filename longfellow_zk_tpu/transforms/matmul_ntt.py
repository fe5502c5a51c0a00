"""MXU matmul-NTT: the NTT as batched bf16 matrix multiplies.

TPU-native re-design of the radix-2 FFT (reference lib/algebra/fft.h):
instead of log2(n) butterfly stages of emulated-integer multiplies on
the VPU, a recursive four-step decomposition n = R*S whose base-case
B-point transforms execute on the MXU:

  - multiplication of a field element x by a constant c is *linear* in
    the byte-limbs of x:  x*c mod p = sum_j byte_j(x) * (c*2^(8j) mod p),
    so a whole B-point NTT (every output a fixed linear combination of
    inputs) is ONE matrix: M[(n_in, j), (k_out, b)] = byte b of
    (w^{n k} * 2^(8j) mod p);
  - exactness on the MXU: inputs are bytes (<=255, exact in bf16) and
    the matrix is split into lo/hi nibbles (<=15), so every f32-
    accumulated dot is < 2^24 and exact; two matmuls recombine as
    lo + 16*hi;
  - Montgomery forms pass through untouched: mont(x)*w = mont(x*w) for a
    *natural-form* constant w, so matrices are built from natural
    twiddles and operate directly on Montgomery limbs;
  - lazy byte columns are carry-propagated with exact f32 floor-divides
    and renormalized mod p via the field's byte-column reducer;
  - the inter-step twiddle scaling (all-distinct factors) stays an
    elementwise vector multiply with a precomputed twiddle array.

Semantics identical to transforms.ntt.NTT.fftb/fftf (tested against it).
Currently specialized to 128-bit fields (L=8 halfwords / 16 bytes).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.fp import PrimeField

NBYTES = 16     # 128-bit elements
NBYTES_IN = 18  # input bytes per element (carry headroom)


def _pow(F, base, e):
    return pow(base, e, F.p)


# ---------------------------------------------------------------------------
# representation converters
# ---------------------------------------------------------------------------

def halfwords_to_bytes(x: jax.Array) -> jax.Array:
    """u32[8, ..., m] canonical halfwords -> f32[..., m, 18] bytes."""
    hw = jnp.moveaxis(x, 0, -1)  # [..., m, 8]
    lo = (hw & np.uint32(0xFF)).astype(jnp.float32)
    hi = (hw >> np.uint32(8)).astype(jnp.float32)
    b = jnp.stack([lo, hi], axis=-1).reshape(hw.shape[:-1] + (16,))
    pad = [(0, 0)] * (b.ndim - 1) + [(0, NBYTES_IN - 16)]
    return jnp.pad(b, pad)


def _carry_fix(cols: jax.Array) -> jax.Array:
    """uint32[..., 16] lazy byte columns (< 2^27) -> f32[..., 18] bytes."""
    outs = []
    carry = jnp.zeros_like(cols[..., 0])
    for j in range(16):
        cur = cols[..., j] + carry
        carry = cur >> np.uint32(8)
        outs.append(cur & np.uint32(0xFF))
    # residual carry < 2^19: split into two bytes (top byte < 2^11 is
    # folded by bytes_to_halfwords which tolerates 16-bit hi)
    outs.append(carry & np.uint32(0xFF))
    outs.append(carry >> np.uint32(8))
    return jnp.stack(outs, axis=-1).astype(jnp.float32)


def bytes_to_halfwords(F: PrimeField, b: jax.Array) -> jax.Array:
    """f32[..., m, 18] bytes -> canonical u32[8, ..., m] halfwords mod p.

    Folds the two overflow bytes via 2^128 = 2^108 - 1 (mod p) and runs
    the field's byte-column renormalizer.
    """
    bu = b.astype(jnp.uint32)
    hi = bu[..., 16] + (bu[..., 17] << np.uint32(8))  # < 2^16
    cols = [bu[..., j] for j in range(16)]
    # hi * (2^108 - 1) = hi * (0x0f ff ff ... ff): bytes 0..12 are 0xff,
    # byte 13 is 0x0f
    for j in range(13):
        cols[j] = cols[j] + hi * np.uint32(0xFF)
    cols[13] = cols[13] + hi * np.uint32(0x0F)
    stacked = jnp.stack(cols, axis=0)  # [16, ..., m]
    return F._renormalize(stacked)


# ---------------------------------------------------------------------------
# constant matrices
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _ntt_matrices(p: int, w: int, B: int) -> Tuple[np.ndarray, np.ndarray]:
    """lo/hi nibble matrices [B*18, B*16] for the B-point NTT with root w:
    out[k] = sum_n x[n] w^{n k}."""
    M = np.zeros((B * NBYTES_IN, B * NBYTES), dtype=np.float32)
    for n in range(B):
        for k in range(B):
            wnk = pow(w, n * k, p)
            for j in range(NBYTES_IN):
                c = (wnk << (8 * j)) % p
                cb = c.to_bytes(NBYTES, "little")
                row = n * NBYTES_IN + j
                for bb in range(NBYTES):
                    M[row, k * NBYTES + bb] = cb[bb]
    Mi = M.astype(np.int32)
    lo = (Mi & 0xF).astype(np.float32)
    hi = (Mi >> 4).astype(np.float32)
    return lo, hi


def _matmul_ntt_block(F: PrimeField, xb: jax.Array, lo: jax.Array,
                      hi: jax.Array, B: int) -> jax.Array:
    """xb: f32[..., B, 18] bytes -> f32[..., B, 18] bytes of the B-point NTT."""
    head = xb.shape[:-2]
    flat = xb.reshape(head + (B * NBYTES_IN,)).astype(jnp.bfloat16)
    acc_lo = jax.lax.dot_general(
        flat, lo.astype(jnp.bfloat16),
        dimension_numbers=(((flat.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_hi = jax.lax.dot_general(
        flat, hi.astype(jnp.bfloat16),
        dimension_numbers=(((flat.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # combine nibble halves in integers: each accumulator < 2^24 (exact
    # in f32), the combined value < 2^27 needs int32
    cols = acc_lo.astype(jnp.uint32) + \
        np.uint32(16) * acc_hi.astype(jnp.uint32)
    return _carry_fix(cols.reshape(head + (B, NBYTES)))


# ---------------------------------------------------------------------------
# the transform
# ---------------------------------------------------------------------------

class MatmulNTT:
    """fftb/fftf with transforms along the last axis of u32[8, ..., n]."""

    nlead = 1  # planar limb arrays, like transforms.ntt.NTT over PrimeField

    def __init__(self, F: PrimeField, omega: int, omega_order: int,
                 radix: int = 128):
        assert F.L == 8, "matmul NTT currently supports 128-bit fields"
        self.F = F
        self.omega = omega
        self.omega_order = omega_order
        self.radix = radix

    def _root(self, n: int, inverse: bool) -> int:
        assert self.omega_order % n == 0
        w = pow(self.omega, self.omega_order // n, self.F.p)
        if inverse:
            w = pow(w, -1, self.F.p)
        return w

    @functools.lru_cache(maxsize=None)
    def _twiddle_limbs(self, n: int, R: int, inverse: bool) -> np.ndarray:
        """Montgomery limb array [8, R, S] of w^{r*j2} (natural constants
        become Montgomery-domain multipliers, see module docstring —
        multiplying mont(x) by natural w yields mont(x*w), so we store
        the twiddles in Montgomery form and use the standard F.mul)."""
        F = self.F
        S = n // R
        w = self._root(n, inverse)
        vals = []
        for r in range(R):
            wr = pow(w, r, F.p)
            cur = 1
            for j2 in range(S):
                vals.append(cur)
                cur = (cur * wr) % F.p
        return F.to_limbs(vals).reshape(8, R, S)

    def _rec(self, x: jax.Array, n: int, inverse: bool) -> jax.Array:
        F = self.F
        if n <= self.radix:
            w = self._root(n, inverse)
            lo, hi = _ntt_matrices(F.p, w, n)
            xb = halfwords_to_bytes(x)
            yb = _matmul_ntt_block(F, xb, jnp.asarray(lo), jnp.asarray(hi), n)
            return bytes_to_halfwords(F, yb)
        R = self.radix
        S = n // R
        head = x.shape[1:-1]
        # x[r + R*s] -> [.., S, R] -> batch r: [.., R, S]
        X2 = jnp.swapaxes(x.reshape((8,) + head + (S, R)), -1, -2)
        Y = self._rec(X2, S, inverse)
        tw = jnp.asarray(self._twiddle_limbs(n, R, inverse))
        tw = tw.reshape((8,) + (1,) * len(head) + (R, S))
        Z = F.mul(Y, tw)
        # step 3: R-point NTT over r: batch j2: [.., S, R]
        Z2 = jnp.swapaxes(Z, -1, -2)
        A = self._rec(Z2, R, inverse)  # [.., S, R] last axis j1
        # output index j = j1*S + j2: arrange [.., R(j1), S(j2)]
        out = jnp.swapaxes(A, -1, -2)
        return out.reshape((8,) + head + (n,))

    def fftb(self, x: jax.Array) -> jax.Array:
        return self._rec(x, x.shape[-1], inverse=False)

    def fftf(self, x: jax.Array) -> jax.Array:
        return self._rec(x, x.shape[-1], inverse=True)
