"""Nussbaumer negacyclic/cyclic convolution — no roots of unity needed.

Semantic twin of reference lib/algebra/nussbaumer.h:28-399 (Knuth TAOCP
4.6.4 ex. 59), re-derived for TPU: the reference is a scalar in-place
recursion; here every level is a batched array program.

Math: for n = m*r (m <= r) write a(x) = sum_i x^i A_i(y), y = x^m, in
R[y]/(y^r + 1).  y^(r/m) is a primitive 2m-th root of unity, and
multiplying by y^s is a *rotation with negated wrap* — a gather plus a
sign mask, no field multiplies.  The product needs a 2m-point cyclic
convolution of the block vectors (FFT over the block axis with rotation
twiddles) and r-sized negacyclic sub-products, which recurse *batched
over all 2m blocks at once* — the whole recursion tree at one depth is
a single array op.  Base case: O(n^2) gather "polymul matrix", which on
TPU is a handful of vectorized multiplies for n <= 32.

The Convolution wrapper matches FFTConvolution's contract (cyclic over
pow2 padding >= m; ReedSolomon only consumes indices >= n, which never
wrap).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ntt import _choose_padding, _insert_axes

K_SMALL = 32  # base-case size (reference kNussbaumerSmall=64)


def _nlead(F) -> int:
    return getattr(F, "kNLead", 2 if type(F).__name__ == "Fp2" else 1)


def _sum_terms(F, terms: jax.Array, axis: int) -> jax.Array:
    """Field sum along batch axis `axis` (absolute or negative)."""
    ax = axis % terms.ndim
    if hasattr(F, "lazy_sum"):
        # lazy_sum counts axes excluding the limb axis 0
        return F.lazy_sum(terms, axis=ax - 1)
    n = terms.shape[ax]
    acc = jnp.take(terms, 0, axis=ax)
    for i in range(1, n):
        acc = F.add(acc, jnp.take(terms, i, axis=ax))
    return acc


@functools.lru_cache(maxsize=None)
def _base_tables(n: int, negacyclic: bool):
    """idx[j,k] = (k-j) mod n; sign[j,k] = wrap parity."""
    j = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    idx = (k - j) % n
    neg = (k - j) < 0 if negacyclic else np.zeros((n, n), bool)
    return idx.astype(np.int32), neg


def _base_conv(F, x: jax.Array, y: jax.Array, negacyclic: bool) -> jax.Array:
    """z[k] = sum_j x[j] y[(k-j) mod n] (* -1 on wrap if negacyclic)."""
    n = x.shape[-1]
    nb = x.ndim - _nlead(F) - 1
    idx, neg = _base_tables(n, negacyclic)
    yg = jnp.take(y, jnp.asarray(idx.reshape(-1)), axis=-1)
    yg = yg.reshape(yg.shape[:-1] + (n, n))  # [..., j, k]
    if neg.any():
        negm = jnp.asarray(neg)
        yg = F.select(jnp.broadcast_to(negm, yg.shape[_nlead(F):]),
                      F.neg(yg), yg)
    terms = F.mul(x[..., :, None], yg)  # [..., j, k]
    return _sum_terms(F, terms, axis=-2)


@functools.lru_cache(maxsize=None)
def _rot_tables(r: int, shifts: tuple):
    """Gather index + negate mask applying y^s per row: out[t, l] =
    (-1)^(l < s_t) in[t, (l - s_t) mod r]  (s reduced mod 2r; s >= r
    flips the global sign)."""
    nrow = len(shifts)
    idx = np.zeros((nrow, r), np.int32)
    neg = np.zeros((nrow, r), bool)
    for t, s in enumerate(shifts):
        flip = (s // r) % 2 == 1
        s = s % r
        ll = np.arange(r)
        idx[t] = (ll - s) % r
        neg[t] = (ll < s) ^ flip
    return idx, neg


def _apply_rot(F, a: jax.Array, shifts: tuple) -> jax.Array:
    """a: [..., nrow, r] -> y^{shifts[t]} * a[t] per row."""
    r = a.shape[-1]
    nrow = a.shape[-2]
    assert len(shifts) == nrow
    if all(s % (2 * r) == 0 for s in shifts):
        return a
    idx, neg = _rot_tables(r, tuple(s % (2 * r) for s in shifts))
    # one flattened gather over the (row, position) plane
    base = (np.arange(nrow)[:, None] * r + idx).reshape(-1)
    out = jnp.take(a.reshape(a.shape[:-2] + (nrow * r,)),
                   jnp.asarray(base), axis=-1)
    out = out.reshape(a.shape)
    negm = jnp.asarray(neg)
    return F.select(jnp.broadcast_to(negm, out.shape[_nlead(F):]),
                    F.neg(out), out)


def negacyclic(F, x: jax.Array, y: jax.Array) -> jax.Array:
    """Negacyclic convolution along the last axis (batched elsewhere):
    z[k] = sum_{j<=k} x_j y_{k-j} - sum_{j>k} x_j y_{n+k-j}."""
    n = x.shape[-1]
    assert n & (n - 1) == 0
    if n <= K_SMALL:
        return _base_conv(F, x, y, negacyclic=True)
    m = 1 << ((n.bit_length() - 1) // 2)  # m <= r, m*r == n
    r = n // m

    def lift(a):
        # X[i, j] = a[m*j + i]: [..., n] -> [..., m, r] -> pad to 2m
        A = jnp.moveaxis(a.reshape(a.shape[:-1] + (r, m)), -1, -2)
        pad = [(0, 0)] * (A.ndim - 2) + [(0, m), (0, 0)]
        return jnp.pad(A, pad)

    X, Y = lift(x), lift(y)
    M = 2 * m
    w = r // m  # y^w is a primitive 2m-th root of unity

    # forward DIF FFT over the block axis (output bit-reversed; both
    # operands share the ordering so pointwise products are unaffected)
    def fwd(A):
        h = m
        stride_mult = 1
        while h >= 1:
            Ar = A.reshape(A.shape[:-2] + (M // (2 * h), 2, h, r))
            lo = Ar[..., 0, :, :]
            hi = Ar[..., 1, :, :]
            s_add = F.add(lo, hi)
            s_sub = F.sub(lo, hi)
            shifts = tuple(w * stride_mult * t for t in range(h))
            s_sub = _apply_rot(F, s_sub, shifts)
            A = jnp.stack([s_add, s_sub], axis=-3).reshape(
                A.shape[:-2] + (M, r))
            h //= 2
            stride_mult *= 2
        return A

    Xf, Yf = fwd(X), fwd(Y)
    Z = negacyclic(F, Xf, Yf)  # batched over all M blocks

    # inverse DIT FFT (undoes fwd including ordering), scale by 1/M
    h = 1
    stride_mult = m
    while h <= m:
        Zr = Z.reshape(Z.shape[:-2] + (M // (2 * h), 2, h, r))
        lo = Zr[..., 0, :, :]
        hi = Zr[..., 1, :, :]
        shifts = tuple(-w * stride_mult * t for t in range(h))
        hi = _apply_rot(F, hi, shifts)
        Z = jnp.stack([F.add(lo, hi), F.sub(lo, hi)], axis=-3).reshape(
            Z.shape[:-2] + (M, r))
        h *= 2
        stride_mult //= 2
    inv_m = F.inv_i(F.of_scalar(M)) if hasattr(F, "inv_i") else None
    Z = _mul_host_const(F, Z, inv_m)

    # fold: c_i = C_i + y * C_{m+i}, then unlift
    Zlo = Z[..., :m, :]
    Zhi = Z[..., m:, :]
    wrapped = jnp.concatenate(
        [F.neg(Zhi[..., -1:]), Zhi[..., :-1]], axis=-1)
    C = F.add(Zlo, wrapped)  # [..., m, r]
    return jnp.moveaxis(C, -2, -1).reshape(C.shape[:-2] + (n,))


def _mul_host_const(F, a: jax.Array, c) -> jax.Array:
    lim = np.asarray(F.to_limbs(c))
    nb = a.ndim - _nlead(F)
    return F.mul(a, _insert_axes(jnp.asarray(lim), _nlead(F), nb))


def cyclic(F, x: jax.Array, y: jax.Array) -> jax.Array:
    """Cyclic convolution along the last axis (nussbaumer.h
    cyclic_with_workspace, recursion instead of the iterative loop)."""
    n = x.shape[-1]
    assert n & (n - 1) == 0
    if n <= 4:
        return _base_conv(F, x, y, negacyclic=False)
    h = n // 2
    xs, xd = F.add(x[..., :h], x[..., h:]), F.sub(x[..., :h], x[..., h:])
    ys, yd = F.add(y[..., :h], y[..., h:]), F.sub(y[..., :h], y[..., h:])
    c = cyclic(F, xs, ys)
    g = negacyclic(F, xd, yd)
    half = F.inv_i(F.of_scalar(2))
    lo = _mul_host_const(F, F.add(c, g), half)
    hi = _mul_host_const(F, F.sub(c, g), half)
    return jnp.concatenate([lo, hi], axis=-1)


def linear(F, x: jax.Array, y: jax.Array) -> jax.Array:
    """Linear convolution: [..., n] x [..., n] -> [..., 2n]
    (nussbaumer.h:63-86: cyclic + negacyclic, inverse butterfly)."""
    c = cyclic(F, x, y)
    g = negacyclic(F, x, y)
    half = F.inv_i(F.of_scalar(2))
    lo = _mul_host_const(F, F.add(c, g), half)
    hi = _mul_host_const(F, F.sub(c, g), half)
    return jnp.concatenate([lo, hi], axis=-1)


class NussbaumerConvolution:
    """Drop-in convolver (same contract as FFTConvolution: cyclic over
    pow2 padding >= m; only indices >= n are wrap-free, which is all
    ReedSolomon reads)."""

    def __init__(self, n: int, m: int, F, y: Sequence):
        self.F = F
        self.n = n
        self.m = m
        self.padding = _choose_padding(m)
        y_pad = list(y) + [F.of_scalar(0)] * (self.padding - len(y))
        self._y_np = np.asarray(F.to_limbs(y_pad))

    def convolution(self, x: jax.Array) -> jax.Array:
        F = self.F
        assert x.shape[-1] == self.n
        pad = [(0, 0)] * (x.ndim - 1) + [(0, self.padding - self.n)]
        xp = jnp.pad(x, pad)
        nb = x.ndim - _nlead(F) - 1
        yb = _insert_axes(jnp.asarray(self._y_np), _nlead(F), nb)
        z = cyclic(F, xp, jnp.broadcast_to(yb, xp.shape))
        return z[..., : self.m]


def make_nussbaumer_convolution_factory(F):
    def factory(n, m, y):
        return NussbaumerConvolution(n, m, F, y)

    return factory
