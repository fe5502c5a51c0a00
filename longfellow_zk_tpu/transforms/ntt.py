"""Multiplicative radix-2 NTT/FFT over prime fields and Fp2, TPU-style.

Semantic twin of the reference FFT (lib/algebra/fft.h:27-202):

    fftb:  T[j] = SUM_k F[k] W^{jk}     (backward, positive exponent)
    fftf:  F[k] = SUM_j T[j] W^{-jk}    (forward = backward with W^-1)
    fftb(fftf(x)) == n * x

The reference is a cache-oblivious recursive scalar FFT; here each of the
log2(n) butterfly stages is one fused vector step over the whole array
(bit-reversal gather + per-stage broadcast twiddle multiply), which is
the natural shape for XLA/TPU: static shapes, no data-dependent control
flow, and the batch/row axes ride the vector lanes.  Twiddle tables are
precomputed host-side as Montgomery limb constants.

Also provides the convolution-based Reed-Solomon "extend" encoder
(reference lib/algebra/convolution.h:55-216, lib/algebra/reed_solomon.h:44-130),
vectorized over a leading row axis — the Ligero tableau encode is a
single batched call.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def bitrev_permutation(n: int) -> np.ndarray:
    """Bit-reversal permutation indices (reference algebra/permutations.h)."""
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _insert_axes(arr: jax.Array, nlead: int, nbatch: int) -> jax.Array:
    """[lead..., m] -> [lead..., 1*nbatch, m] for broadcasting over batch."""
    shape = arr.shape[:nlead] + (1,) * nbatch + arr.shape[nlead:]
    return arr.reshape(shape)


class NTT:
    """Radix-2 NTT for a field with host-int scalars (PrimeField or Fp2).

    ``F`` must provide mul/add/sub on planar device arrays, to_limbs,
    host ops (mul_i, inv_i, of_scalar), and ``nlead`` leading axes
    (1 for PrimeField limbs, 2 for Fp2 (re/im, limbs)).
    """

    def __init__(self, F, omega, omega_order: int):
        self.F = F
        self.omega = omega
        self.omega_order = omega_order
        self.nlead = getattr(
            F, "kNLead", 2 if type(F).__name__ == "Fp2" else 1)

    def _root_of_order(self, n: int, inverse: bool):
        """omega^(order/n), optionally inverted (Twiddle::reroot)."""
        F = self.F
        assert self.omega_order % n == 0
        e = self.omega_order // n
        w = _pow(F, self.omega, e)
        if inverse:
            w = F.inv_i(w)
        return w

    @functools.lru_cache(maxsize=None)
    def _stage_tables(self, n: int, inverse: bool):
        """Per-stage twiddle tables for size n; list of np limb arrays."""
        F = self.F
        if n == 1:
            return []
        w = self._root_of_order(n, inverse)
        tables = []
        m = 2
        while m <= n:
            wm = _pow(F, w, n // m)  # primitive m-th root
            half = m // 2
            cur = F.of_scalar(1)
            tws = []
            for _ in range(half):
                tws.append(cur)
                cur = F.mul_i(cur, wm)
            tables.append(np.asarray(F.to_limbs(tws)))
            m *= 2
        return tables

    def _transform(self, x: jax.Array, inverse: bool) -> jax.Array:
        """Apply the transform along the last axis.

        x: [lead..., batch..., n] planar field array.
        """
        F = self.F
        nlead = self.nlead
        n = x.shape[-1]
        if n == 1:
            return x
        assert n & (n - 1) == 0, "length must be a power of 2"
        nbatch = x.ndim - nlead - 1
        # bit reversal
        rev = jnp.asarray(bitrev_permutation(n))
        x = jnp.take(x, rev, axis=-1)
        tables = self._stage_tables(n, inverse)
        head = x.shape[:-1]
        for s, tw_np in enumerate(tables):
            m = 1 << s  # half-size of butterfly at this stage
            nblocks = n // (2 * m)
            xr = x.reshape(head + (nblocks, 2, m))
            lo = xr[..., 0, :]
            hi = xr[..., 1, :]
            if s == 0:
                t = hi
            else:
                tw = _insert_axes(jnp.asarray(tw_np), nlead, nbatch + 1)
                t = F.mul(hi, tw)
            out_lo = F.add(lo, t)
            out_hi = F.sub(lo, t)
            x = jnp.stack([out_lo, out_hi], axis=-2).reshape(head + (n,))
        return x

    def fftb(self, x: jax.Array) -> jax.Array:
        """Backward FFT: T[j] = sum_k F[k] W^{jk} (fft.h:185)."""
        return self._transform(x, inverse=False)

    def fftf(self, x: jax.Array) -> jax.Array:
        """Forward FFT: uses W^{-1} (fft.h:198-201)."""
        return self._transform(x, inverse=True)


def _pow(F, base, e: int):
    r = F.of_scalar(1)
    b = base
    while e:
        if e & 1:
            r = F.mul_i(r, b)
        b = F.mul_i(b, b)
        e >>= 1
    return r


def _choose_padding(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class FFTConvolution:
    """Cyclic convolution via NTT (reference convolution.h:55-106).

    z[k] = sum_i x[i] y[k-i] (cyclically over the pow2 padding), first m
    entries returned.  y is fixed at construction (its transform is
    precomputed host-side); x is batched over leading axes.
    """

    def __init__(self, n: int, m: int, F, omega, omega_order: int,
                 y: Sequence, ntt_impl=None):
        self.F = F
        self.n = n
        self.m = m
        self.padding = _choose_padding(m)
        self._host_ntt = NTT(F, omega, omega_order)  # host root arithmetic
        self.ntt = ntt_impl if ntt_impl is not None else self._host_ntt
        # host-side forward transform of padded y, scaled by 1/padding
        y_pad = list(y) + [_zero(F)] * (self.padding - len(y))
        yhat = _host_fft(F, y_pad, self._host_ntt._root_of_order(self.padding, True))
        inv_pad = F.inv_i(F.of_scalar(self.padding))
        yhat = [F.mul_i(v, inv_pad) for v in yhat]
        self._yhat_np = np.asarray(F.to_limbs(yhat))
        self.nlead = self.ntt.nlead

    def convolution(self, x: jax.Array) -> jax.Array:
        """x: [lead..., batch..., n] -> z: [lead..., batch..., m]."""
        F = self.F
        pad_amt = self.padding - x.shape[-1]
        assert x.shape[-1] == self.n
        pad_width = [(0, 0)] * (x.ndim - 1) + [(0, pad_amt)]
        xp = jnp.pad(x, pad_width)
        xhat = self.ntt.fftf(xp)
        nbatch = x.ndim - self.nlead - 1
        yhat = _insert_axes(jnp.asarray(self._yhat_np), self.nlead, nbatch)
        zhat = F.mul(xhat, yhat)
        z = self.ntt.fftb(zhat)
        return z[..., : self.m]


def _zero(F):
    return F.of_scalar(0)


def _host_fft(F, a: List, w) -> List:
    """Simple host radix-2 backward FFT with root w (for y preprocessing)."""
    n = len(a)
    if n == 1:
        return list(a)
    even = _host_fft(F, a[0::2], F.mul_i(w, w))
    odd = _host_fft(F, a[1::2], F.mul_i(w, w))
    out = [None] * n
    wk = F.of_scalar(1)
    for k in range(n // 2):
        t = F.mul_i(wk, odd[k])
        out[k] = F.add_i(even[k], t)
        out[k + n // 2] = F.sub_i(even[k], t)
        wk = F.mul_i(wk, w)
    return out


class ReedSolomon:
    """RS "extend" encoder over a prime field (reference reed_solomon.h:44).

    Given evaluations of a degree <n polynomial at 0..n-1 (along the last
    axis), computes evaluations at n..m-1.  Fully batched over leading
    axes: the Ligero tableau encode is one call with rows stacked.
    """

    def __init__(self, n: int, m: int, F, conv_factory):
        self.F = F
        self.n = n
        self.m = m
        d = n - 1  # degree bound
        # inverses[i] = 1/i (i>=1), cf. batch_inverse_arithmetic
        inverses = [_of_int(F, 0)] + [F.inv_i(_of_int(F, i)) for i in range(1, m)]
        # y kernel for the convolution: y[k] = 1/k with y[0] = 0
        self.conv = conv_factory(n, m, inverses)
        # binom_i[i] = (-1)^i C(d, i)
        binom = [F.of_scalar(1)]
        for i in range(1, n):
            binom.append(F.mul_i(binom[-1], F.mul_i(_of_int(F, n - i), inverses[i])))
        for i in range(1, n, 2):
            binom[i] = F.neg_i(binom[i])
        self._binom_np = np.asarray(F.to_limbs(binom))
        # leading_constant_[i] = C(i+d, d) * (-1)^d * i  for i in [0, m-n)
        lead = [F.of_scalar(1)]
        for i in range(1, m - d):
            lead.append(F.mul_i(lead[-1], F.mul_i(_of_int(F, d + i), inverses[i])))
        for k in range(d, m):
            lead[k - d] = F.mul_i(lead[k - d], _of_int(F, k - d))
            if d % 2 == 1:
                lead[k - d] = F.neg_i(lead[k - d])
        self._lead_np = np.asarray(F.to_limbs(lead[: m - n + 1]))
        self.nlead = 2 if type(F).__name__ == "Fp2" else 1

    def interpolate(self, y: jax.Array) -> jax.Array:
        """y: [lead..., batch..., n] -> [lead..., batch..., m]."""
        F = self.F
        nbatch = y.ndim - self.nlead - 1
        binom = _insert_axes(jnp.asarray(self._binom_np), self.nlead, nbatch)
        x = F.mul(y, binom)
        T = self.conv.convolution(x)
        lead = _insert_axes(jnp.asarray(self._lead_np), self.nlead, nbatch)
        # out[i] = lead[i - d] * T[i] for i in [n, m)
        d = self.n - 1
        tail = F.mul(T[..., self.n :], lead[..., self.n - d : self.m - d])
        return jnp.concatenate([y, tail], axis=-1)


def _of_int(F, i: int):
    """of_scalar for values possibly >= p (reduce mod field order)."""
    if getattr(F, "p", None) is not None:
        return F.of_scalar(i % F.p)
    if type(F).__name__ == "Fp2":
        return F.of_scalar(i % F.f.p)
    return F.of_scalar(i)


def _order(F):
    return F.p


def make_fft_convolution_factory(F, omega, omega_order: int, ntt_impl=None):
    def factory(n, m, y):
        return FFTConvolution(n, m, F, omega, omega_order, y,
                              ntt_impl=ntt_impl)

    return factory


class FFTExtConvolution:
    """Convolution of base-field data via the Fp2 extension
    (reference convolution.h:128-191).

    The reference uses a half-complex RFFT to halve memory; on TPU we lift
    into Fp2 directly (im = 0) and take the real part at the end, which
    computes the same cyclic convolution.  Memory is cheap relative to the
    reference's target (phones); revisit if HBM ever binds.
    """

    def __init__(self, n: int, m: int, Fbase, F2, omega2, omega_order: int,
                 y: Sequence):
        self.Fb = Fbase
        self.F2 = F2
        y2 = [(v, 0) for v in y]
        self.inner = FFTConvolution(n, m, F2, omega2, omega_order, y2)

    def convolution(self, x: jax.Array) -> jax.Array:
        """x: [L, batch..., n] base field -> [L, batch..., m] base field."""
        x2 = jnp.stack([x, jnp.zeros_like(x)], axis=0)
        z2 = self.inner.convolution(x2)
        return z2[0]


def make_fft_ext_convolution_factory(Fbase, F2, omega2, omega_order: int):
    def factory(n, m, y):
        return FFTExtConvolution(n, m, Fbase, F2, omega2, omega_order, y)

    return factory
