"""Real (base-field) FFT in half-complex storage over Fp2.

Capability twin of reference lib/algebra/rfft.h:47-459: the FFT of a
"real" (base-field) array is conjugate-symmetric, so it fits in n base
elements using the FFTW half-complex layout

    HC[j] = real(F[j]) if 2j <= n else imag(F[n-j]),

halving the storage and work of convolutions over Fp2 lifts (the
reference's motivation, convolution.h:128-191).  The reference builds a
bespoke radix-4 real FFT; here we use the classic half-size reduction —
pack even/odd real elements as one complex array of length n/2, run the
ordinary Fp2 NTT, and split even/odd spectra with an O(n) vectorized
twiddle pass — which reuses the batched NTT kernels and is two
elementwise passes away from optimal.

Requires omega on the unit circle (omega * conj(omega) == 1), the same
precondition as the reference (rfft.h:52-57).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ntt import NTT, _choose_padding, _insert_axes, _pow


class RFFT:
    def __init__(self, F2, omega2, omega_order: int):
        self.F2 = F2
        self.Fb = F2.f  # base field
        self.omega = omega2
        self.omega_order = omega_order
        self.ntt2 = NTT(F2, omega2, omega_order)
        # unit-circle check (rfft.h:52-57)
        conj = (omega2[0], self.Fb.neg_i(omega2[1]))
        assert F2.mul_i(omega2, conj) == F2.of_scalar(1), \
            "root of unity not on the unit circle"
        self._wcache = {}

    # -- helpers --------------------------------------------------------------

    def _conj(self, a: jax.Array) -> jax.Array:
        return jnp.stack([a[0], self.Fb.neg(a[1])], axis=0)

    def _w_tables(self, n: int):
        """omega_n^{-j} and omega_n^{+j} for j in [0, n/2) as Fp2 limbs."""
        if n in self._wcache:
            return self._wcache[n]
        F2 = self.F2
        h = n // 2
        w = _pow(F2, self.omega, self.omega_order // n)
        winv = F2.inv_i(w)
        fw, bw = [], []
        cf = cb = F2.of_scalar(1)
        for _ in range(h):
            fw.append(cf)
            bw.append(cb)
            cf = F2.mul_i(cf, winv)
            cb = F2.mul_i(cb, w)
        tabs = (np.asarray(F2.to_limbs(fw)), np.asarray(F2.to_limbs(bw)))
        self._wcache[n] = tabs
        return tabs

    def _half(self):
        return self.F2.of_scalar(self.Fb.inv_i(self.Fb.of_scalar(2)))

    # -- transforms ------------------------------------------------------------

    def r2hc(self, x: jax.Array) -> jax.Array:
        """Real [L, batch..., n] -> half-complex [L, batch..., n]
        (forward transform, minus sign; rfft.h R2HC)."""
        F2, Fb = self.F2, self.Fb
        n = x.shape[-1]
        h = n // 2
        assert n & (n - 1) == 0 and n >= 2
        nbatch = x.ndim - 2
        z = jnp.stack([x[..., 0::2], x[..., 1::2]], axis=0)
        Z = self.ntt2.fftf(z)  # [2, L, batch..., h]
        idx = jnp.asarray((h - np.arange(h)) % h)
        Zrc = self._conj(jnp.take(Z, idx, axis=-1))
        half = _insert_axes(jnp.asarray(F2.to_limbs(self._half())), 2, nbatch + 1)
        E = F2.mul(F2.add(Z, Zrc), half)
        # O = (Z - conj(Zrev)) / (2i) = (-i/2) * (Z - Zrc)
        inv2 = Fb.inv_i(Fb.of_scalar(2))
        mi_half = (0, Fb.neg_i(inv2))  # -i/2
        mih = _insert_axes(jnp.asarray(F2.to_limbs(mi_half)), 2, nbatch + 1)
        O = F2.mul(F2.sub(Z, Zrc), mih)
        fw_np, _ = self._w_tables(n)
        Wj = _insert_axes(jnp.asarray(fw_np), 2, nbatch)
        Fj = F2.add(E, F2.mul(Wj, O))  # j in [0, h)
        # F[h] = E[0] - O[0] (both real)
        Fh = F2.sub(E[..., :1], O[..., :1])
        re = jnp.concatenate([Fj[0], Fh[0]], axis=-1)  # [L, ..., h+1]
        im_rev = jnp.flip(Fj[1][..., 1:], axis=-1)  # im F[h-1] ... im F[1]
        return jnp.concatenate([re, im_rev], axis=-1)

    def hc2r(self, hc: jax.Array) -> jax.Array:
        """Half-complex -> n * real (backward; hc2r(r2hc(x)) == n*x,
        matching fftb(fftf) == n)."""
        F2, Fb = self.F2, self.Fb
        n = hc.shape[-1]
        h = n // 2
        nbatch = hc.ndim - 2
        re = hc[..., : h + 1]
        zero1 = jnp.zeros_like(hc[..., :1])
        im = jnp.concatenate(
            [zero1, jnp.flip(hc[..., h + 1 :], axis=-1), zero1], axis=-1)
        Fj = jnp.stack([re, im], axis=0)  # [2, L, ..., h+1], j in [0, h]
        Fr = self._conj(jnp.flip(Fj, axis=-1))  # conj(F[h-j]) = F[j+h]
        half = _insert_axes(jnp.asarray(F2.to_limbs(self._half())), 2,
                            nbatch + 1)
        E = F2.mul(F2.add(Fj[..., :h], Fr[..., :h]), half)
        _, bw_np = self._w_tables(n)
        Wj = _insert_axes(jnp.asarray(bw_np), 2, nbatch)
        D = F2.mul(F2.sub(Fj[..., :h], Fr[..., :h]), half)
        O = F2.mul(Wj, D)
        iO = jnp.stack([Fb.neg(O[1]), O[0]], axis=0)  # i * O
        Z = F2.add(E, iO)
        z = self.ntt2.fftb(Z)  # h * z
        out = jnp.stack([z[0], z[1]], axis=-1)  # re=even, im=odd
        out = out.reshape(out.shape[:-2] + (n,))
        two = _insert_axes(jnp.asarray(self.Fb.to_limbs(2)), 1, nbatch)
        return self.Fb.mul(out, two)

    # -- half-complex pointwise product ---------------------------------------

    def hc_mul(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Pointwise product of two half-complex spectra."""
        F2 = self.F2
        n = a.shape[-1]
        h = n // 2
        zero1a = jnp.zeros_like(a[..., :1])
        zero1b = jnp.zeros_like(b[..., :1])

        def to_F(hc, z1):
            re = hc[..., : h + 1]
            im = jnp.concatenate(
                [z1, jnp.flip(hc[..., h + 1 :], axis=-1), z1], axis=-1)
            return jnp.stack([re, im], axis=0)

        Fa, Fb_ = to_F(a, zero1a), to_F(b, zero1b)
        P = F2.mul(Fa, Fb_)
        re = P[0]
        im_rev = jnp.flip(P[1][..., 1:h], axis=-1)
        return jnp.concatenate([re, im_rev], axis=-1)


class RFFTExtConvolution:
    """Half-complex convolver for base-field data via Fp2 (the RFFT
    realization of reference FFTExtConvolution, convolution.h:128-191):
    half the storage and transform work of the full Fp2 lift."""

    def __init__(self, n: int, m: int, Fbase, F2, omega2, omega_order: int,
                 y: Sequence):
        self.Fb = Fbase
        self.rfft = RFFT(F2, omega2, omega_order)
        self.n = n
        self.m = m
        self.padding = _choose_padding(m)
        inv_pad = Fbase.inv_i(Fbase.of_scalar(self.padding))
        y_scaled = [Fbase.mul_i(v, inv_pad) for v in y]
        y_pad = y_scaled + [0] * (self.padding - len(y))
        ya = jnp.asarray(Fbase.to_limbs(y_pad))
        self._hy_np = np.asarray(self.rfft.r2hc(ya))

    def convolution(self, x: jax.Array) -> jax.Array:
        assert x.shape[-1] == self.n
        pad = [(0, 0)] * (x.ndim - 1) + [(0, self.padding - self.n)]
        xp = jnp.pad(x, pad)
        hx = self.rfft.r2hc(xp)
        nbatch = x.ndim - 2
        hy = _insert_axes(jnp.asarray(self._hy_np), 1, nbatch)
        hz = self.rfft.hc_mul(hx, jnp.broadcast_to(hy, hx.shape))
        # hz = FFT(conv)/P (1/P folded into hy); hc2r returns P*(.)
        z = self.rfft.hc2r(hz)
        return z[..., : self.m]


def make_rfft_ext_convolution_factory(Fbase, F2, omega2, omega_order: int):
    def factory(n, m, y):
        return RFFTExtConvolution(n, m, Fbase, F2, omega2, omega_order, y)

    return factory
