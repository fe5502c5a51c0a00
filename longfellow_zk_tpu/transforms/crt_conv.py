"""CRT convolution: NTT-based convolution for prime fields *without*
large 2-adic roots of unity (secp256k1, P-384, P-521 bases/scalars).

Semantic twin of the reference CRTConvolution (lib/algebra/
crt_convolution.h:32-103 + crt.h): residues over a basis of NTT-friendly
primes, pointwise products per lane, Garner reconstruction.  All three
phases run on device over the planar MultiPrimeField layout
(uint32[2, VS, batch..., n]); see fields/multiprime.py for the
basis/layout design.

  to_crt:   x = sum_i limb_i 2^16i  ->  per-lane sum_i mont(limb_i, C_i)
            with C_i = 2^16i * R^2 mod p_b   (one Montgomery mul per limb)
  from_crt: device Garner (crt.h:171-207) keeping residues natural —
            mont(natural, montgomery-constant) stays natural — then a
            target-field dot with G_j = (prod_{k<j} p_k) * R_F^2 mod p_F.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.multiprime import MultiPrimeField, basis_size_for
from .ntt import FFTConvolution, _choose_padding


class CRTContext:
    """Per-(target field, basis) device constants, shared by convolvers."""

    def __init__(self, F, vs: int = None):
        self.F = F
        if vs is None:
            vs = basis_size_for(F.bits)
        self.mp = MultiPrimeField(vs)
        mp = self.mp
        # to_crt constants: C_i = 2^16i * R^2 mod p_b, Montgomery limbs
        cis = []
        for i in range(F.L):
            ci = np.array(
                [((1 << (16 * i)) * (1 << 64)) % p for p in mp.primes],
                dtype=object)
            # to_limbs expects natural residues; C_i is used as the
            # Montgomery *operand* so store (value * R^-1): mont(a, c)
            # = a*c*R^-1, want limb*2^16i*R => c = 2^16i*R^2 mod p.
            lim = np.zeros((2, mp.vs), np.uint32)
            for b in range(mp.vs):
                v = int(ci[b])
                lim[0, b] = v & 0xFFFF
                lim[1, b] = (v >> 16) & 0xFFFF
            cis.append(jnp.asarray(lim))
        self._cis = cis
        # natural-one operand (mont(z, 1) = z natural)
        onel = np.zeros((2, mp.vs), np.uint32)
        onel[0, :] = 1
        self._one_nat = jnp.asarray(onel)
        # Garner lane constants: C_j[i] = (p_{j-1})^{-1} mod p_i in
        # Montgomery form for i >= j, 0 otherwise (unused lanes masked)
        self._garner_cj = []
        self._lane_ge = []
        for j in range(1, mp.vs):
            lim = np.zeros((2, mp.vs), np.uint32)
            for i in range(j, mp.vs):
                pi = mp.primes[i]
                v = (pow(mp.primes[j - 1], -1, pi) << 32) % pi
                lim[0, i] = v & 0xFFFF
                lim[1, i] = (v >> 16) & 0xFFFF
            self._garner_cj.append(jnp.asarray(lim))
            self._lane_ge.append(
                jnp.asarray(np.arange(mp.vs) >= j))
        # target-field dot constants: G_j = (prod_{k<j} p_k) * R_F^2 mod p
        self._gs = []
        g = 1
        for j in range(mp.vs):
            v = (g * F.R * F.R) % F.p
            lim = np.zeros(F.L, np.uint32)
            for i in range(F.L):
                lim[i] = (v >> (16 * i)) & 0xFFFF
            self._gs.append(jnp.asarray(lim))
            g = (g * mp.primes[j]) % F.p

    # -- device conversions --------------------------------------------------

    def to_crt(self, x: jax.Array) -> jax.Array:
        """F Montgomery limbs [L, batch...] -> MPF Montgomery
        [2, VS, batch...]."""
        F, mp = self.F, self.mp
        xn = F.from_mont_device(x)  # natural 16-bit limbs
        nb = x.ndim - 1
        acc = None
        zero = jnp.zeros_like(xn[0])
        for i in range(F.L):
            a = jnp.stack([xn[i], zero], axis=0)[:, None]  # [2,1,batch...]
            ci = self._cis[i].reshape((2, mp.vs) + (1,) * nb)
            t = mp.mul(jnp.broadcast_to(a, (2, mp.vs) + x.shape[1:]), ci)
            acc = t if acc is None else mp.add(acc, t)
        return acc

    def from_crt(self, z: jax.Array) -> jax.Array:
        """MPF Montgomery [2, VS, batch...] -> F Montgomery [L, batch...]."""
        F, mp = self.F, self.mp
        nb = z.ndim - 2
        one = self._one_nat.reshape((2, mp.vs) + (1,) * nb)
        v = mp.mul(z, one)  # natural residues
        for j in range(1, mp.vs):
            vb = jnp.broadcast_to(v[:, j - 1 : j], v.shape)
            # canonicalize v_{j-1} per lane (value < 2^32 < 2 p_i)
            vb = jnp.stack(
                mp._cond_sub_p([vb[0], vb[1]], jnp.zeros_like(vb[0]), nb),
                axis=0)
            d = mp.sub(v, vb)
            cj = self._garner_cj[j - 1].reshape((2, mp.vs) + (1,) * nb)
            new = mp.mul(d, cj)
            keep = self._lane_ge[j - 1].reshape((mp.vs,) + (1,) * nb)
            v = jnp.where(keep[None], new, v)
        # x = sum_j mont_F(v_j, G_j)
        acc = None
        zero = jnp.zeros(z.shape[2:], jnp.uint32)
        zl = [zero] * (F.L - 2)
        for j in range(mp.vs):
            a = jnp.stack([v[0, j], v[1, j]] + zl, axis=0)
            gj = self._gs[j].reshape((F.L,) + (1,) * nb)
            t = F.mul(a, jnp.broadcast_to(gj, a.shape))
            acc = t if acc is None else F.add(acc, t)
        return acc


class CRTConvolution:
    """Drop-in convolver for ReedSolomon over root-poor fields
    (crt_convolution.h:32-103)."""

    def __init__(self, n: int, m: int, ctx: CRTContext, y: Sequence):
        self.ctx = ctx
        self.F = ctx.F
        self.n = n
        self.m = m
        mp = ctx.mp
        assert _choose_padding(m) <= mp.omega_order
        y_crt = [mp.to_crt(int(v)) for v in y]
        self.inner = FFTConvolution(n, m, mp, mp.omegas, mp.omega_order,
                                    y_crt)

    def convolution(self, x: jax.Array) -> jax.Array:
        """x: [L, batch..., n] target field -> [L, batch..., m]."""
        xc = self.ctx.to_crt(x)
        zc = self.inner.convolution(xc)
        return self.ctx.from_crt(zc)


def make_crt_convolution_factory(F, vs: int = None):
    ctx = CRTContext(F, vs=vs)

    def factory(n, m, y):
        return CRTConvolution(n, m, ctx, y)

    return factory
