"""Multi-chip NTT: the four-step decomposition across a device mesh.

The reference FFT's in-place transposes between butterfly stages
(fft.h:137-166) become ONE `all_to_all` over ICI (SURVEY §2.15, §5):

  n = R*S, x[r + R*s]:
    step 1: local S-point NTTs, columns r sharded across chips
    step 2: local twiddle multiply (w^(r*j2), twiddle array sharded in r)
    step 3: all_to_all re-shard from r-split to j2-split, then local
            R-point NTTs; output arrives sharded over j2.

Local transforms use the MXU matmul-NTT; the only inter-chip traffic is
the single transpose (n/D elements per chip), riding ICI.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.fp import PrimeField
from ..transforms.matmul_ntt import MatmulNTT


class ShardedNTT:
    """fftb/fftf over u32[8, n] with n = R*S, sharded on a 1D mesh."""

    def __init__(self, F: PrimeField, omega: int, omega_order: int,
                 mesh: Mesh, axis: str = "rows", radix: int = 128):
        self.F = F
        self.mnt = MatmulNTT(F, omega, omega_order, radix=radix)
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.shape[axis]

    @functools.lru_cache(maxsize=None)
    def _plan(self, n: int) -> Tuple[int, int]:
        """Choose R (transform radix for step 3) divisible by ndev."""
        R = self.mnt.radix
        while (n % R != 0 or R % self.ndev != 0) and R < n:
            R *= 2
        assert n % R == 0 and R % self.ndev == 0, \
            "need power-of-two mesh dividing a radix that divides n"
        return R, n // R

    def _build(self, n: int, inverse: bool):
        F, mnt, D = self.F, self.mnt, self.ndev
        R, S = self._plan(n)
        tw = jnp.asarray(mnt._twiddle_limbs(n, R, inverse))  # [8, R, S]

        def kernel(xl, twl):
            # xl: [8, S, R/D] (columns r local); twl: [8, R/D, S]
            y = mnt._rec(jnp.swapaxes(xl, -1, -2), S, inverse)  # [8, R/D, S]
            z = F.mul(y, twl)
            # re-shard: split j2, concatenate r
            z = jax.lax.all_to_all(z, self.axis, split_axis=2, concat_axis=1,
                                   tiled=True)  # [8, R, S/D]
            a = mnt._rec(jnp.swapaxes(z, -1, -2), R, inverse)  # [8, S/D, R]
            return jnp.swapaxes(a, -1, -2)  # [8, R, S/D]

        from jax import shard_map

        mapped = shard_map(
            kernel, mesh=self.mesh,
            in_specs=(P(None, None, self.axis), P(None, self.axis, None)),
            out_specs=P(None, None, self.axis))

        def run(x):
            x2 = x.reshape(8, S, R)
            out = mapped(x2, tw)  # [8, R, S] sharded over j2
            return out.reshape(8, n)

        return run

    def fftb(self, x: jax.Array) -> jax.Array:
        return self._build(x.shape[-1], False)(x)

    def fftf(self, x: jax.Array) -> jax.Array:
        return self._build(x.shape[-1], True)(x)
