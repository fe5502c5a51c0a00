"""Multilinear array binding, vectorized.

TPU re-design of the reference Dense (lib/arrays/dense.h:36-133): the
bind operation this[i] = (1-r)*in[2i] + r*in[2i+1] along an axis becomes
one fused vector step over the whole array.  Odd lengths follow the
reference's zero-padding semantics (dense.h:77-85): the missing odd
element is treated as zero, which we implement by literal zero-padding —
algebraically identical.

Arrays are planar field tensors: uint32[L, ...] (prime fields / GF2) or
uint32[2, L, ...] (Fp2); the bound axis is specified relative to the
full array shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bind(F, x: jax.Array, r: jax.Array, axis: int = -1) -> jax.Array:
    """Bind variable along `axis`: out[i] = x[2i] + r*(x[2i+1] - x[2i]).

    r: broadcast-ready field element (e.g. F.broadcast_const(val)).
    Length may be odd (zero-padded).
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    if n % 2 == 1:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, 1)
        x = jnp.pad(x, pad)
        n += 1
    # reshape axis -> (n//2, 2)
    new_shape = x.shape[:axis] + (n // 2, 2) + x.shape[axis + 1 :]
    xr = x.reshape(new_shape)
    lo = jnp.take(xr, 0, axis=axis + 1)
    hi = jnp.take(xr, 1, axis=axis + 1)
    return F.add(lo, F.mul(F.sub(hi, lo), r))


def bind_all(F, x: jax.Array, rs, axis: int = -1) -> jax.Array:
    for r in rs:
        x = bind(F, x, r, axis)
    return x
