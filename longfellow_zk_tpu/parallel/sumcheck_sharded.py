"""Multi-chip sumcheck: the copy (data-parallel) axis sharded over a
device mesh.

The copy dimension nc of the sumcheck circuit (reference
sumcheck/circuit.h:46-47, prover_layers.h:34-36, Thaler ch. 4.6.7) is
the designated shard axis for a TPU pod (SURVEY §2.15): each chip holds
a slice of the copies of EQ and W, computes its partial cubic
copy-round coefficients locally (the evaluations_c math), and one psum
over the lazy byte-column accumulators produces the exact field sums —
the only cross-chip traffic per round is 2L u32 words per coefficient.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def copy_round_coeffs(F, EQ, W, hv, h0, h1):
    """Single-device reference: cubic copy-round coefficients (c0,c2,c3)
    (prover_layers.h:415-496).  EQ: [L, C]; W: [L, nw, C]; hv: [L, T]."""
    wr = jnp.take(W, h0, axis=W.ndim - 2)
    wl = jnp.take(W, h1, axis=W.ndim - 2)
    return _coeffs_from_parts(F, EQ, wr, wl, hv)


def _coeffs_from_parts(F, EQ, wr, wl, hv):
    eq0 = EQ[..., None, 0::2]
    eq1 = EQ[..., None, 1::2]
    wr0, wr1 = wr[..., 0::2], wr[..., 1::2]
    wl0, wl1 = wl[..., 0::2], wl[..., 1::2]
    d0 = F.mul(eq0, wr0)
    d2 = F.mul(F.sub(eq1, eq0), F.sub(wr1, wr0))
    d1 = F.sub(F.sub(F.mul(eq1, wr1), d0), d2)
    c1m = F.sub(wl1, wl0)
    l0 = F.mul(d0, wl0)
    l2 = F.add(F.mul(d1, c1m), F.mul(d2, wl0))
    l3 = F.mul(d2, c1m)
    out = []
    for lk in (l0, l2, l3):
        per_term = F.lazy_sum(lk, axis=lk.ndim - 2)  # over copy pairs
        w = F.mul(per_term, hv)
        out.append(F.lazy_sum(w, axis=w.ndim - 2))  # over terms
    return out


def sharded_copy_round_coeffs(F, mesh: Mesh, EQ, W, hv, h0, h1):
    """Copy axis sharded across `mesh` axis 'r': local partial
    coefficients per chip, combined by ONE psum over the byte-column
    accumulators (the cross-chip analogue of the reference's lazy Accum,
    fp_generic.h:424-458).  Bit-exact vs copy_round_coeffs."""
    axis = mesh.axis_names[0]
    ndev = mesh.shape[axis]
    C = EQ.shape[-1]
    assert C % (2 * ndev) == 0, "shard must hold whole copy pairs"

    def local(EQ_l, W_l, hv_l, h0_l, h1_l):
        wr = jnp.take(W_l, h0_l, axis=W_l.ndim - 2)
        wl = jnp.take(W_l, h1_l, axis=W_l.ndim - 2)
        cs = _coeffs_from_parts(F, EQ_l, wr, wl, hv_l)
        # cross-chip field sum: psum of byte columns, renormalize once
        out = []
        for c in cs:
            cols = jax.lax.psum(F._byte_split(c), axis)
            out.append(F._renormalize(cols))
        return tuple(out)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(None, None, axis), P(None, None),
                  P(None), P(None)),
        out_specs=(P(None), P(None), P(None)))
    c0, c2, c3 = jax.jit(fn)(EQ, W, hv, h0, h1)
    return [c0, c2, c3]
