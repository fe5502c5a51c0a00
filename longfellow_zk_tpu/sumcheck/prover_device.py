"""Single-launch device sumcheck prover.

TPU-native successor of sumcheck/prover.py (semantic twin of reference
lib/sumcheck/prover_layers.h:37-497): each circuit layer proves as ONE
jitted device program — all copy rounds, wire rounds, and the Fiat-Shamir
oracle itself (random_oracle/device_fs) run inside `lax.scan`s with fixed
shapes, so a full prove is nl launches and a single device->host fetch.
The previous design paid one host sync per sumcheck round (~27 ms through
a remote-TPU relay; 210 rounds for a 1-block SHA circuit) — this one pays
one fetch per proof.

Fixed-shape trick: binding halves the live length of W/EQ each round, but
arrays stay at their padded power-of-two size with the dead tail kept at
zero — algebraically identical to the reference's zero-padding semantics
(arrays/dense.h:77-85), and XLA-friendly (no dynamic shapes).

Round-polynomial extraction avoids the reference's QW bin aggregation
(prover_layers.h:357-402) entirely: with z_t = hv_t * W_o[ho_t],

  a0 = sum_{t: h_t even} z_t * W_h[h_t]
  a2 = sum_t  (-1)^{h_t+1} * z_t * (W_h[h_t|1] - W_h[h_t & ~1])

which is three gathers + three multiplies + two lazy byte-column
reductions over the term axis — no scatter/segment-sum in the round loop
(TPU scatters serialize; gathers vectorize).

Proof bytes are identical to the host prover's (tested)."""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..random_oracle import device_fs as dfs
from .circuit import Circuit, LayerProof, Proof, ProofAux

_I32 = jnp.int32


def _pts_dev(F, n: int):
    """Standard evaluation points 0..n-1 (field-specific: powers of the
    subfield generator for GF2) as device constants [n, L]."""
    return [jnp.asarray(F.to_limbs(F.poly_evaluation_point(k)))
            for k in range(n)]


def _newton_denoms_dev(F, n: int):
    return {(k, i): jnp.asarray(F.to_limbs(F.newton_denominator(k, i)))
            for k in range(1, n) for i in range(1, k + 1)}


class _FieldDev:
    """Per-field device constants used inside the layer programs."""

    def __init__(self, F):
        self.F = F
        self.one = jnp.asarray(F.to_limbs(1))
        self.pts3 = _pts_dev(F, 3)
        self.pts4 = _pts_dev(F, 4)
        self.nd3 = _newton_denoms_dev(F, 3)
        self.nd4 = _newton_denoms_dev(F, 4)

    def evals_of_coefs(self, coefs: List[jax.Array]) -> List[jax.Array]:
        """Monomial coefficients -> evaluations at the standard points
        (device twin of sumcheck/poly.py:evals_of_coefs)."""
        F = self.F
        n = len(coefs)
        pts = self.pts3 if n == 3 else self.pts4
        out = []
        for k in range(n):
            pk = F.poly_evaluation_point(k)
            if pk == 0:  # standard point 0 (all fields)
                out.append(coefs[0])
                continue
            if pk == 1:  # standard point 1 (all fields)
                e = coefs[0]
                for c in coefs[1:]:
                    e = F.add(e, c)
                out.append(e)
                continue
            e = coefs[-1]
            for i in range(n - 2, -1, -1):
                e = F.add(F.mul(e, pts[k]), coefs[i])
            out.append(e)
        return out

    def eval_lagrange(self, evals: List[jax.Array], x: jax.Array) -> jax.Array:
        """Newton interpolation at x (device twin of poly.eval_lagrange)."""
        F = self.F
        n = len(evals)
        pts = self.pts3 if n == 3 else self.pts4
        nd = self.nd3 if n == 3 else self.nd4
        t = list(evals)
        for i in range(1, n):
            for k in range(n - 1, i - 1, -1):
                t[k] = F.mul(F.sub(t[k], t[k - 1]), nd[(k, i)])
        e = t[n - 1]
        for i in range(n - 2, -1, -1):
            e = F.add(F.mul(e, F.sub(x, pts[i])), t[i])
        return e


def _eq_dev(F, logn: int, n: int, q: jax.Array) -> jax.Array:
    """EQ array [L.., n] from device challenges q [L, >=logn]
    (device-challenge version of eqs.eq_array_device)."""
    eq = jnp.asarray(F.to_limbs(1))[..., None]  # [L.., 1]
    sizes = [n]
    for _ in range(logn):
        sizes.append((sizes[-1] + 1) // 2)
    for l in range(logn - 1, -1, -1):
        ql = q[..., l : l + 1]
        hi = F.mul(eq, ql)
        lo = F.sub(eq, hi)
        st = jnp.stack([lo, hi], axis=-1)
        eq = st.reshape(st.shape[:-2] + (st.shape[-2] * 2,))
        eq = eq[..., : sizes[l]]
    return eq


def _raw_eq2_dev(F, logn: int, n: int, g0, g1, alpha) -> jax.Array:
    e0 = _eq_dev(F, logn, n, g0)
    e1 = _eq_dev(F, logn, n, g1)
    return F.add(e0, F.mul(e1, alpha[..., None]))


def _pad_pow2(x: jax.Array, n: int, axis: int) -> jax.Array:
    axis = axis % x.ndim
    if x.shape[axis] == n:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad)


def _bind_fixed(F, x: jax.Array, r: jax.Array, axis: int) -> jax.Array:
    """Fixed-shape bind along `axis`: fold pairs, zero-fill the tail."""
    axis = axis % x.ndim
    n = x.shape[axis]
    shape = x.shape[:axis] + (n // 2, 2) + x.shape[axis + 1 :]
    xr = x.reshape(shape)
    lo = jnp.take(xr, 0, axis=axis + 1)
    hi = jnp.take(xr, 1, axis=axis + 1)
    rb = r.reshape(r.shape + (1,) * (lo.ndim - r.ndim))
    bound = F.add(lo, F.mul(F.sub(hi, lo), rb))
    return _pad_pow2(bound, n, axis)


def _batch_axis(F, arr, axis: int) -> int:
    nlead = 2 if type(F).__name__ == "Fp2" else 1
    return (axis % arr.ndim) - nlead


def _contig_fold(F, x, starts, ends):
    """Fold contiguous term-axis segments [starts[i], ends[i]) of x into
    one field element each (x: [lead.., T] -> [lead.., U]).

    This is the term-merge primitive: prefix-scan + two U-sized gathers,
    no scatters.  Exact: GF2 adds are XOR; odd-characteristic sums use
    byte-column prefix sums whose wraparound differences are exact
    because every segment's byte-column sum is < 2^32."""
    ax = x.ndim - 1
    bshape = (1,) * ax + (-1,)
    if F.kCharacteristicTwo:
        # XOR prefix via bitplane cumsum: jnp.cumsum lowers to one
        # well-optimized op, while associative_scan's strided-slice tree
        # at millions of elements takes the remote compiler tens of
        # minutes.  Parity of wrapped u32 sums is exact.
        planes = F._to_bitplanes(x)  # [128, ..., U]
        px = jnp.cumsum(planes, axis=-1, dtype=jnp.uint32)
        pe = jnp.take(px, jnp.maximum(ends - 1, 0), axis=-1)
        ps = jnp.take(px, jnp.maximum(starts - 1, 0), axis=-1)
        ps = jnp.where((starts > 0).reshape((1,) * (px.ndim - 1) + (-1,)),
                       ps, jnp.zeros_like(ps))
        return F._from_bitplanes((pe - ps) & jnp.uint32(1))
    if type(F).__name__ == "Fp2":
        return jnp.stack([_contig_fold(F.f, x[0], starts, ends),
                          _contig_fold(F.f, x[1], starts, ends)])
    b = F._byte_split(x)  # [2L, ..., T]
    px = jnp.cumsum(b, axis=-1, dtype=jnp.uint32)
    pe = jnp.take(px, jnp.maximum(ends - 1, 0), axis=-1)
    ps = jnp.take(px, jnp.maximum(starts - 1, 0), axis=-1)
    ps = jnp.where((starts > 0).reshape((1,) * (b.ndim - 1) + (-1,)), ps,
                   jnp.zeros_like(ps))
    return F._renormalize(pe - ps)


def _wire_merge_plan(h0: np.ndarray, h1: np.ndarray, logw: int):
    """Host-side static schedule for wire-round term merging.

    Terms with equal (h0, h1) behave identically for the rest of the
    layer (their hv updates and a0/a2 contributions depend only on the
    index bits), so they can be summed into one.  As rounds shift the
    indices right, more pairs collide — e.g. the 3.58M-term mdoc SHA
    tree layer has only 439k unique pairs up front and 49k after four
    rounds.  Sorting once by the MSB-first Morton interleave of
    (h0, h1) makes every merge a CONTIGUOUS segment fold.

    Returns (perm, stages): perm int32[T]; stages = list of
    (nrounds, starts, ends, h0_rep, h1_rep) with nrounds summing to
    logw; stage s folds stage (s-1)'s arrays."""
    T = len(h0)
    key = np.zeros(T, np.int64)
    for b in range(logw):
        key |= ((h0.astype(np.int64) >> b) & 1) << (2 * b + 1)
        key |= ((h1.astype(np.int64) >> b) & 1) << (2 * b)
    perm = np.argsort(key, kind="stable").astype(np.int32)
    skey = key[perm]
    sh0, sh1 = h0[perm].astype(np.int32), h1[perm].astype(np.int32)

    # unique counts per shift
    uniq = [len(np.unique(skey >> np.int64(2 * k)))
            for k in range(logw + 1)]

    # Stage policy: every extra stage is another scan body in the trace
    # (~minutes of remote-compile time per layer), so cap at TWO — the
    # initial dedup captures most of the win; one re-merge is added only
    # when the pair count drops hard AND stays big enough to matter.
    shifts = [0]
    k2 = next((k for k in range(1, logw - 1)
               if uniq[k] * 6 <= uniq[0]), None)
    if k2 is not None and uniq[0] >= 262_144:
        shifts.append(k2)

    stages = []
    prev_key = skey
    prev_h0, prev_h1 = sh0, sh1
    prev_n = T
    for si, k in enumerate(shifts):
        rel = k - (shifts[si - 1] if si else 0)
        gk = prev_key >> np.int64(2 * rel)
        _, starts = np.unique(gk, return_index=True)
        starts = np.sort(starts).astype(np.int32)
        ends = np.append(starts[1:], prev_n).astype(np.int32)
        h0_rep = (prev_h0[starts] >> rel).astype(np.int32)
        h1_rep = (prev_h1[starts] >> rel).astype(np.int32)
        nrounds = (shifts[si + 1] if si + 1 < len(shifts) else logw) - k
        stages.append((nrounds, starts, ends, h0_rep, h1_rep))
        prev_key, prev_h0, prev_h1 = gk[starts], h0_rep, h1_rep
        prev_n = len(starts)
    assert sum(s[0] for s in stages) == logw
    return perm, stages


def _write_tagged_elts(F, fs: dict, elts: List[jax.Array]) -> dict:
    """Absorb k individually-tagged field elements with ONE batched
    serialization (a single from-Montgomery multiply) and one absorb."""
    xs = jnp.stack(elts, axis=-1)  # [L, k]
    body = dfs.dev_elt_bytes(F, xs)  # [k, kBytes]
    k = len(elts)
    tags = jnp.full((k, 1), dfs.TAG_FIELD_ELEM, jnp.uint8)
    data = jnp.concatenate([tags, body], axis=1).reshape(-1)
    return dfs.fs_absorb(fs, data)


_PACK_JIT = {}


def _pack_fn(leaves):
    return jnp.concatenate(
        [jnp.reshape(x.astype(jnp.uint32), (-1,)) for x in leaves])


def _out_template(F, metas, with_eval: bool = False):
    """Host template (shapes/dtypes) matching _prove_all_fn's packed
    output tree — deterministic from the circuit geometry."""
    (logc, _nc), layer_meta = metas
    outs = []
    for (_logv, logw, *_rest) in layer_meta:
        outs.append(dict(
            wc=((F.L, 2), np.uint32),
            bq=((F.L,), np.uint32),
            ok=((), np.bool_),
            cp=((logc, F.L, 4), np.uint32),
            q=((logc, F.L), np.uint32),
            hp=((logw, F.L, 2, 3), np.uint32),
            g=((logw, F.L, 2), np.uint32),
        ))
    tree = dict(fs=dict(h=((8,), np.uint32), buf=((64,), np.uint8),
                        cnt=((), np.uint32)),
                outs=outs)
    if with_eval:
        tree["evalok"] = ((len(layer_meta) + 1,), np.bool_)
    return tree


def _unpack_list(packed: np.ndarray, template):
    """Inverse of _pack_fn for a bare list-of-dicts template of
    (shape, dtype) leaves (the per-chunk packed output)."""
    leaves, treedef = jax.tree_util.tree_flatten(
        template, is_leaf=lambda x: isinstance(x, tuple)
        and len(x) == 2 and isinstance(x[0], tuple))
    rebuilt = []
    off = 0
    for shape, dtype in leaves:
        n = int(np.prod(shape)) if shape else 1
        rebuilt.append(packed[off : off + n].reshape(shape).astype(dtype))
        off += n
    assert off == packed.size, (off, packed.size)
    return jax.tree_util.tree_unflatten(treedef, rebuilt)


def _unpack(packed: np.ndarray, template):
    """Inverse of _pack_fn against a (shape, dtype) template tree."""
    leaves, treedef = jax.tree_util.tree_flatten(
        template, is_leaf=lambda x: isinstance(x, tuple)
        and len(x) == 2 and isinstance(x[0], tuple))
    rebuilt = []
    off = 0
    for shape, dtype in leaves:
        n = int(np.prod(shape)) if shape else 1
        rebuilt.append(packed[off : off + n].reshape(shape).astype(dtype))
        off += n
    assert off == packed.size, (off, packed.size)
    tree = jax.tree_util.tree_unflatten(treedef, rebuilt)
    return tree["fs"], tree["outs"], tree.get("evalok")


def _fetch_packed(fs: dict, outs: List[dict]):
    """Fetch the per-layer outputs + transcript state in ONE device->host
    transfer: everything is cast to uint32 and concatenated INSIDE one
    jitted program, then pulled as a single buffer.  Both per-leaf
    fetches and per-leaf eager cast ops pay ~30 ms each through the
    remote-TPU relay, so the entire pack must be a single launch."""
    leaves, treedef = jax.tree_util.tree_flatten(dict(fs=fs, outs=outs))
    key = tuple((x.shape, str(x.dtype)) for x in leaves)
    if key not in _PACK_JIT:
        _PACK_JIT[key] = jax.jit(_pack_fn)
    packed = np.asarray(_PACK_JIT[key](leaves))
    rebuilt = []
    off = 0
    for x in leaves:
        n = int(np.prod(x.shape)) if x.ndim else 1
        chunk = packed[off : off + n].reshape(x.shape)
        rebuilt.append(chunk.astype(np.asarray(jnp.zeros((), x.dtype)).dtype))
        off += n
    tree = jax.tree_util.tree_unflatten(treedef, rebuilt)
    return tree["fs"], tree["outs"]


class DeviceSumcheckProver:
    """Drop-in replacement for SumcheckProver with device-resident rounds."""

    # traces are expensive and provers are constructed per proof; the
    # programs are pure functions of (field, shapes), so share them
    # process-wide.
    _global_jit = {}

    def __init__(self, F):
        self.F = F
        self.fd = _FieldDev(F)
        self._layer_jit = DeviceSumcheckProver._global_jit.setdefault(
            (id(F), "layer"), {})
        self._eval_jit = DeviceSumcheckProver._global_jit.setdefault(
            (id(F), "eval"), {})

    @property
    def _begin_jit(self):
        return DeviceSumcheckProver._global_jit.get((id(self.F), "begin"))

    @_begin_jit.setter
    def _begin_jit(self, fn):
        DeviceSumcheckProver._global_jit[(id(self.F), "begin")] = fn

    # ------------------------------------------------------------------
    # circuit evaluation (same math as SumcheckProver.eval_quad, jitted)
    # ------------------------------------------------------------------

    def _eval_layer(self, quad_dev, W, nv: int):
        F = self.F
        wl = jnp.take(W, quad_dev["h1"], axis=W.ndim - 2)
        wr = jnp.take(W, quad_dev["h0"], axis=W.ndim - 2)
        prod = F.mul(wl, wr)
        bm = quad_dev["bmask"]  # bool [T]
        ok = jnp.all(jnp.where(bm[:, None], F.is_zero(prod), True))
        terms = F.mul(prod, quad_dev["v"][..., None])
        keep = ~bm[:, None]
        terms = F.select(jnp.broadcast_to(keep, terms.shape[1:]), terms,
                         jnp.zeros_like(terms))
        if F.kCharacteristicTwo:
            # segment XOR via bitplane-cumsum prefix + boundary gathers
            # (terms are g-sorted in _quad_dev); avoids scatters, the
            # 128-bitplane segment_sum, AND associative_scan, whose
            # strided-slice tree is pathologically slow to compile at
            # mdoc scale (7.7M terms).  Wrapped-u32 parity is exact.
            tax = terms.ndim - 2
            planes = F._to_bitplanes(terms)  # [128, T, C...]
            ptax = tax  # bitplanes replace the limb axis in place
            px = jnp.cumsum(planes, axis=ptax, dtype=jnp.uint32)
            starts = quad_dev["seg_start"]  # int32 [nv]
            ends = quad_dev["seg_end"]
            pe = jnp.take(px, jnp.maximum(ends - 1, 0), axis=ptax)
            ps = jnp.take(px, jnp.maximum(starts - 1, 0), axis=ptax)
            nb = planes.ndim - 1 - ptax
            em = (ends > 0).reshape((-1,) + (1,) * nb)
            sm = (starts > 0).reshape((-1,) + (1,) * nb)
            pe = jnp.where(em, pe, 0)
            ps = jnp.where(sm, ps, 0)
            V = F._from_bitplanes((pe - ps) & jnp.uint32(1))
        else:
            V = F.lazy_segment_sum(terms, quad_dev["g"], nv)
        return V, ok

    def eval_circuit(self, circ: Circuit, W0):
        """(inputs per layer, finalV) or (None, None) on assert failure.
        One jitted launch per layer; ok flags checked in one fetch."""
        nl = circ.nl
        inputs = [None] * nl
        inputs[nl - 1] = W0
        W = W0
        oks = []
        finalV = None
        for l in range(nl - 1, -1, -1):
            nv = circ.layers[l - 1].nw if l > 0 else circ.nv
            qd = self._quad_dev_eval(circ.layers[l].quad, nv)
            key = ("eval", qd["h0"].shape[0], W.shape, nv)
            if key not in self._eval_jit:
                self._eval_jit[key] = jax.jit(self._eval_layer,
                                              static_argnums=(2,))
            V, ok = self._eval_jit[key](qd, W, nv)
            oks.append(ok)
            if l > 0:
                inputs[l - 1] = V
            else:
                finalV = V
            W = V
        key = ("evalok", nl)
        if key not in self._eval_jit:
            self._eval_jit[key] = jax.jit(
                lambda xs: jnp.all(jnp.stack(xs)))
        if not bool(np.asarray(self._eval_jit[key](oks))):
            return None, None
        return inputs, finalV

    # ------------------------------------------------------------------

    def _quad_dev(self, quad, nv: int = None):
        if getattr(quad, "_dev_cache", None) is None:
            F = self.F
            g = np.asarray(quad.g, dtype=np.int32)
            h0 = np.asarray(quad.h0, dtype=np.int32)
            h1 = np.asarray(quad.h1, dtype=np.int32)
            bmask = np.asarray(quad.beta_mask())
            if quad.kidx is not None:
                tbl = [1 if x == 0 else x for x in quad.ktable]
                limbs = jnp.asarray(F.to_limbs(tbl))
                kidx = quad.kidx.astype(np.int32)
            else:
                vals = [1 if x == 0 else x for x in quad.v]
                limbs = jnp.asarray(F.to_limbs(vals))
                kidx = None
            if not np.all(g[:-1] <= g[1:]):
                order = np.argsort(g, kind="stable")
                g, h0, h1, bmask = g[order], h0[order], h1[order], bmask[order]
                if kidx is not None:
                    kidx = kidx[order]
                else:
                    limbs = jnp.take(limbs, jnp.asarray(order),
                                     axis=limbs.ndim - 1)
            v = (jnp.take(limbs, jnp.asarray(kidx), axis=limbs.ndim - 1)
                 if kidx is not None else limbs)
            quad._dev_cache = dict(
                v=v,
                bmask=jnp.asarray(bmask),
                g=jnp.asarray(g),
                h0=jnp.asarray(h0),
                h1=jnp.asarray(h1),
            )
            quad._seg_np = g  # host copy for boundary computation
            quad._h_np = (h0, h1)
        return quad._dev_cache

    # terms below this count aren't worth the merge prologue
    K_MERGE_MIN_TERMS = 4096

    def _wm_for(self, quad, logw: int):
        """(static plan, device arrays) for wire-round term merging —
        cached per quad (the schedule is a pure function of the quad's
        index structure; see _wire_merge_plan)."""
        wm = getattr(quad, "_wm_cache", None)
        if wm is None or wm[0] != logw:
            self._quad_dev(quad)  # ensure _h_np
            h0, h1 = quad._h_np
            if len(h0) < self.K_MERGE_MIN_TERMS:
                quad._wm_cache = (logw, None, None)
            else:
                perm, stages = _wire_merge_plan(h0, h1, logw)
                plan = tuple((s[0], len(s[1])) for s in stages)
                arrs = dict(
                    wm_perm=jnp.asarray(perm),
                    wms=[dict(s=jnp.asarray(st[1]), e=jnp.asarray(st[2]),
                              h0=jnp.asarray(st[3]),
                              h1=jnp.asarray(st[4]))
                         for st in stages])
                quad._wm_cache = (logw, plan, arrs)
        _lw, plan, arrs = quad._wm_cache
        return plan, arrs

    def _quad_dev_eval(self, quad, nv: int):
        """_quad_dev plus per-nv segment boundaries (char-2 eval path)."""
        qd = dict(self._quad_dev(quad))
        if self.F.kCharacteristicTwo:
            g = quad._seg_np
            qd["seg_start"] = jnp.asarray(
                np.searchsorted(g, np.arange(nv), side="left")
                .astype(np.int32))
            qd["seg_end"] = jnp.asarray(
                np.searchsorted(g, np.arange(nv), side="right")
                .astype(np.int32))
        return qd

    # ------------------------------------------------------------------
    # layer program
    # ------------------------------------------------------------------

    def _copy_scan(self, fs, EQ, W, hv, h_dev, claim, cp_pad, logc: int):
        """logc cubic copy rounds (prover_layers.h:415-496) as one scan.
        EQ: [L.., C], W: [L.., nw, C], hv: [L.., T]."""
        F, fd = self.F, self.fd
        wr = jnp.take(W, h_dev[0], axis=W.ndim - 2)  # [L.., T, C]
        wl = jnp.take(W, h_dev[1], axis=W.ndim - 2)

        def body(carry, pad_r):
            fs, EQ, W, wr, wl, claim = carry
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
            cs = []
            for lk in (l0, l2, l3):
                pt = F.lazy_sum(lk, axis=_batch_axis(F, lk, -1))
                w = F.mul(pt, hv)
                cs.append(F.lazy_sum(w, axis=_batch_axis(F, w, -1)))
            c0, c2, c3 = cs
            two_c0 = F.add(c0, c0)
            c1 = F.sub(F.sub(F.sub(claim, two_c0), c2), c3)
            raw = fd.evals_of_coefs([c0, c1, c2, c3])
            # write (raw - pad) at indices 0,2,3; one fused absorb
            fs = _write_tagged_elts(
                F, fs, [F.sub(raw[k], pad_r[..., k]) for k in (0, 2, 3)])
            r, _ = dfs.dev_sample_elt(F, dfs.fs_squeeze(fs))
            claim = fd.eval_lagrange(raw, r)
            EQ = _bind_fixed(F, EQ, r, axis=-1)
            W2 = _bind_fixed(F, W, r, axis=-1)
            wr2 = _bind_fixed(F, wr, r, axis=-1)
            wl2 = _bind_fixed(F, wl, r, axis=-1)
            return ((fs, EQ, W2, wr2, wl2, claim),
                    (jnp.stack(raw, axis=-1), r))

        (fs, EQ, W, wr, wl, claim), (cp_raw, q_ch) = jax.lax.scan(
            body, (fs, EQ, W, wr, wl, claim), cp_pad)
        return fs, EQ, W, claim, cp_raw, q_ch

    def _wire_scan(self, fs, W0, W1, hv, h0, h1, eq0, claim, hp_pad,
                   logw: int):
        """logw wire-round pairs (both hands) as one scan.
        W0/W1: [L, N] zero-padded; hv: [L, T]; h0/h1: int32 [T]."""
        F, fd = self.F, self.fd
        zeroT = jnp.zeros_like(hv)

        def one_hand(fs, Wh, Wo, h, ho, hv, claim, pad_r):
            z = F.mul(hv, jnp.take(Wo, ho, axis=Wo.ndim - 1))
            hi_idx = h | 1
            lo_idx = h & ~np.int32(1)
            Whi = jnp.take(Wh, hi_idx, axis=Wh.ndim - 1)
            Wlo = jnp.take(Wh, lo_idx, axis=Wh.ndim - 1)
            odd = (h & 1) == 1
            Wat = F.select(odd, Whi, Wlo)
            t0 = F.mul(z, Wat)
            a0 = F.lazy_sum(F.select(odd, zeroT, t0),
                            axis=_batch_axis(F, t0, -1))
            zd = F.mul(z, F.sub(Whi, Wlo))
            zds = F.select(odd, zd, F.neg(zd))
            a2 = F.lazy_sum(zds, axis=_batch_axis(F, zds, -1))
            c0 = F.mul(eq0, a0)
            c2 = F.mul(eq0, a2)
            c1 = F.sub(F.sub(F.sub(claim, c0), c0), c2)
            raw = fd.evals_of_coefs([c0, c1, c2])
            fs = _write_tagged_elts(
                F, fs, [F.sub(raw[k], pad_r[..., k]) for k in (0, 2)])
            r, _ = dfs.dev_sample_elt(F, dfs.fs_squeeze(fs))
            claim = fd.eval_lagrange(raw, r)
            Wh = _bind_fixed(F, Wh, r, axis=-1)
            one_minus = F.sub(self.fd.one, r)
            hv = F.mul(hv, F.select(odd, r[..., None], one_minus[..., None]))
            h = h >> 1
            return fs, Wh, hv, h, claim, jnp.stack(raw, axis=-1), r

        def body(carry, pad_rnd):
            fs, W0, W1, hv, h0, h1, claim = carry
            fs, W0, hv, h0, claim, raw0, r0 = one_hand(
                fs, W0, W1, h0, h1, hv, claim, pad_rnd[..., 0, :])
            fs, W1, hv, h1, claim, raw1, r1 = one_hand(
                fs, W1, W0, h1, h0, hv, claim, pad_rnd[..., 1, :])
            return ((fs, W0, W1, hv, h0, h1, claim),
                    (jnp.stack([raw0, raw1], axis=-2),
                     jnp.stack([r0, r1], axis=-1)))

        (fs, W0, W1, hv, h0, h1, claim), (hp_raw, g_ch) = jax.lax.scan(
            body, (fs, W0, W1, hv, h0, h1, claim), hp_pad)
        return fs, W0, W1, hv, claim, hp_raw, g_ch

    def _wire_rounds(self, fs, Wh, hv, qd, eq0, claim, hp_pad, logw: int,
                     wm_plan):
        """All wire rounds of a layer: merged+staged when a wm_plan is
        available (terms with equal (h0, h1) indices summed into one —
        bit-identical output, 8-90x less round work at mdoc scale),
        otherwise the single scan over the raw term list."""
        if not wm_plan:
            return self._wire_scan(fs, Wh, Wh, hv, qd["h0"], qd["h1"],
                                   eq0, claim, hp_pad, logw)
        F = self.F
        hv = jnp.take(hv, qd["wm_perm"], axis=hv.ndim - 1)
        W0 = W1 = Wh
        hp_parts, g_parts = [], []
        off = 0
        for si, (nr, _U) in enumerate(wm_plan):
            st = qd["wms"][si]
            hv = _contig_fold(F, hv, st["s"], st["e"])
            if nr == 0:
                continue
            fs, W0, W1, hv, claim, hp_s, g_s = self._wire_scan(
                fs, W0, W1, hv, st["h0"], st["h1"], eq0, claim,
                hp_pad[off : off + nr], nr)
            hp_parts.append(hp_s)
            g_parts.append(g_s)
            off += nr
        hp_raw = jnp.concatenate(hp_parts, axis=0)
        g_ch = jnp.concatenate(g_parts, axis=0)
        return fs, W0, W1, hv, claim, hp_raw, g_ch

    def _layer_fn(self, fs, prf_in, claims, bnd_q, bnd_g0, bnd_g1, qd, W,
                  cp_pad, hp_pad, wc_pad,
                  logc: int, nc: int, logv: int, logw: int,
                  fresh_prf: bool, wm_plan=None):
        """One full layer prove (prover_layers.h:185-271) on device.

        claims: [L, 2]; bnd_q: [L, >=logc]; bnd_g0/1: [L, >=logv]
        (sliced to logc/logv inside the trace — eager slices cost a
        relay round trip each); W: [L, nw, nc]; pads in evaluation
        basis.  `fresh_prf` is False only for layer 0, whose begin_layer
        challenges continue the PRF stream left over from begin_circuit
        (no intervening write).
        Returns (fs, outputs...) with raw (pre-pad) polynomials."""
        F, fd = self.F, self.fd
        bnd_q = bnd_q[..., :logc]
        bnd_g0 = bnd_g0[..., :logv]
        bnd_g1 = bnd_g1[..., :logv]
        # begin_layer: alpha, beta from one squeeze phase
        prf = dfs.fs_squeeze(fs) if fresh_prf else prf_in
        alpha, prf = dfs.dev_sample_elt(F, prf)
        beta, prf = dfs.dev_sample_elt(F, prf)

        C = 1 << logc
        EQ = _pad_pow2(_eq_dev(F, logc, nc, bnd_q), C, -1)
        nv = 1 << logv
        dot = _raw_eq2_dev(F, logv, nv, bnd_g0, bnd_g1, alpha)
        vq = F.select(qd["bmask"],
                      jnp.broadcast_to(beta[..., None], qd["v"].shape),
                      qd["v"])
        hv = F.mul(vq, jnp.take(dot, qd["g"], axis=dot.ndim - 1))

        claim = F.add(claims[..., 0], F.mul(alpha, claims[..., 1]))
        Wp = _pad_pow2(W, C, -1)

        if logc > 0:
            fs, EQ, Wp, claim, cp_raw, q_ch = self._copy_scan(
                fs, EQ, Wp, hv, (qd["h0"], qd["h1"]), claim, cp_pad, logc)
        else:
            cp_raw = jnp.zeros((0, F.L, 4), jnp.uint32)
            q_ch = jnp.zeros((0, F.L), jnp.uint32)

        eq0 = EQ[..., 0]
        N = 1 << logw
        Wh = _pad_pow2(Wp[..., 0], N, -1)

        fs, W0, W1, hv, claim, hp_raw, g_ch = self._wire_rounds(
            fs, Wh, hv, qd, eq0, claim, hp_pad, logw, wm_plan)

        wc0 = W0[..., 0]
        wc1 = W1[..., 0]
        bound_quad = F.lazy_sum(hv, axis=_batch_axis(F, hv, -1))
        expected = F.mul(eq0, F.mul(bound_quad, F.mul(wc0, wc1)))
        ok = F.eq(claim, expected)
        tt = jnp.stack([F.sub(wc0, wc_pad[..., 0]),
                        F.sub(wc1, wc_pad[..., 1])], axis=-1)
        fs = dfs.fs_write_elts(F, fs, tt)
        wc = jnp.stack([wc0, wc1], axis=-1)
        # next-layer bindings, already in planar [L, n] form (avoids
        # eager moveaxis/slices on the host side)
        q_next = jnp.moveaxis(q_ch, 0, -1) if logc > 0 else \
            jnp.zeros((F.L, 0), jnp.uint32)
        g_moved = jnp.moveaxis(g_ch, 0, -1)  # [L, 2, logw]
        g0_next = g_moved[..., 0, :]
        g1_next = g_moved[..., 1, :]
        return (fs, wc, bound_quad, ok, cp_raw, q_ch, hp_raw, g_ch,
                q_next, g0_next, g1_next, alpha)

    # ------------------------------------------------------------------
    # public API (mirrors SumcheckProver.prove)
    # ------------------------------------------------------------------

    def _begin_circuit_fn(self, fs):
        from .circuit import KMAX_BINDINGS
        F = self.F
        prf = dfs.fs_squeeze(fs)
        q, prf = dfs.dev_sample_elts(F, prf, KMAX_BINDINGS)
        g, prf = dfs.dev_sample_elts(F, prf, KMAX_BINDINGS)
        return fs, q, g, prf

    def _prove_core(self, fs, claims, inputs, qds, pads, metas,
                    W0=None, nvs=None):
        """The traced sumcheck prove loop: (optionally) the circuit
        evaluation, begin_circuit challenges, every layer's copy/wire
        scans with the on-device oracle.  Returns (fs, leaves,
        eval_flags, alphas) for the caller to pack — or to continue
        tracing straight into the Ligero phase (zk/fused.py)."""
        F = self.F
        logc, nc = metas[0]
        nl = len(metas[1])
        eval_flags = []
        if W0 is not None:
            # in-program circuit evaluation (prover_layers.h:52-98)
            inputs = [None] * nl
            inputs[nl - 1] = W0
            W = W0
            for l in range(nl - 1, -1, -1):
                V, okl = self._eval_layer(qds[l], W, nvs[l])
                eval_flags.append(okl)
                if l > 0:
                    inputs[l - 1] = V
                W = V
            # outputs must be all zero (honest-prover check)
            eval_flags.append(jnp.all(F.is_zero(W)))
        fs, q40, g40, prf = self._begin_circuit_fn(fs)
        bnd_q, bnd_g0, bnd_g1 = q40, g40, g40
        leaves = []
        alphas = []
        for ly, (logv, logw, *wmp) in enumerate(metas[1]):
            cp_pad, hp_pad, wc_pad = pads[ly]
            (fs, wc, bq, ok, cp_raw, q_ch, hp_raw, g_ch, q_next, g0n,
             g1n, alpha) = self._layer_fn(
                fs, prf, claims, bnd_q, bnd_g0, bnd_g1, qds[ly],
                inputs[ly], cp_pad, hp_pad, wc_pad, logc, nc, logv, logw,
                ly > 0, wmp[0] if wmp else None)
            leaves.append(dict(wc=wc, bq=bq, ok=ok, cp=cp_raw, q=q_ch,
                               hp=hp_raw, g=g_ch))
            alphas.append(alpha)
            claims = wc
            if logc > 0:
                bnd_q = q_next
            bnd_g0, bnd_g1 = g0n, g1n
        return fs, leaves, eval_flags, alphas

    def _prove_all_fn(self, fs, claims, inputs, qds, pads, metas,
                      W0=None, nvs=None):
        """The ENTIRE sumcheck prove as one traced program with a packed
        output.  One launch + one fetch per proof — each separate program
        execution pays a fixed multi-hundred-ms turnaround through the
        remote-TPU relay, which dominated the per-layer formulation."""
        fs, leaves, eval_flags, _ = self._prove_core(
            fs, claims, inputs, qds, pads, metas, W0=W0, nvs=nvs)
        tree = dict(fs=fs, outs=leaves)
        if W0 is not None:
            tree["evalok"] = jnp.stack(eval_flags)
        flat, _ = jax.tree_util.tree_flatten(tree)
        return _pack_fn(flat)

    # ------------------------------------------------------------------
    # chunked multi-layer programs (mdoc-scale circuits)
    # ------------------------------------------------------------------
    #
    # Per-program bounds for circuits above K_FUSE_TERM_LIMIT: each
    # device program covers a run of consecutive layers whose total quad
    # terms / layer count stay under these, with the sumcheck state
    # (transcript, claims, bindings) chained BETWEEN programs as device
    # arrays — no host sync until the final fetch.  This replaces the
    # one-program-per-layer formulation (38 launches + 38 distinct
    # compiles for the mdoc circuit pair) with ~8 programs.
    CHUNK_TERM_BUDGET = int(os.environ.get("LFZK_CHUNK_TERMS", 4_200_000))
    CHUNK_LAYER_BUDGET = int(os.environ.get("LFZK_CHUNK_LAYERS", 8))

    def _chunks_for(self, circ: Circuit):
        def nterms(ly):
            q = circ.layers[ly].quad
            return len(q.kidx) if q.kidx is not None else len(q.v)

        chunks, cur, cur_t = [], [], 0
        for ly in range(circ.nl):
            t = nterms(ly)
            if cur and (cur_t + t > self.CHUNK_TERM_BUDGET
                        or len(cur) >= self.CHUNK_LAYER_BUDGET):
                chunks.append(cur)
                cur, cur_t = [], 0
            cur.append(ly)
            cur_t += t
        if cur:
            chunks.append(cur)
        return chunks

    def _chunk_fn(self, fs, prf, claims, bnd_q, bnd_g0, bnd_g1, qds, Ws,
                  pads, chunk_meta, logc: int, nc: int, first: bool):
        """One device program proving len(chunk_meta) consecutive layers.
        chunk_meta: tuple of (logv, logw).  `first` chunks run
        begin_circuit inside the program (prf/bnd inputs ignored)."""
        if first:
            fs, q40, g40, prf = self._begin_circuit_fn(fs)
            bnd_q, bnd_g0, bnd_g1 = q40, g40, g40
        leaves = []
        for i, (logv, logw, *wmp) in enumerate(chunk_meta):
            cp_pad, hp_pad, wc_pad = pads[i]
            fresh = not (first and i == 0)
            (fs, wc, bq, ok, cp_raw, q_ch, hp_raw, g_ch, q_next, g0n,
             g1n, _alpha) = self._layer_fn(
                fs, prf, claims, bnd_q, bnd_g0, bnd_g1, qds[i], Ws[i],
                cp_pad, hp_pad, wc_pad, logc, nc, logv, logw, fresh,
                wmp[0] if wmp else None)
            leaves.append(dict(wc=wc, bq=bq, ok=ok, cp=cp_raw, q=q_ch,
                               hp=hp_raw, g=g_ch))
            claims = wc
            if logc > 0:
                bnd_q = q_next
            bnd_g0, bnd_g1 = g0n, g1n
        flat, _ = jax.tree_util.tree_flatten(leaves)
        return fs, prf, claims, bnd_q, bnd_g0, bnd_g1, _pack_fn(flat)

    def _chunk_template(self, chunk_meta, logc: int):
        F = self.F
        return [dict(wc=((F.L, 2), np.uint32),
                     bq=((F.L,), np.uint32),
                     ok=((), np.bool_),
                     cp=((logc, F.L, 4), np.uint32),
                     q=((logc, F.L), np.uint32),
                     hp=((logw, F.L, 2, 3), np.uint32),
                     g=((logw, F.L, 2), np.uint32))
                for (_logv, logw, *_r) in chunk_meta]

    def _eval_all_fn(self, W0, qds, nvs, nl: int):
        """Whole-circuit evaluation as ONE program: returns every
        layer's input array (device) + the ok flags (incl. the all-
        outputs-zero honest-prover check)."""
        F = self.F
        inputs = [None] * nl
        inputs[nl - 1] = W0
        W = W0
        flags = []
        for l in range(nl - 1, -1, -1):
            V, ok = self._eval_layer(qds[l], W, nvs[l])
            flags.append(ok)
            if l > 0:
                inputs[l - 1] = V
            W = V
        flags.append(jnp.all(F.is_zero(W)))
        return inputs, jnp.stack(flags)

    def _eval_chunk_fn(self, W_in, qds, nvs_chunk, has_layer0: bool):
        """Evaluate a run of consecutive layers (given in ascending
        layer order; evaluation walks them in reverse) from the carried
        input W_in.  Returns the per-layer outputs (in evaluation order,
        deepest first) + ok flags.  One program per chunk: the
        whole-circuit eval graph at mdoc scale (17 prefix scans over
        7.7M terms) OOMs the remote-compile helper."""
        F = self.F
        W = W_in
        outs = []
        flags = []
        for i in range(len(qds) - 1, -1, -1):
            V, ok = self._eval_layer(qds[i], W, nvs_chunk[i])
            flags.append(ok)
            outs.append(V)
            W = V
        if has_layer0:
            flags.append(jnp.all(F.is_zero(W)))
        return outs, jnp.stack(flags)

    def prove_chunked(self, circ: Circuit, ts, pad: Optional[Proof] = None,
                      with_aux: bool = False, W0=None,
                      inputs: Optional[List] = None):
        """Chunked prove: [optional one-program circuit eval] + one
        program per layer chunk, state chained on device, one fetch per
        chunk at the end.  Bit-identical proofs to prove()/the host
        prover.  With W0, returns (None, None, None) on an unsatisfied
        witness and leaves the host transcript untouched."""
        F = self.F
        host_ts = ts.ts
        logc, nc = circ.logc, circ.nc

        eval_flags = []
        chunks = self._chunks_for(circ)
        if inputs is None:
            assert W0 is not None
            nvs = []
            for ly in range(circ.nl):
                nvs.append(circ.layers[ly - 1].nw if ly > 0 else circ.nv)
            inputs = [None] * circ.nl
            inputs[circ.nl - 1] = W0
            W = W0
            for lys in reversed(chunks):
                qde = [self._quad_dev_eval(circ.layers[ly].quad, nvs[ly])
                       for ly in lys]
                nvs_chunk = tuple(nvs[ly] for ly in lys)
                has0 = lys[0] == 0
                key = ("evalchunk", nvs_chunk, has0,
                       tuple(q["h0"].shape[0] for q in qde), W.shape)
                if key not in self._layer_jit:
                    def fn(W_in, qds, _nvs=nvs_chunk, _h0=has0):
                        return self._eval_chunk_fn(W_in, qds, _nvs, _h0)

                    self._layer_jit[key] = jax.jit(fn)
                outs, flags = self._layer_jit[key](W, qde)
                eval_flags.append(flags)
                for i, ly in enumerate(reversed(lys)):
                    if ly > 0:
                        inputs[ly - 1] = outs[i]
                W = outs[-1]

        fs = dfs.fs_init_from_host(host_ts)
        claims = jnp.zeros((F.L, 2), jnp.uint32)
        prf = fs  # placeholder; first chunk computes the real one
        bnd_q = bnd_g0 = bnd_g1 = jnp.zeros((F.L, 0), jnp.uint32)

        logv = circ.logv
        metas_all = []
        wm_arrs = []
        for ly in range(circ.nl):
            layer = circ.layers[ly]
            plan, arrs = self._wm_for(layer.quad, layer.logw)
            metas_all.append((logv, layer.logw, plan))
            wm_arrs.append(arrs)
            logv = layer.logw

        packed_chunks = []
        templates = []
        for ci, lys in enumerate(chunks):
            qds = [{**self._quad_dev(circ.layers[ly].quad),
                    **(wm_arrs[ly] or {})} for ly in lys]
            Ws = [inputs[ly] for ly in lys]
            pads = [self._pads_dev(
                pad.layers[ly] if pad else None, logc,
                circ.layers[ly].logw) for ly in lys]
            chunk_meta = tuple(metas_all[ly] for ly in lys)
            first = ci == 0
            key = ("chunk", chunk_meta, logc, nc, first,
                   tuple(q["h0"].shape[0] for q in qds),
                   tuple(W.shape for W in Ws),
                   bnd_q.shape, bnd_g0.shape)
            if key not in self._layer_jit:
                self._layer_jit[key] = jax.jit(
                    self._chunk_fn, static_argnums=(9, 10, 11, 12))
            (fs, prf, claims, bnd_q, bnd_g0, bnd_g1, packed) = \
                self._layer_jit[key](fs, prf, claims, bnd_q, bnd_g0,
                                     bnd_g1, qds, Ws, pads, chunk_meta,
                                     logc, nc, first)
            packed_chunks.append(packed)
            templates.append(self._chunk_template(chunk_meta, logc))

        # ONE final pack launch + ONE device->host fetch for everything
        # (chunk outputs, transcript state, eval flags) — per-buffer
        # readbacks each pay a relay round trip.
        tail = [fs["h"], fs["buf"], fs["cnt"]] + eval_flags
        leaves = packed_chunks + tail
        pkey = tuple((x.shape, str(x.dtype)) for x in leaves)
        if pkey not in _PACK_JIT:
            _PACK_JIT[pkey] = jax.jit(_pack_fn)
        allp = np.asarray(_PACK_JIT[pkey](leaves))
        off = 0
        douts = []
        for packed, tmpl in zip(packed_chunks, templates):
            n = int(packed.shape[0])
            douts.extend(_unpack_list(allp[off : off + n], tmpl))
            off += n
        fs_np = dict(h=allp[off : off + 8].astype(np.uint32),
                     buf=allp[off + 8 : off + 72].astype(np.uint8),
                     cnt=allp[off + 72].astype(np.uint32))
        off += 73
        if eval_flags:
            nflags = circ.nl + 1
            if not allp[off : off + nflags].astype(bool).all():
                return None, None, None
        return self._assemble(circ, pad, with_aux, fs_np, douts, host_ts)

    def prove_layered(self, circ: Circuit, inputs: List, ts,
                      pad: Optional[Proof] = None, with_aux: bool = False):
        """Chunked-program variant for circuits too large to compile
        fused (see prove_chunked)."""
        return self.prove_chunked(circ, ts, pad=pad, with_aux=with_aux,
                                  inputs=inputs)

    def prove(self, circ: Circuit, inputs: List, ts,
              pad: Optional[Proof] = None, with_aux: bool = False):
        """ts: TranscriptSumcheck over a host Transcript.  Launches ONE
        fused device program, fetches once, assembles the host Proof, and
        advances the host transcript to the post-sumcheck state.  Large
        circuits fall back to per-layer programs (compile memory)."""
        F = self.F
        if circ.nterms() > self.K_FUSE_TERM_LIMIT:
            return self.prove_layered(circ, inputs, ts, pad=pad,
                                      with_aux=with_aux)
        host_ts = ts.ts
        fs = dfs.fs_init_from_host(host_ts)

        logc, nc = circ.logc, circ.nc
        metas = ((logc, nc), tuple())
        logv = circ.logv
        layer_meta = []
        qds = []
        pads = []
        for ly in range(circ.nl):
            layer = circ.layers[ly]
            plan, arrs = self._wm_for(layer.quad, layer.logw)
            qd = self._quad_dev(layer.quad)
            qds.append({**qd, **arrs} if arrs else qd)
            pads.append(self._pads_dev(
                pad.layers[ly] if pad else None, logc, layer.logw))
            layer_meta.append((logv, layer.logw, plan))
            logv = layer.logw
        metas = ((logc, nc), tuple(layer_meta))

        claims = jnp.zeros((F.L, 2), jnp.uint32)
        key = ("prove", metas, tuple(q["h0"].shape[0] for q in qds),
               tuple(x.shape for x in inputs))
        if key not in self._layer_jit:
            def fn(fs, claims, inputs, qds, pads):
                return self._prove_all_fn(fs, claims, inputs, qds, pads,
                                          metas)

            self._layer_jit[key] = jax.jit(fn)
        packed_dev = self._layer_jit[key](fs, claims, inputs, qds, pads)
        packed = np.asarray(packed_dev)
        fs_np, douts, _ = _unpack(packed, _out_template(F, metas))
        return self._assemble(circ, pad, with_aux, fs_np, douts, host_ts)

    # Above this many total quad terms the all-layers-fused program is
    # split into chunked programs (prove_chunked): one giant fused graph
    # compiles for tens of minutes through the TPU remote-compile relay
    # (and OOMs its helper at mdoc scale), while chunked programs
    # compile in minutes each and cost only ~one extra launch per chunk.
    K_FUSE_TERM_LIMIT = int(os.environ.get("LFZK_FUSE_TERMS", 300_000))

    def prove_with_witness(self, circ: Circuit, W0, ts,
                           pad: Optional[Proof] = None,
                           with_aux: bool = False):
        """Fused circuit evaluation + sumcheck prove: ONE device program,
        one fetch.  Returns (proof, aux, bindings), or (None, None, None)
        if the witness does not satisfy the circuit (in which case the
        host transcript is left untouched)."""
        F = self.F
        if circ.nterms() > self.K_FUSE_TERM_LIMIT:
            return self.prove_chunked(circ, ts, pad=pad,
                                      with_aux=with_aux, W0=W0)
        host_ts = ts.ts
        fs = dfs.fs_init_from_host(host_ts)

        logc, nc = circ.logc, circ.nc
        logv = circ.logv
        layer_meta = []
        qds = []
        pads = []
        nvs = []
        for ly in range(circ.nl):
            layer = circ.layers[ly]
            nvs.append(circ.layers[ly - 1].nw if ly > 0 else circ.nv)
            plan, arrs = self._wm_for(layer.quad, layer.logw)
            qd = self._quad_dev_eval(layer.quad, nvs[-1])
            qds.append({**qd, **arrs} if arrs else qd)
            pads.append(self._pads_dev(
                pad.layers[ly] if pad else None, logc, layer.logw))
            layer_meta.append((logv, layer.logw, plan))
            logv = layer.logw
        metas = ((logc, nc), tuple(layer_meta))
        nvs = tuple(nvs)

        claims = jnp.zeros((F.L, 2), jnp.uint32)
        key = ("provew", metas, nvs,
               tuple(q["h0"].shape[0] for q in qds), W0.shape)
        if key not in self._layer_jit:
            def fn(fs, claims, W0, qds, pads):
                return self._prove_all_fn(fs, claims, None, qds, pads,
                                          metas, W0=W0, nvs=nvs)

            self._layer_jit[key] = jax.jit(fn)
        packed = np.asarray(self._layer_jit[key](fs, claims, W0, qds, pads))
        fs_np, douts, evalok = _unpack(
            packed, _out_template(F, metas, with_eval=True))
        if not bool(np.asarray(evalok).all()):
            return None, None, None
        return self._assemble(circ, pad, with_aux, fs_np, douts, host_ts)

    def _assemble(self, circ, pad, with_aux, fs_np, douts, host_ts):
        F = self.F
        logc = circ.logc
        for d in douts:
            assert bool(np.asarray(d["ok"]).all()), "sum != eq0*quad*wl*wr"

        proof = Proof()
        aux = ProofAux() if with_aux else None
        for ly, d in enumerate(douts):
            layer = circ.layers[ly]
            pad_lp = pad.layers[ly] if pad else None
            lp = LayerProof(cp=[], hp=[[], []], wc=[None, None])
            for rnd in range(logc):
                raw = [F.from_limbs(d["cp"][rnd][..., k]) for k in range(4)]
                if pad_lp is not None:
                    raw = [F.sub_i(x, y) for x, y in
                           zip(raw, pad_lp.cp[rnd])]
                lp.cp.append(raw)
            for rnd in range(layer.logw):
                for hand in range(2):
                    raw = [F.from_limbs(d["hp"][rnd][..., hand, k])
                           for k in range(3)]
                    if pad_lp is not None:
                        raw = [F.sub_i(x, y) for x, y in
                               zip(raw, pad_lp.hp[hand][rnd])]
                    lp.hp[hand].append(raw)
            wc0 = F.from_limbs(d["wc"][..., 0])
            wc1 = F.from_limbs(d["wc"][..., 1])
            if pad_lp is not None:
                lp.wc = [F.sub_i(wc0, pad_lp.wc[0]),
                         F.sub_i(wc1, pad_lp.wc[1])]
            else:
                lp.wc = [wc0, wc1]
            lp._bound_quad = F.from_limbs(d["bq"])
            proof.layers.append(lp)
            if with_aux:
                aux.bound_quad.append(lp._bound_quad)

        # advance the host transcript to the device post-state
        dfs.fs_state_to_host(host_ts, fs_np)

        # bindings for the caller (host scalars)
        last = douts[-1]
        lw = circ.layers[-1].logw
        bindings = dict(
            q=[F.from_limbs(last["q"][rnd]) for rnd in range(logc)],
            g=[[F.from_limbs(last["g"][rnd][..., h]) for rnd in range(lw)]
               for h in range(2)],
            logv=lw)
        return proof, aux, bindings

    def _pads_dev(self, pad_lp, logc: int, logw: int):
        """Pad polynomials (evaluation basis) as device arrays:
        cp [logc, L, 4], hp [logw, L, 2, 3], wc [L, 2]."""
        F = self.F
        if pad_lp is None:
            cp = np.zeros((logc, F.L, 4), np.uint32)
            hp = np.zeros((logw, F.L, 2, 3), np.uint32)
            wc = np.zeros((F.L, 2), np.uint32)
            return jnp.asarray(cp), jnp.asarray(hp), jnp.asarray(wc)
        cp = np.zeros((logc, F.L, 4), np.uint32)
        for rnd in range(logc):
            cp[rnd] = F.to_limbs(pad_lp.cp[rnd])  # [L, 4]
        hp = np.zeros((logw, F.L, 2, 3), np.uint32)
        for rnd in range(logw):
            for hand in range(2):
                hp[rnd, :, hand, :] = F.to_limbs(pad_lp.hp[hand][rnd])
        wc = np.asarray(F.to_limbs(pad_lp.wc), np.uint32)
        return jnp.asarray(cp), jnp.asarray(hp), jnp.asarray(wc)
