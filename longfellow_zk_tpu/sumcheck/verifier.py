"""Sumcheck verifier (reference lib/sumcheck/verifier_layers.h:33-204 and
verifier.h:32-94).

Host-side: the verifier's work is O(rounds) small-field ops plus one
O(terms) quad binding per layer — no device batch parallelism to
exploit at mdoc scale, and keeping it on host makes it an independent
check of the device prover.  (The quad binding uses the combined
bind_gh_all form, quad.h:188-210, which equals the reference's
bind_g + repeated bind_h.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from .circuit import Challenge, Circuit, KMAX_BINDINGS, KMAX_COPIES, \
    KMAX_LAYERS, KMAX_OUTPUTS, LayerChallenge, Proof
from .eqs import eq_array_host, eq_eval_host, raw_eq2_host
from .poly import eval_lagrange


@dataclass
class Claims:
    nv: int
    logv: int
    claim: List
    q: List
    g: List  # [2] lists


def bind_quad_host(F, quad, logv: int, g0, g1, alpha, beta, logw: int,
                   h0_ch, h1_ch):
    """bind_gh_all (quad.h:188-210): fully bound quad scalar (host
    reference implementation; O(terms) bigint ops)."""
    nv = 1 << logv
    eqg = raw_eq2_host(F, logv, nv, g0, g1, alpha)
    nw = 1 << logw
    eqh0 = eq_array_host(F, logw, nw, h0_ch)
    eqh1 = eq_array_host(F, logw, nw, h1_ch)
    s = F.of_scalar(0)
    for t in range(quad.nterms):
        v = quad.v[t]
        d = eqg[int(quad.g[t])]
        vq = F.mul_i(beta, d) if v == 0 else F.mul_i(v, d)
        vq = F.mul_i(vq, eqh0[int(quad.h0[t])])
        vq = F.mul_i(vq, eqh1[int(quad.h1[t])])
        s = F.add_i(s, vq)
    return s


_BIND_JIT = {}


def bind_quad_device(F, quad, logv: int, g0, g1, alpha, beta, logw: int,
                     h0_ch, h1_ch):
    """Device bind_gh_all: EQ-array builds + three gathers + one
    reduction per layer.  The verifier's only O(terms) step; at mdoc
    scale (7.7M terms) the host loop is minutes, the device launch is
    milliseconds."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .prover_device import DeviceSumcheckProver, _eq_dev, _raw_eq2_dev

    prover = DeviceSumcheckProver(F)  # for _quad_dev caching
    qd = prover._quad_dev(quad)
    T = int(qd["g"].shape[0])

    key = (id(F), T, logv, logw)
    if key not in _BIND_JIT:
        def fn(qd, g0a, g1a, alpha_a, beta_a, h0a, h1a):
            dot = _raw_eq2_dev(F, logv, 1 << logv, g0a, g1a, alpha_a)
            eqh0 = _eq_dev(F, logw, 1 << logw, h0a)
            eqh1 = _eq_dev(F, logw, 1 << logw, h1a)
            vq = F.select(qd["bmask"],
                          jnp.broadcast_to(beta_a[..., None],
                                           qd["v"].shape), qd["v"])
            t = F.mul(vq, jnp.take(dot, qd["g"], axis=dot.ndim - 1))
            t = F.mul(t, jnp.take(eqh0, qd["h0"], axis=eqh0.ndim - 1))
            t = F.mul(t, jnp.take(eqh1, qd["h1"], axis=eqh1.ndim - 1))
            nlead = 2 if type(F).__name__ == "Fp2" else 1
            return F.lazy_sum(t, axis=t.ndim - 1 - nlead)

        _BIND_JIT[key] = jax.jit(fn)

    def elts(vals):
        return jnp.asarray(F.to_limbs(list(vals)))

    out = _BIND_JIT[key](
        qd, elts(g0[:logv]), elts(g1[:logv]), jnp.asarray(F.to_limbs(alpha)),
        jnp.asarray(F.to_limbs(beta)), elts(h0_ch), elts(h1_ch))
    import numpy as _np

    return F.from_limbs(_np.asarray(out))


class SumcheckVerifier:
    """Layer verification returning input claims (VerifierLayers)."""

    def __init__(self, F):
        self.F = F

    def circuit(self, circ: Circuit, proof: Proof, ts
                ) -> Tuple[Optional[Claims], Optional[Challenge], str]:
        F = self.F
        if len(proof.layers) < circ.nl:
            return None, None, "Proof size less than circuit layers"
        q, g = ts.begin_circuit()
        ch = Challenge(q=q, g=g, layers=[])
        cl = Claims(nv=circ.nv, logv=circ.logv,
                    claim=[F.of_scalar(0), F.of_scalar(0)],
                    q=q, g=[g, list(g)])
        why = self._layers(cl, circ, proof, ts, ch)
        if why is not None:
            return None, None, why
        return cl, ch, "ok"

    def _layers(self, cl: Claims, circ: Circuit, proof: Proof, ts,
                ch: Challenge) -> Optional[str]:
        F = self.F
        for ly in range(circ.nl):
            layer = circ.layers[ly]
            plr = proof.layers[ly]
            alpha, beta = ts.begin_layer()
            lch = LayerChallenge(alpha=alpha, beta=beta, cb=[], hb=[[], []])
            claim = F.add_i(cl.claim[0], F.mul_i(alpha, cl.claim[1]))

            # copy rounds
            for rnd in range(circ.logc):
                tp = plr.cp[rnd]
                if F.add_i(tp[0], tp[1]) != claim:
                    return "claim != p(0) + p(1)"
                r = ts.round(tp)
                lch.cb.append(r)
                claim = eval_lagrange(F, tp, r)

            # wire rounds
            for rnd in range(layer.logw):
                for hand in range(2):
                    tp = plr.hp[hand][rnd]
                    if F.add_i(tp[0], tp[1]) != claim:
                        return "claim != p(0) + p(1)"
                    r = ts.round(tp)
                    lch.hb[hand].append(r)
                    claim = eval_lagrange(F, tp, r)

            # final check: claim = EQ[Q,C] QUAD[G|R,L] W[R,C] W[L,C]
            bind = (bind_quad_device if layer.quad.nterms > 20000
                    else bind_quad_host)
            bound_quad = bind(
                F, layer.quad, cl.logv, cl.g[0][: cl.logv],
                cl.g[1][: cl.logv], alpha, beta, layer.logw,
                lch.hb[0], lch.hb[1])
            got = eq_eval_host(F, circ.logc, circ.nc, cl.q, lch.cb)
            got = F.mul_i(got, bound_quad)
            got = F.mul_i(got, plr.wc[0])
            got = F.mul_i(got, plr.wc[1])
            if got != claim:
                return "got != claim (layer)"
            ts.write_elts(plr.wc)
            ch.layers.append(lch)
            cl.nv = layer.nw
            cl.logv = layer.logw
            cl.claim = [plr.wc[0], plr.wc[1]]
            cl.q = lch.cb
            cl.g = [lch.hb[0], lch.hb[1]]
        return None


def bind_dense_host(F, vals: List, r) -> List:
    """Host Dense::bind along a flat list (zero-padded)."""
    out = []
    n = len(vals)
    for i in range((n + 1) // 2):
        lo = vals[2 * i]
        hi = vals[2 * i + 1] if 2 * i + 1 < n else F.of_scalar(0)
        out.append(F.add_i(lo, F.mul_i(r, F.sub_i(hi, lo))))
    return out


def verify(circ: Circuit, proof: Proof, W_host: List[List], ts, F
           ) -> Tuple[bool, str]:
    """Full plain-sumcheck verification with direct input binding
    (verifier.h:39-91).  W_host: [nc][n_wires] per-copy wire values."""
    if circ.nl > KMAX_LAYERS:
        return False, "too many layers"
    if circ.nc > KMAX_COPIES:
        return False, "too many copies"
    if circ.nv > KMAX_OUTPUTS:
        return False, "too many outputs"
    if circ.nl != len(circ.layers) or circ.nl != len(proof.layers):
        return False, "circuit and proof layer counts must match"

    ts.write_input(W_host)
    v = SumcheckVerifier(F)
    cl, ch, why = v.circuit(circ, proof, ts)
    if cl is None:
        return False, why

    # bind copy variables: W[wire][copy] -> flat per-wire scalars
    nwires = len(W_host[0])
    cols = [[W_host[c][w] for c in range(circ.nc)] for w in range(nwires)]
    for rnd in range(circ.logc):
        cols = [bind_dense_host(F, col, cl.q[rnd]) for col in cols]
    flat = [col[0] for col in cols]
    # bind gate variables for the two hands
    for hand in range(2):
        vals = list(flat)
        for rnd in range(cl.logv):
            vals = bind_dense_host(F, vals, cl.g[hand][rnd])
        if vals[0] != cl.claim[hand]:
            return False, "got != cl.claim[hand]"
    return True, "ok"
