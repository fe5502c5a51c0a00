"""Layered GKR/sumcheck prover, TPU-native.

Semantic twin of the reference ProverLayers (lib/sumcheck/
prover_layers.h:37-497, following Thaler ch. 4.6.7 data-parallel
sumcheck), re-derived as array programs:

  - wire evaluation (eval_quad, prover_layers.h:278-305) = batched
    gather + field multiply + modular segment-sum over terms;
  - the copy-round polynomial (evaluations_c, prover_layers.h:415-496,
    the reference's hottest loop) = a handful of whole-array field
    multiplies over [terms, copies] with Karatsuba structure, reduced by
    the lazy byte-column accumulator (the Accum analogue);
  - Dense/EQ binding = one fused vector step (arrays/dense.py);
  - HQuad (quad with g bound) keeps its (h0, h1) indices as *host*
    numpy arrays — they are static per round — while its values ride
    the device; bind_h is a masked multiply by (1-r)/r plus a host
    index shift, replacing the reference's sorted-run merge
    (hquad.h:89-117) whose combining is only an optimization.

The Fiat-Shamir loop is inherently sequential (challenge feeds the next
round), so each round is one device program launch plus a tiny host
transcript step; per-layer claims and round polynomials live on host.

Proof bytes are identical to the reference's: round polynomials are
written in evaluation basis at the standard points, p(1) omitted.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..arrays.dense import bind as dense_bind
from .circuit import Circuit, KMAX_BINDINGS, LayerProof, Proof, ProofAux
from .eqs import eq_array_device, raw_eq2_device
from .poly import eval_lagrange, evals_of_coefs, poly_sub


class SumcheckProver:
    def __init__(self, F, use_jit: bool = None):
        self.F = F
        # jitted per-round kernels (cached by input shapes; the
        # Fiat-Shamir loop launches one compiled program per round).
        # On the XLA CPU backend, per-shape compiles of the field
        # kernels cost more than eager dispatch for test-sized
        # circuits, so jit is TPU-default only.
        if use_jit is None:
            use_jit = jax.default_backend() != "cpu"

        def wrap(f, **kw):
            return jax.jit(f, **kw) if use_jit else f

        self._bind_j = wrap(lambda x, r: dense_bind(F, x, r, axis=-1))
        self._evals_c_j = wrap(self._evaluations_c)
        self._wire_round_j = wrap(self._wire_round, static_argnums=(5,))
        self._bind_hv_j = wrap(
            lambda hv, odd, r_arr, omr_arr: F.mul(
                hv, F.select(odd, r_arr, omr_arr)))
        self._lazy_sum_last_j = wrap(
            lambda x: F.lazy_sum(x, _batch_axis(F, x, -1)))

    def _wire_round(self, hv, Wh, Wo, h_hand, h_other, n_hand: int):
        """QW aggregation + quadratic coefficients for one wire round."""
        F = self.F
        wother = jnp.take(Wo, h_other, axis=Wo.ndim - 1)
        QW = F.lazy_segment_sum(
            F.mul(hv, wother)[..., :, None], h_hand, n_hand)[..., 0]
        return self._evaluations(QW, Wh)

    # ------------------------------------------------------------------
    # circuit evaluation
    # ------------------------------------------------------------------

    def eval_quad(self, quad, W, nv: int):
        """V[g, c] = sum_t v_t W[h1_t, c] W[h0_t, c]; returns (V, ok).

        W: [L.., nw, nc].  Assert-zero terms (beta markers) must have a
        zero product (prover_layers.h:288-295).
        """
        F = self.F
        wl = jnp.take(W, jnp.asarray(quad.h1), axis=W.ndim - 2)
        wr = jnp.take(W, jnp.asarray(quad.h0), axis=W.ndim - 2)
        prod = F.mul(wl, wr)
        bmask = quad.beta_mask()
        ok = jnp.asarray(True)
        if bmask.any():
            bm = jnp.asarray(bmask)
            shape_ok = F.is_zero(prod)  # bool [T, nc]
            ok = jnp.all(jnp.where(bm[:, None], shape_ok, True))
        vv = quad.v_limbs(F)
        terms = F.mul(prod, vv[..., None])
        # zero out beta terms so they don't contribute to V
        if bmask.any():
            keep = jnp.asarray(~bmask)[:, None]  # [T, 1] over (T, nc)
            terms = F.select(keep, terms, jnp.zeros_like(terms))
        V = F.lazy_segment_sum(terms, quad.g, nv)
        return V, ok

    def eval_circuit(self, circ: Circuit, W0):
        """Returns (inputs_per_layer, finalV) or (None, None) on assert fail.

        W0: [L.., ninputs, nc] device array.
        """
        nl = circ.nl
        inputs = [None] * nl
        inputs[nl - 1] = W0
        W = W0
        finalV = None
        for l in range(nl - 1, -1, -1):
            nv = circ.layers[l - 1].nw if l > 0 else circ.nv
            V, ok = self.eval_quad(circ.layers[l].quad, W, nv)
            if not bool(ok):
                return None, None
            if l > 0:
                inputs[l - 1] = V
            else:
                finalV = V
            W = V
        return inputs, finalV

    # ------------------------------------------------------------------
    # proving
    # ------------------------------------------------------------------

    def prove(self, circ: Circuit, inputs: List, ts,
              pad: Optional[Proof] = None, with_aux: bool = False):
        """Generate the sumcheck proof (prover_layers.h:114-166).

        ts: TranscriptSumcheck.  Returns (proof, aux, bindings) where
        bindings = dict(q=[logc challenges...], g=[2][logw], logv=...)
        for the caller (zk layer) to bind the input claims.
        """
        F = self.F
        logc, nc = circ.logc, circ.nc

        q_full, g_full = ts.begin_circuit()
        bnd_q = q_full
        bnd_g = [g_full, list(g_full)]
        logv = circ.logv

        WC = [F.of_scalar(0), F.of_scalar(0)]
        proof = Proof()
        aux = ProofAux() if with_aux else None

        for ly in range(circ.nl):
            layer = circ.layers[ly]
            alpha, beta = ts.begin_layer()
            EQ = eq_array_device(F, logc, nc, bnd_q)
            # bind_g: fold the alpha-combined output-eq into the quad values
            quad = layer.quad
            nv = 1 << logv
            dot = raw_eq2_device(F, logv, nv, bnd_g[0][:logv],
                                 bnd_g[1][:logv], alpha)
            vq = quad.v_limbs(F)
            bmask = quad.beta_mask()
            if bmask.any():
                beta_arr = F.broadcast_const(beta, (quad.nterms,))
                vq = F.select(jnp.asarray(bmask), beta_arr, vq)
            hv = F.mul(vq, jnp.take(dot, jnp.asarray(quad.g),
                                    axis=dot.ndim - 1))
            h = [np.asarray(quad.h0, dtype=np.int64).copy(),
                 np.asarray(quad.h1, dtype=np.int64).copy()]

            lp, new_q, new_g, WC = self._layer(
                proof, pad.layers[ly] if pad else None, ts, ly, logc,
                layer.logw, EQ, h, hv, inputs[ly], alpha, WC)
            proof.layers.append(lp)
            bnd_q = new_q
            bnd_g = new_g
            logv = layer.logw

            if with_aux:
                # bound_quad: hv fully bound = sum of remaining values
                aux.bound_quad.append(self._hv_scalar(lp))

        bindings = dict(q=bnd_q, g=bnd_g, logv=logv)
        return proof, aux, bindings

    def _hv_scalar(self, lp):
        return lp._bound_quad  # stashed by _layer

    def _layer(self, proof, pad_lp, ts, ly, logc, logw, EQ, h, hv, W, alpha,
               WC):
        """One layer (prover_layers.h:185-271).

        W: [L.., nw, nc]; EQ: [L.., nc]; hv: [L.., T] device.
        Returns (LayerProof, q_challenges, [g0, g1], WC_new).
        """
        F = self.F
        sum_claim = F.add_i(WC[0], F.mul_i(alpha, WC[1]))

        lp = LayerProof(cp=[], hp=[[], []], wc=[None, None])
        q_ch = []
        h_dev = [jnp.asarray(h[0]), jnp.asarray(h[1])]
        # ---- copy rounds ----
        for rnd in range(logc):
            accs = self._evals_c_j(EQ, W, h_dev, hv)
            c0, c2, c3 = [self._to_host(a) for a in accs]
            c1 = F.sub_i(
                F.sub_i(F.sub_i(F.sub_i(sum_claim, c0), c0), c2), c3)
            raw_evals = evals_of_coefs(F, [c0, c1, c2, c3])
            evals = raw_evals
            if pad_lp is not None:
                evals = poly_sub(F, raw_evals, pad_lp.cp[rnd])
            lp.cp.append(evals)
            r = ts.round(evals)
            q_ch.append(r)
            rb = F.broadcast_const(r)
            EQ = self._bind_j(EQ, rb)
            W = self._bind_j(W, rb)
            sum_claim = eval_lagrange(F, raw_evals, r)

        eq0 = self._to_host(EQ[..., 0])
        # W now [L.., nw, 1] -> [L.., nw]
        W = W[..., 0]
        WH = [W, W]
        g_ch = [[], []]

        # ---- wire rounds, alternating hands ----
        for rnd in range(logw):
            for hand in range(2):
                ohand = 1 - hand
                n_hand = WH[hand].shape[-1]
                a0, a2 = self._wire_round_j(hv, WH[hand], WH[ohand],
                                            h_dev[hand], h_dev[ohand], n_hand)
                a0h, a2h = self._to_host(a0), self._to_host(a2)
                coef0 = F.mul_i(eq0, a0h)
                coef2 = F.mul_i(eq0, a2h)
                coef1 = F.sub_i(
                    F.sub_i(F.sub_i(sum_claim, coef0), coef0), coef2)
                evals = evals_of_coefs(F, [coef0, coef1, coef2])
                raw_evals = evals
                if pad_lp is not None:
                    evals = poly_sub(F, evals, pad_lp.hp[hand][rnd])
                lp.hp[hand].append(evals)
                r = ts.round(evals)
                g_ch[hand].append(r)
                sum_claim = eval_lagrange(F, raw_evals, r)
                rb = F.broadcast_const(r)
                WH_new = self._bind_j(WH[hand], rb)
                WH = list(WH)
                WH[hand] = WH_new
                # bind hv on hand: multiply by (1-r) or r by parity of h
                odd = jnp.asarray((h[hand] & 1).astype(bool))
                r_arr = F.broadcast_const(r, (h[hand].shape[0],))
                one_minus = F.broadcast_const(F.sub_i(F.of_scalar(1), r),
                                              (h[hand].shape[0],))
                hv = self._bind_hv_j(hv, odd, r_arr, one_minus)
                h[hand] = h[hand] >> 1
                h_dev[hand] = jnp.asarray(h[hand])

        hquad = self._to_host(self._lazy_sum_last_j(hv))
        lp._bound_quad = hquad
        wc0 = self._to_host(WH[0][..., 0])
        wc1 = self._to_host(WH[1][..., 0])
        expected = F.mul_i(eq0, F.mul_i(hquad, F.mul_i(wc0, wc1)))
        assert sum_claim == expected, "sum != eq0*quad*wl*wr"
        tt = [wc0, wc1]
        if pad_lp is not None:
            tt = [F.sub_i(tt[0], pad_lp.wc[0]), F.sub_i(tt[1], pad_lp.wc[1])]
        lp.wc = tt
        ts.write_elts(tt)
        return lp, q_ch, g_ch, [wc0, wc1]

    # ------------------------------------------------------------------
    # round-polynomial kernels
    # ------------------------------------------------------------------

    def _evaluations_c(self, EQ, W, h, hv):
        """Cubic copy-round coefficients (c0, c2, c3)
        (prover_layers.h:415-496), fully vectorized over terms x copies."""
        F = self.F
        wr = jnp.take(W, jnp.asarray(h[0]), axis=W.ndim - 2)  # [L.., T, nc]
        wl = jnp.take(W, jnp.asarray(h[1]), axis=W.ndim - 2)
        nc = W.shape[-1]
        if nc % 2 == 1:
            pad = [(0, 0)] * W.ndim
            pad[-1] = (0, 1)
            wr = jnp.pad(wr, pad)
            wl = jnp.pad(wl, pad)
            EQ = jnp.pad(EQ, [(0, 0)] * (EQ.ndim - 1) + [(0, 1)])
        eq0 = EQ[..., None, 0::2]  # [L.., 1, nc2]
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
        # sum over copies then weight by hv and sum over terms
        res = []
        for lk in (l0, l2, l3):
            per_term = F.lazy_sum(lk, axis=_batch_axis(F, lk, -1))
            weighted = F.mul(per_term, hv)
            res.append(F.lazy_sum(weighted, axis=_batch_axis(F, weighted, -1)))
        return res

    def _evaluations(self, QW, W):
        """Quadratic wire-round coefficients (a0, a2)
        (prover_layers.h:357-402)."""
        F = self.F
        n = W.shape[-1]
        if n % 2 == 1:
            pad = [(0, 0)] * W.ndim
            pad[-1] = (0, 1)
            W = jnp.pad(W, pad)
            QW = jnp.pad(QW, pad)
        qw0, qw1 = QW[..., 0::2], QW[..., 1::2]
        w0, w1 = W[..., 0::2], W[..., 1::2]
        a0 = F.lazy_sum(F.mul(qw0, w0), axis=_batch_axis(F, w0, -1))
        a2 = F.lazy_sum(F.mul(F.sub(qw1, qw0), F.sub(w1, w0)),
                        axis=_batch_axis(F, w0, -1))
        return a0, a2

    def _to_host(self, x):
        """Device [L..] single element -> host scalar."""
        v = self.F.from_limbs(np.asarray(x))
        return v


def _batch_axis(F, arr, axis: int) -> int:
    """Convert an absolute axis of `arr` into the batch-relative axis
    expected by F.lazy_sum (which counts axes after the limb axes)."""
    nlead = 2 if type(F).__name__ == "Fp2" else 1
    axis = axis % arr.ndim
    return axis - nlead
