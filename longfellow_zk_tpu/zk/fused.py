"""Single-program ZK prove: sumcheck + verifier-constraints + Ligero.

The two-phase host flow (zk/prover.py prove()) runs the fused sumcheck
program, fetches the proof, symbolically replays the verifier on the
host to build the Ligero linear system A (zk/common.py
verifier_constraints), and launches two more device programs for the
Ligero responses and the column openings.  Through the remote-TPU relay
every extra program execution and fetch costs a fixed multi-hundred-ms
turnaround, so this module traces the ENTIRE post-commit prove as ONE
XLA program:

  circuit evaluation -> sumcheck layers (on-device Fiat-Shamir)
  -> traced verifier-constraint builder (the device twin of
     zk_common.h:49-136: all constraint POSITIONS are static circuit
     geometry; only the VALUES are traced challenge algebra, kept as one
     [L, nvar] tensor per layer so the graph stays small)
  -> Ligero response phase (ligero_prover.h:84-146: challenge draws,
     grand inner-product vector A via one field segment-sum, y
     responses, response absorption, column choose, column gather)
  -> one packed output.

One launch + one fetch per proof after the commit program.  Proof bytes
are bit-identical to the two-phase flow (tests/test_zk_fused.py).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ligero.param import LigeroParam
from ..random_oracle import device_fs as dfs
from ..sumcheck.circuit import Circuit
from ..sumcheck.prover_device import _eq_dev, _pack_fn
from .common import HASH_OF_A, PadLayout


class FusedStatic:
    """Static (circuit-geometry) data for the traced constraint builder:
    positions mirror zk/common.py verifier_constraints exactly."""

    def __init__(self, circ: Circuit, p: LigeroParam, lqc, n_witness: int):
        assert circ.logc == 0, "fused prove assumes copies==1 (like the ref)"
        self.circ = circ
        self.p = p
        self.n_witness = n_witness
        self.layer_nvar = []
        self.layer_i0 = []
        self.layer_pi = []
        ws: List[int] = []
        cs: List[int] = []
        pi = n_witness
        ci = 0
        for ly, layer in enumerate(circ.layers):
            pl = PadLayout(layer.logw)
            nvar = pl.ovp_layer_size()
            i0 = pl.ovp_poly_pad(0, 0) if ly == 0 else pl.ovp_claim_pad_m1(0)
            self.layer_nvar.append(nvar)
            self.layer_i0.append(i0)
            self.layer_pi.append(pi)
            for i in range(i0, nvar):
                ws.append((pi + i) - pl.ovp_poly_pad(0, 0))
                cs.append(ci)
            pi += pl.layer_size()
            ci += 1
        # input-binding constraint (zk_common.h:129-135, 406-439)
        ninp, npub = circ.ninputs, circ.npub_in
        for i in range(npub, ninp):
            ws.append(i - npub)
            cs.append(ci)
        pl0 = PadLayout(0)
        claim_pad_m1 = pi - pl0.ovp_poly_pad(0, 0)
        ws += [claim_pad_m1, claim_pad_m1 + 1]
        cs += [ci, ci]
        self.nl_constraints = ci + 1
        # lqc triples of inner_product_vector (ligero_param.h:382-421):
        # one (+) entry at the quadratic row and one (-) at the witness
        # position, for each of x/y/z of each constraint
        ax0 = p.nwrow * p.w
        ay0 = ax0 + p.nqtriples * p.w
        az0 = ay0 + p.nqtriples * p.w
        qws: List[int] = []
        qcols: List[int] = []  # column in the [L, 3*nq] alphaq tensor
        qneg: List[bool] = []
        for iw in range(p.nq):
            for j, base in enumerate((ax0, ay0, az0)):
                qws.append(base + iw)
                qcols.append(3 * iw + j)
                qneg.append(False)
            l = lqc[iw]
            for j, wpos in enumerate((l.x, l.y, l.z)):
                qws.append(wpos)
                qcols.append(3 * iw + j)
                qneg.append(True)
        self.ws = np.asarray(ws, np.int32)
        self.cs = np.asarray(cs, np.int32)
        self.qws = np.asarray(qws, np.int32)
        self.qcols = np.asarray(qcols, np.int32)
        self.qneg = np.asarray(qneg, np.bool_)


def _const(F, value: int):
    return jnp.asarray(F.to_limbs(value % (2 ** 128) if F.kCharacteristicTwo
                                  else value))


def _lagrange3_consts(F):
    """Host inverse-denominator constants for the degree-2 Lagrange basis
    over points 0,1,2 (the poly.h dot_interpolation twin)."""
    x = [F.of_scalar(k) for k in range(3)]
    inv_d = []
    for k in range(3):
        d = F.of_scalar(1)
        for j in range(3):
            if j != k:
                d = F.mul_i(d, F.sub_i(x[k], x[j]))
        inv_d.append(F.inv_i(d))
    return x, inv_d


def lagrange3_dev(F, rr):
    """Traced coefficient vector V with P(rr) = sum_k V[k] P(k) over
    evaluation points 0,1,2 (twin of zk/common.py _wpoly_lagrange_coef).
    rr: [L] challenge."""
    x, inv_d = _lagrange3_consts(F)
    out = []
    for k in range(3):
        t = _const(F, inv_d[k])
        for j in range(3):
            if j != k:
                t = F.mul(t, F.sub(rr, _const(F, x[j])))
        out.append(t)
    return out


def constraints_dev(F, stat: FusedStatic, leaves, alphas, pads, fs):
    """Traced twin of zk/common.py verifier_constraints: consumes the
    per-layer prove outputs (challenges g, raw polys hp, raw wc) plus
    the pad arrays, and returns (k values [L, nterms] aligned with
    stat.ws/stat.cs, input-binding alpha, fs unchanged)."""
    circ = stat.circ
    one = _const(F, F.of_scalar(1))
    k_chunks = []
    # (the claim VALUES feed only the b side of the system, which the
    # prover never uses — only the symbolic coefficients are tracked)

    for ly, layer in enumerate(circ.layers):
        logw = layer.logw
        pl = PadLayout(logw)
        nvar = pl.ovp_layer_size()
        d = leaves[ly]
        _cp_pad, hp_pad, wc_pad = pads[ly]
        alpha = alphas[ly]
        # symbolic coefficient matrix [L, nvar]
        sym = jnp.zeros((F.L, nvar), jnp.uint32)
        sym = sym.at[:, pl.ovp_claim_pad_m1(0)].set(one)
        sym = sym.at[:, pl.ovp_claim_pad_m1(1)].set(alpha)
        for rnd in range(logw):
            for hand in range(2):
                r = 2 * rnd + hand
                rr = d["g"][rnd, :, hand]
                # (the hp poly VALUES feed only the known/b side; the
                # symbolic coefficients involve just the lagrange coefs)
                lag = lagrange3_dev(F, rr)
                p0 = pl.ovp_poly_pad(r, 0)
                p2 = pl.ovp_poly_pad(r, 2)
                # p_r(1) = claim_{r-1} - p_r(0)
                sym = sym.at[:, p0].set(F.sub(sym[:, p0], one))
                sym = F.mul(sym, lag[1][:, None])
                sym = sym.at[:, p0].set(F.add(sym[:, p0], lag[0]))
                sym = sym.at[:, p2].set(F.add(sym[:, p2], lag[2]))
        eqq = d["bq"]  # logc == 0: eq_eval == 1
        tt = F.sub(d["wc"], wc_pad)  # encrypted wc, [L, 2]
        c0 = pl.ovp_claim_pad(0)
        sym = sym.at[:, c0].set(F.sub(sym[:, c0], F.mul(eqq, tt[:, 1])))
        sym = sym.at[:, c0 + 1].set(F.sub(sym[:, c0 + 1],
                                          F.mul(eqq, tt[:, 0])))
        sym = sym.at[:, c0 + 2].set(F.sub(sym[:, c0 + 2], eqq))
        k_chunks.append(sym[:, stat.layer_i0[ly]:])

    # input binding (zk_common.h:406-439)
    alpha_b, _ = dfs.dev_sample_elt(F, dfs.fs_squeeze(fs))
    last = leaves[-1]
    lw = circ.layers[-1].logw
    gmoved = jnp.moveaxis(last["g"], 0, -1)  # [L, 2, logw]
    eq0 = _eq_dev(F, lw, circ.ninputs, gmoved[:, 0, :])  # [L, ninputs]
    eq1 = _eq_dev(F, lw, circ.ninputs, gmoved[:, 1, :])
    vec = F.add(eq0, F.mul(alpha_b[:, None], eq1))
    k_chunks.append(vec[:, circ.npub_in:])
    mone = _const(F, F.neg_i(F.of_scalar(1)))
    k_chunks.append(jnp.stack([mone, F.neg(alpha_b)], axis=-1))
    return jnp.concatenate(k_chunks, axis=-1), alpha_b


def ligero_finish_dev(F, lp, stat: FusedStatic, fs, tableau, k_vals):
    """Traced twin of LigeroProver.prove (ligero_prover.h:84-146): the
    challenge draws, the grand inner-product vector A (one field
    segment-sum over the static positions), the three responses, the
    response absorption, and the column openings."""
    p = stat.p
    fs = dfs.fs_write_bytes_const(fs, HASH_OF_A)
    prf = dfs.fs_squeeze(fs)
    u_ldt, prf = dfs.dev_sample_elts(F, prf, p.nwqrow)
    alphal, prf = dfs.dev_sample_elts(F, prf, stat.nl_constraints)
    alphaq, prf = dfs.dev_sample_elts(F, prf, 3 * p.nq) if p.nq > 0 else \
        (jnp.zeros((F.L, 0), jnp.uint32), prf)
    # A[w] += k * alphal[c]  plus the quadratic-row +/- alphaq entries,
    # all in ONE lazy field segment-sum
    avals = F.mul(k_vals, jnp.take(alphal, jnp.asarray(stat.cs), axis=-1))
    qvals = jnp.take(alphaq, jnp.asarray(stat.qcols), axis=-1)
    qvals = F.select(jnp.asarray(stat.qneg), F.neg(qvals), qvals)
    all_vals = jnp.concatenate([avals, qvals], axis=-1)
    all_ws = np.concatenate([stat.ws, stat.qws])
    nA = p.nwqrow * p.w
    A = F.lazy_segment_sum(all_vals, all_ws, nA)  # [L, nA]
    u_quad, prf = dfs.dev_sample_elts(F, prf, p.nqtriples) \
        if p.nqtriples > 0 else (jnp.zeros((F.L, 0), jnp.uint32), prf)
    # layout_Aext: [0]*r prefix per row (ligero_param.h:425-430)
    A_rows = A.reshape(F.L, p.nwqrow, p.w)
    A_arr = jnp.concatenate(
        [jnp.zeros((F.L, p.nwqrow, p.r), jnp.uint32), A_rows], axis=-1)
    y_ldt, y_dot, y_quad, okq = lp._responses_core(
        tableau, u_ldt, A_arr, u_quad)
    # P -> V responses into the oracle (4 tagged arrays, like the host)
    fs = dfs.fs_write_elts(F, fs, y_ldt)
    fs = dfs.fs_write_elts(F, fs, y_dot)
    fs = dfs.fs_write_elts(F, fs, y_quad[..., : p.r])
    fs = dfs.fs_write_elts(F, fs, y_quad[..., p.block : p.dblock])
    # column openings
    prf2 = dfs.fs_squeeze(fs)
    idx, _ = dfs.dev_choose(prf2, p.block_enc - p.dblock, p.nreq)
    cols = jnp.take(tableau, idx + np.int32(p.dblock),
                    axis=tableau.ndim - 1)
    return fs, dict(y_ldt=y_ldt, y_dot=y_dot, y_quad=y_quad,
                    okq=okq, idx=idx, cols=cols)


def fused_prove_fn(sc, lp, stat: FusedStatic, metas, nvs,
                   fs, claims, W0, qds, pads, tableau):
    """The whole post-commit prove as one traced function; returns one
    packed uint32 vector (single D2H transfer)."""
    F = sc.F
    fs, leaves, eval_flags, alphas = sc._prove_core(
        fs, claims, None, qds, pads, metas, W0=W0, nvs=nvs)
    k_vals, _alpha_b = constraints_dev(F, stat, leaves, alphas, pads, fs)
    fs, lig = ligero_finish_dev(F, lp, stat, fs, tableau, k_vals)
    tree = dict(fs=fs, outs=leaves, evalok=jnp.stack(eval_flags),
                y_ldt=lig["y_ldt"], y_dot=lig["y_dot"],
                y_quad=lig["y_quad"],
                okq=lig["okq"], idx=lig["idx"], cols=lig["cols"])
    flat, _ = jax.tree_util.tree_flatten(tree)
    return _pack_fn(flat)


def fused_out_template(F, metas, p: LigeroParam, nrow_cols: int):
    """(shape, dtype) tree matching fused_prove_fn's packed output."""
    from ..sumcheck.prover_device import _out_template

    base = _out_template(F, metas, with_eval=True)
    base["y_ldt"] = ((F.L, p.block), np.uint32)
    base["y_dot"] = ((F.L, p.dblock), np.uint32)
    base["y_quad"] = ((F.L, p.dblock), np.uint32)
    base["okq"] = ((), np.bool_)
    base["idx"] = ((p.nreq,), np.int32)
    base["cols"] = ((F.L, nrow_cols, p.nreq), np.uint32)
    return base


def unpack_tree(packed: np.ndarray, template):
    """Generic inverse of _pack_fn against a (shape, dtype) tree."""
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
