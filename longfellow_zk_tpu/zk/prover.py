"""ZK prover: Longfellow composition of sumcheck + Ligero
(reference lib/zk/zk_prover.h:36-198).

Commit to [private witness | random pad], run the sumcheck prover with
the pad subtracted from every transcript message (the encrypted
transcript), then prove via Ligero that the committed pad+witness
decrypt the transcript into something the sumcheck verifier accepts.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..ligero.param import LigeroParam
from ..ligero.prover import LigeroProver
from ..sumcheck.circuit import Circuit, LayerProof, Proof
from ..sumcheck.prover_device import DeviceSumcheckProver
from ..sumcheck.transcript_sumcheck import TranscriptSumcheck
from .common import (
    HASH_OF_A,
    initialize_sumcheck_fiat_shamir,
    pad_size,
    setup_lqc,
    verifier_constraints,
)
from .proof import ZkProof


class ZkProver:
    def __init__(self, circ: Circuit, F, rs_factory, rate: int, nreq: int,
                 block_enc: Optional[int] = None, mesh=None):
        """mesh: optional jax.sharding.Mesh — runs the production prover
        multi-chip: Ligero tableau rows shard over the mesh's first
        axis, and the sumcheck's data-parallel copy axis (nc) shards
        over its last axis (prover_layers.h:34-36, SURVEY §2.15).
        Proof bytes are identical to the single-device run."""
        self.circ = circ
        self.F = F
        self.mesh = mesh
        self.rs_factory = rs_factory
        self.n_witness = circ.ninputs - circ.npub_in
        self.param = LigeroParam(
            nw=self.n_witness + pad_size(circ), nq=circ.nl, rateinv=rate,
            nreq=nreq, block_enc=block_enc,
            subfield_bytes=F.kSubFieldBytes, field_bytes=F.kBytes)
        self.lqc = setup_lqc(circ, self.n_witness)
        self.pad: Optional[Proof] = None
        self._fused_stat = None
        self.witness: Optional[List] = None
        self.lp: Optional[LigeroProver] = None
        self.sumcheck = DeviceSumcheckProver(F)

    def commit(self, zkp: ZkProof, W_host: List, ts, rng) -> None:
        """(zk_prover.h:72-100).  W_host: all input wires (public first)."""
        c, F = self.circ, self.F
        self.witness = list(W_host[c.npub_in : c.ninputs])
        subfield_boundary = max(0, c.subfield_boundary - c.npub_in)
        self._fill_pad(rng)
        self.lp = LigeroProver(self.param, F, self.rs_factory,
                               mesh=self.mesh)
        zkp.com = self.lp.commit(ts, self.witness, subfield_boundary,
                                 self.lqc, rng)

    # The all-in-one program (sumcheck + verifier constraints + Ligero
    # responses, zk/fused.py) compiles a much larger graph per term than
    # the sumcheck-only program: at SHA scale (267k terms) it OOMs the
    # TPU remote-compile helper (SIGKILL).  Keep the one-launch path for
    # small circuits only; larger ones use the phased flow whose
    # programs each stay within the compile budget (chained launches are
    # cheap; one giant compile is the expensive, fragile part).
    K_ZKFUSE_TERM_LIMIT = int(os.environ.get("LFZK_ZKFUSE_TERMS", 20_000))

    def prove(self, zkp: ZkProof, W_host: List, ts) -> bool:
        """(zk_prover.h:102-149).

        When the circuit fits the fused compile budget (and has no copy
        axis), the ENTIRE post-commit prove — circuit evaluation,
        sumcheck, verifier-constraint build, and the Ligero response
        phase — runs as ONE device program with one fetch (zk/fused.py);
        proof bytes are bit-identical to the multi-program flow below.
        A fused compile failure (helper OOM / backend crash) falls back
        to the phased flow on a restored transcript."""
        c = self.circ
        if (c.logc == 0
                and c.nterms() <= self.K_ZKFUSE_TERM_LIMIT
                and type(self.F).__name__ != "Fp2"):
            saved = ts.export_state()
            try:
                return self._prove_fused(zkp, W_host, ts)
            except (RuntimeError, OSError) as e:
                # backend/compile failures only (XlaRuntimeError is a
                # RuntimeError); programming errors must propagate, not
                # silently double the device work via the fallback
                from ..utils.log import log, WARNING
                log(WARNING, "fused prove failed (%s); phased fallback",
                    type(e).__name__)
                ts.import_state(saved)
        return self._prove_phased(zkp, W_host, ts)

    def _prove_phased(self, zkp: ZkProof, W_host: List, ts) -> bool:
        c, F = self.circ, self.F
        assert self.lp is not None, "must run commit before prove"
        initialize_sumcheck_fiat_shamir(ts, c, W_host, F)
        tst = ts.clone()

        # device witness [L.., ninputs, 1]
        lead = (8,) if F.kCharacteristicTwo else \
            ((2, F.L) if type(F).__name__ == "Fp2" else (F.L,))
        # W_host is wire-major, copy-minor (flat[w*nc + c]); the device
        # witness keeps the copy axis explicit
        W0 = jnp.asarray(F.to_limbs(W_host)).reshape(
            lead + (c.ninputs // c.nc, c.nc))
        if self.mesh is not None and c.nc > 1:
            # copy-parallel circuits: shard the copy axis (the wire axis
            # stays local; reductions over copies become one psum of
            # integer byte-column accumulators — exact)
            from jax.sharding import NamedSharding, PartitionSpec as P

            ax = self.mesh.axis_names[-1]
            if c.nc % self.mesh.shape[ax] == 0:
                W0 = jax.device_put(W0, NamedSharding(
                    self.mesh, P(*([None] * len(lead)), None, ax)))
        # fused evaluation + sumcheck: one device program, one fetch
        tsts = TranscriptSumcheck(tst, F)
        proof, aux, _bnd = self.sumcheck.prove_with_witness(
            c, W0, tsts, pad=self.pad, with_aux=True)
        if proof is None:
            return False
        zkp.proof = proof

        a, b, ci = verifier_constraints(c, W_host, proof, aux, ts,
                                        self.n_witness, F)
        zkp.com_proof = self.lp.prove(ts, ci, a, HASH_OF_A, self.lqc)
        return True

    def _fill_pad(self, rng) -> None:
        """Random pad; the P(1) entries are zero (zk_prover.h:152-188)."""
        c, F = self.circ, self.F
        self.pad = Proof()
        for layer in c.layers:
            lp = LayerProof(cp=[], hp=[[], []], wc=[None, None])
            for _ in range(c.logc):
                poly = []
                for k in range(4):
                    if k != 1:
                        r = F.sample(rng.bytes)
                        poly.append(r)
                        self.witness.append(r)
                    else:
                        poly.append(F.of_scalar(0))
                lp.cp.append(poly)
            for _ in range(layer.logw):
                for h in range(2):
                    poly = []
                    for k in range(3):
                        if k != 1:
                            r = F.sample(rng.bytes)
                            poly.append(r)
                            self.witness.append(r)
                        else:
                            poly.append(F.of_scalar(0))
                    lp.hp[h].append(poly)
            for k in range(2):
                r = F.sample(rng.bytes)
                lp.wc[k] = r
                self.witness.append(r)
            self.witness.append(F.mul_i(lp.wc[0], lp.wc[1]))
            self.pad.layers.append(lp)

    def _prove_fused(self, zkp: ZkProof, W_host: List, ts) -> bool:
        """One-program prove (zk/fused.py): launch once, fetch once."""
        import jax

        from ..ligero.param import LigeroProof
        from ..ligero.transcript import gen_idx
        from ..random_oracle import device_fs as dfs
        from .fused import (
            FusedStatic,
            fused_out_template,
            fused_prove_fn,
            unpack_tree,
        )

        c, F, sc = self.circ, self.F, self.sumcheck
        p = self.param
        assert self.lp is not None, "must run commit before prove"
        initialize_sumcheck_fiat_shamir(ts, c, W_host, F)

        W0 = jnp.asarray(F.to_limbs(W_host)).reshape(F.L, c.ninputs, 1)
        logc, nc = c.logc, c.nc
        logv = c.logv
        layer_meta, qds, pads, nvs = [], [], [], []
        for ly in range(c.nl):
            layer = c.layers[ly]
            nvs.append(c.layers[ly - 1].nw if ly > 0 else c.nv)
            plan, arrs = sc._wm_for(layer.quad, layer.logw)
            qd = sc._quad_dev_eval(layer.quad, nvs[-1])
            qds.append({**qd, **arrs} if arrs else qd)
            pads.append(sc._pads_dev(
                self.pad.layers[ly] if self.pad else None, logc, layer.logw))
            layer_meta.append((logv, layer.logw, plan))
            logv = layer.logw
        metas = ((logc, nc), tuple(layer_meta))
        nvs = tuple(nvs)

        if self._fused_stat is None:
            self._fused_stat = FusedStatic(c, p, self.lqc, self.n_witness)
        stat = self._fused_stat

        fs = dfs.fs_init_from_host(ts)
        claims = jnp.zeros((F.L, 2), jnp.uint32)
        key = ("zkfused", self.lp.fp, metas, nvs,
               tuple(q["h0"].shape[0] for q in qds), W0.shape,
               self.lp.tableau_dev.shape)
        if key not in sc._layer_jit:
            def fn(fs, claims, W0, qds, pads, tableau):
                return fused_prove_fn(sc, self.lp, stat, metas, nvs,
                                      fs, claims, W0, qds, pads, tableau)

            sc._layer_jit[key] = jax.jit(fn)
        packed = np.asarray(sc._layer_jit[key](
            fs, claims, W0, qds, pads, self.lp.tableau_dev))
        tree = unpack_tree(packed, fused_out_template(F, metas, p, p.nrow))
        if not bool(np.asarray(tree["evalok"]).all()):
            return False
        assert bool(tree["okq"]), "W part of y_quad is nonzero"

        proof, _aux, _ = sc._assemble(c, self.pad, False, tree["fs"],
                                      tree["outs"], ts)
        zkp.proof = proof

        # --- Ligero proof assembly (host scalars from the one fetch) ---
        lproof = LigeroProof()
        lproof.y_ldt = list(F.from_limbs(tree["y_ldt"]))
        lproof.y_dot = list(F.from_limbs(tree["y_dot"]))
        yq = F.from_limbs(tree["y_quad"])
        lproof.y_quad_0 = list(yq[: p.r])
        lproof.y_quad_2 = list(yq[p.block : p.dblock])
        # host transcript replay of the column choose doubles as a
        # cross-check of the on-device Fiat-Shamir stream
        idx = gen_idx(p, ts, F)
        assert idx == [int(i) for i in tree["idx"]], \
            "device/host column-open indices diverge"
        colv = F.from_limbs(tree["cols"])  # [nrow, nreq]
        lproof.req = [list(colv[i]) for i in range(p.nrow)]
        path, nonces = self.lp.mc.open(idx)
        lproof.merkle_path = path
        lproof.merkle_nonce = nonces
        zkp.com_proof = lproof
        return True
