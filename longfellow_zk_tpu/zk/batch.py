"""Batched ZK proving: many proofs of the SAME circuit per launch.

The TPU's throughput story: a single proof is latency-bound (hundreds of
small sequential rounds), but every stage of the one-program prove
(zk/fused.py) is shape-uniform across proofs of one circuit, so the
whole pipeline vmaps over a proof axis:

  launch 1: B commits   (RS encode + tableau + column hash + merkle)
  launch 2: B full proves (eval + sumcheck + constraints + Ligero)

Per-proof Fiat-Shamir streams stay byte-exact twins of the host
transcripts (the rejection samplers guard accepted lanes' PRF state, so
each lane's byte stream is identical to its scalar run).

Use one `BatchZkProver` per circuit; `prove_batch` returns one
serialized proof per witness, each bit-identical to what the scalar
ZkProver would have produced with the same transcript tag and
randomness stream (tests/test_zk_batch.py).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ligero.param import (
    LigeroCommitment,
    LigeroParam,
    LigeroProof,
    inner_product_vector,
    layout_Aext,
)
from ..ligero.prover import LigeroProver
from ..ligero.transcript import (
    gen_alphal,
    gen_alphaq,
    gen_idx,
    gen_uldt,
    gen_uquad,
    write_commitment,
)
from ..random_oracle import device_fs as dfs
from ..sumcheck.circuit import Circuit
from .common import (
    HASH_OF_A,
    initialize_sumcheck_fiat_shamir,
    pad_size,
    setup_lqc,
    verifier_constraints,
)
from .fused import (
    FusedStatic,
    fused_out_template,
    fused_prove_fn,
    unpack_tree,
)
from .proof import ZkProof
from .prover import ZkProver
from .serialization import write_zk_proof

_JIT = {}


def _stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


class BatchZkProver:
    """Proves batches of witnesses for one circuit (same shapes, same
    Ligero parameters — the serving configuration)."""

    def __init__(self, circ: Circuit, F, rs_factory, rate: int, nreq: int,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh — shards the PROOF axis over
        the mesh's first axis (pure data parallelism: each chip proves
        its slice of the batch, no cross-chip traffic; the serving-fleet
        scale axis)."""
        self.circ = circ
        self.F = F
        self.rate = rate
        self.nreq = nreq
        self.mesh = mesh
        self.rs_factory = rs_factory
        # a template scalar prover provides param/lqc/static data
        self.proto = ZkProver(circ, F, rs_factory, rate=rate, nreq=nreq)
        self.param: LigeroParam = self.proto.param
        self.lqc = self.proto.lqc
        self.stat = FusedStatic(circ, self.param, self.lqc,
                                self.proto.n_witness)

    def prove_batch(self, W_list: Sequence[List], ts_list, rng) -> List[bytes]:
        """W_list: B witness vectors; ts_list: B independent transcripts
        (already initialized with their tags).  Returns B serialized
        proofs.  Raises on any unsatisfied witness."""
        c, F, p = self.circ, self.F, self.param
        B = len(W_list)
        assert B == len(ts_list)
        sc = self.proto.sumcheck

        # ---- per-proof host prep ------------------------------------
        provers = []
        commit_in = []
        for W in W_list:
            pr = ZkProver(c, F, self.rs_factory, rate=self.rate,
                          nreq=self.nreq)
            pr.witness = list(W[c.npub_in : c.ninputs])
            pr._fill_pad(rng)
            pr.lp = LigeroProver(p, F, self.rs_factory)
            sb = max(0, c.subfield_boundary - c.npub_in)
            arr_b, arr_d, nonces, nonce_arr = pr.lp._commit_prep(
                pr.witness, sb, self.lqc, rng)
            provers.append(pr)
            commit_in.append((arr_b, arr_d, nonces, nonce_arr))

        # ---- launch 1: batched commit --------------------------------
        arr_b = self._dp(jnp.asarray(np.stack([x[0] for x in commit_in])))
        arr_d = self._dp(jnp.asarray(np.stack([x[1] for x in commit_in])))
        nonce = self._dp(jnp.asarray(np.stack([x[3] for x in commit_in])))
        ckey = ("bcommit", provers[0].lp.fp, arr_b.shape, arr_d.shape)
        if ckey not in _JIT:
            _JIT[ckey] = jax.jit(jax.vmap(
                provers[0].lp._commit_full_fn))
        import os
        dbg = os.environ.get("LFZK_BATCH_DEBUG") == "1"
        if dbg:
            print("batch: commit launch", flush=True)
        tableau, leaves_dev, roots_dev = _JIT[ckey](arr_b, arr_d, nonce)
        leaves_np = np.asarray(leaves_dev)
        if dbg:
            print("batch: commit fetched", flush=True)
        roots_np = np.asarray(roots_dev)

        zkps = []
        for i, pr in enumerate(provers):
            leaves = [leaves_np[i, j].tobytes()
                      for j in range(p.block_ext)]
            root = pr.lp.mc.commit_leaves(leaves, commit_in[i][2])
            assert root == roots_np[i].tobytes()
            zkp = ZkProof(rate=self.rate, nreq=self.nreq)
            zkp.com = LigeroCommitment(root=root)
            write_commitment(zkp.com, ts_list[i])
            initialize_sumcheck_fiat_shamir(ts_list[i], c, W_list[i], F)
            zkps.append(zkp)

        # Fp2's (2, L, ...) limb layout and circuits past the vmapped
        # single-program sumcheck budget take the per-proof scalar path;
        # mid-size circuits past the one-program ZK budget use the
        # 4-launch phased batch (see ZkProver.K_ZKFUSE_TERM_LIMIT).
        if (type(F).__name__ == "Fp2"
                or c.nterms() > sc.K_FUSE_TERM_LIMIT):
            return self._scalar_fallback(W_list, ts_list, provers, zkps)
        if c.logc > 0 or c.nterms() > ZkProver.K_ZKFUSE_TERM_LIMIT:
            return self._phased_batch(W_list, ts_list, provers, zkps,
                                      tableau)

        # ---- launch 2: batched fused prove ---------------------------
        logc, nc = c.logc, c.nc
        logv = c.logv
        layer_meta, qds, nvs = [], [], []
        for ly in range(c.nl):
            layer = c.layers[ly]
            nvs.append(c.layers[ly - 1].nw if ly > 0 else c.nv)
            plan, arrs = sc._wm_for(layer.quad, layer.logw)
            qd = sc._quad_dev_eval(layer.quad, nvs[-1])
            qds.append({**qd, **arrs} if arrs else qd)
            layer_meta.append((logv, layer.logw, plan))
            logv = layer.logw
        metas = ((logc, nc), tuple(layer_meta))
        nvs = tuple(nvs)

        pads_b = self._dp_tree(_stack([
            [sc._pads_dev(pr.pad.layers[ly], logc, c.layers[ly].logw)
             for ly in range(c.nl)]
            for pr in provers]))
        fs_b = self._dp_tree(_stack(
            [dfs.fs_init_from_host(ts) for ts in ts_list]))
        W0_b = self._dp(jnp.asarray(np.stack([
            np.asarray(F.to_limbs(W)).reshape(F.L, c.ninputs, 1)
            for W in W_list])))
        claims_b = self._dp(jnp.zeros((B, F.L, 2), jnp.uint32))

        stat = self.stat
        lp0 = provers[0].lp
        pkey = ("bprove", F.name, metas, nvs, B,
                tuple(q["h0"].shape[0] for q in qds), W0_b.shape,
                p.block_enc, p.nreq)
        if pkey not in _JIT:
            def fn(fs, claims, W0, pads, tableau, qds):
                return fused_prove_fn(sc, lp0, stat, metas, nvs,
                                      fs, claims, W0, qds, pads, tableau)

            _JIT[pkey] = jax.jit(jax.vmap(
                fn, in_axes=(0, 0, 0, 0, 0, None)))
        if dbg:
            print("batch: prove launch", flush=True)
        packed = np.asarray(_JIT[pkey](
            fs_b, claims_b, W0_b, pads_b, tableau, qds))
        if dbg:
            print("batch: prove fetched", flush=True)

        # ---- per-proof host assembly ---------------------------------
        template = fused_out_template(F, metas, p, p.nrow)
        return self._assemble_fused(packed, template, provers, zkps,
                                    ts_list)

    def _dp(self, x):
        """Shard a [B, ...] stacked array over the mesh's first axis
        (data-parallel proof axis); identity without a mesh."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        ax = self.mesh.axis_names[0]
        return jax.device_put(
            x, NamedSharding(self.mesh, P(ax, *([None] * (x.ndim - 1)))))

    def _dp_tree(self, tree):
        return jax.tree_util.tree_map(self._dp, tree)

    def _scalar_fallback(self, W_list, ts_list, provers, zkps
                         ) -> List[bytes]:
        """Per-proof prove loop for shapes the vmapped pipelines don't
        cover (Fp2 limb layout; circuits beyond the single-program
        sumcheck budget, which prove chunked).  Commit was already
        batched; proof bytes match the scalar ZkProver."""
        from ..sumcheck.transcript_sumcheck import TranscriptSumcheck

        c, F, p = self.circ, self.F, self.param
        sc = self.proto.sumcheck
        lead = (8,) if F.kCharacteristicTwo else \
            ((2, F.L) if type(F).__name__ == "Fp2" else (F.L,))
        out = []
        for i, pr in enumerate(provers):
            ts = ts_list[i]
            tst = ts.clone()
            W0 = jnp.asarray(F.to_limbs(W_list[i])).reshape(
                lead + (c.ninputs, 1))
            proof, aux, _ = sc.prove_with_witness(
                c, W0, TranscriptSumcheck(tst, F), pad=pr.pad,
                with_aux=True)
            assert proof is not None, \
                f"witness {i} does not satisfy the circuit"
            zkps[i].proof = proof
            a, _b, ci = verifier_constraints(
                c, W_list[i], proof, aux, ts, self.proto.n_witness, F)
            zkps[i].com_proof = pr.lp.prove(ts, ci, a, HASH_OF_A,
                                            self.lqc)
            out.append(write_zk_proof(zkps[i], c, p, F))
        return out

    def _phased_batch(self, W_list, ts_list, provers, zkps,
                      tableau) -> List[bytes]:
        """Batched phased flow for circuits past the one-program budget:
        vmapped sumcheck (launch 2), host verifier-constraint replay per
        proof, vmapped Ligero responses (launch 3), vmapped column
        openings (launch 4).  Proof bytes identical to B scalar
        ZkProver._prove_phased runs."""
        c, F, p = self.circ, self.F, self.param
        B = len(W_list)
        sc = self.proto.sumcheck
        from ..sumcheck.prover_device import _out_template, _unpack
        assert c.nterms() <= sc.K_FUSE_TERM_LIMIT, \
            "phased batch needs the single-program sumcheck"

        logc, nc = c.logc, c.nc
        logv = c.logv
        layer_meta, qds, nvs = [], [], []
        for ly in range(c.nl):
            layer = c.layers[ly]
            nvs.append(c.layers[ly - 1].nw if ly > 0 else c.nv)
            plan, arrs = sc._wm_for(layer.quad, layer.logw)
            qd = sc._quad_dev_eval(layer.quad, nvs[-1])
            qds.append({**qd, **arrs} if arrs else qd)
            layer_meta.append((logv, layer.logw, plan))
            logv = layer.logw
        metas = ((logc, nc), tuple(layer_meta))
        nvs = tuple(nvs)

        pads_b = _stack([
            [sc._pads_dev(pr.pad.layers[ly], logc, c.layers[ly].logw)
             for ly in range(c.nl)]
            for pr in provers])
        tsts = [ts.clone() for ts in ts_list]
        fs_b = self._dp_tree(_stack(
            [dfs.fs_init_from_host(t) for t in tsts]))
        W0_b = self._dp(jnp.asarray(np.stack([
            np.asarray(F.to_limbs(W)).reshape(F.L, c.ninputs, 1)
            for W in W_list])))
        claims_b = self._dp(jnp.zeros((B, F.L, 2), jnp.uint32))

        skey = ("bprovew", F.name, metas, nvs, B,
                tuple(q["h0"].shape[0] for q in qds), W0_b.shape)
        if skey not in _JIT:
            def fn(fs, claims, W0, pads, qds):
                return sc._prove_all_fn(fs, claims, None, qds, pads,
                                        metas, W0=W0, nvs=nvs)

            _JIT[skey] = jax.jit(jax.vmap(
                fn, in_axes=(0, 0, 0, 0, None)))
        packed = np.asarray(_JIT[skey](fs_b, claims_b, W0_b, pads_b, qds))

        template = _out_template(F, metas, with_eval=True)
        lqc = self.lqc
        A_rows = []
        cis = []
        for i, pr in enumerate(provers):
            fs_np, douts, evalok = _unpack(packed[i], template)
            assert bool(np.asarray(evalok).all()), \
                f"witness {i} does not satisfy the circuit"
            proof, aux, _ = sc._assemble(c, pr.pad, True, fs_np, douts,
                                         tsts[i])
            zkps[i].proof = proof
            a, _b, ci = verifier_constraints(
                c, W_list[i], proof, aux, ts_list[i],
                self.proto.n_witness, F)
            A_rows.append(a)
            cis.append(ci)

        # ---- launch 3: batched Ligero responses ----------------------
        lp0 = provers[0].lp
        u_ldt_l, A_l, u_quad_l = [], [], []
        for i, ts in enumerate(ts_list):
            ts.write_bytes(HASH_OF_A)
            u_ldt = gen_uldt(p, ts, F)
            alphal = gen_alphal(cis[i], ts, F)
            alphaq = gen_alphaq(p, ts, F)
            A = inner_product_vector(F, p, cis[i], A_rows[i], alphal, lqc,
                                     alphaq)
            u_quad = gen_uquad(p, ts, F)
            u_ldt_l.append(np.asarray(F.to_limbs(u_ldt)))
            aflat = [v for r in range(p.nwqrow)
                     for v in layout_Aext(F, p, r, A)]
            A_l.append(np.asarray(F.to_limbs(aflat)).reshape(
                (F.L, p.nwqrow, p.block)))
            u_quad_l.append(np.asarray(F.to_limbs(u_quad)))
        u_ldt_b = jnp.asarray(np.stack(u_ldt_l))
        A_b = jnp.asarray(np.stack(A_l))
        u_quad_b = jnp.asarray(np.stack(u_quad_l))
        rkey = ("bresp", lp0.fp, tableau.shape, A_b.shape)
        if rkey not in _JIT:
            _JIT[rkey] = jax.jit(jax.vmap(lp0._responses_fn))
        flat = np.asarray(_JIT[rkey](tableau, u_ldt_b, A_b, u_quad_b))

        lead = (F.L,)
        nl_ = int(np.prod(lead + (p.block,)))
        nd_ = int(np.prod(lead + (p.dblock,)))
        lproofs = []
        for i, ts in enumerate(ts_list):
            got = flat[i]
            lproof = LigeroProof()
            y_ldt = F.from_limbs(got[:nl_].reshape(lead + (p.block,)))
            y_dot = F.from_limbs(
                got[nl_ : nl_ + nd_].reshape(lead + (p.dblock,)))
            yq = F.from_limbs(
                got[nl_ + nd_ : nl_ + 2 * nd_].reshape(lead + (p.dblock,)))
            assert got[-1] == 1, "W part of y_quad is nonzero"
            lproof.y_ldt = list(y_ldt)
            lproof.y_dot = list(y_dot)
            lproof.y_quad_0 = list(yq[: p.r])
            lproof.y_quad_2 = list(yq[p.block : p.dblock])
            ts.write_elts(lproof.y_ldt, F)
            ts.write_elts(lproof.y_dot, F)
            ts.write_elts(lproof.y_quad_0, F)
            ts.write_elts(lproof.y_quad_2, F)
            lproofs.append(lproof)

        # ---- launch 4: batched column openings -----------------------
        idx_l = [gen_idx(p, ts, F) for ts in ts_list]
        idx_b = jnp.asarray(np.asarray(idx_l, np.int32) + p.dblock)
        gkey = ("bcols", lp0.fp, tableau.shape, idx_b.shape)
        if gkey not in _JIT:
            _JIT[gkey] = jax.jit(jax.vmap(
                lambda t, i: jnp.take(t, i, axis=t.ndim - 1)))
        cols = np.asarray(_JIT[gkey](tableau, idx_b))

        out = []
        for i, pr in enumerate(provers):
            colv = F.from_limbs(cols[i])  # [nrow, nreq]
            lproofs[i].req = [list(colv[r]) for r in range(p.nrow)]
            path, nonces = pr.lp.mc.open(idx_l[i])
            lproofs[i].merkle_path = path
            lproofs[i].merkle_nonce = nonces
            zkps[i].com_proof = lproofs[i]
            out.append(write_zk_proof(zkps[i], c, p, F))
        return out

    def _assemble_fused(self, packed, template, provers, zkps, ts_list
                        ) -> List[bytes]:
        c, F, p = self.circ, self.F, self.param
        sc = self.proto.sumcheck
        out = []
        for i, pr in enumerate(provers):
            tree = unpack_tree(packed[i], template)
            assert bool(np.asarray(tree["evalok"]).all()), \
                f"witness {i} does not satisfy the circuit"
            assert bool(tree["okq"])
            proof, _aux, _ = sc._assemble(c, pr.pad, False, tree["fs"],
                                          tree["outs"], ts_list[i])
            zkps[i].proof = proof
            lproof = LigeroProof()
            lproof.y_ldt = list(F.from_limbs(tree["y_ldt"]))
            lproof.y_dot = list(F.from_limbs(tree["y_dot"]))
            yq = F.from_limbs(tree["y_quad"])
            lproof.y_quad_0 = list(yq[: p.r])
            lproof.y_quad_2 = list(yq[p.block : p.dblock])
            idx = gen_idx(p, ts_list[i], F)
            assert idx == [int(v) for v in tree["idx"]], \
                "device/host column-open indices diverge"
            colv = F.from_limbs(tree["cols"])
            lproof.req = [list(colv[r]) for r in range(p.nrow)]
            path, nonces = pr.lp.mc.open(idx)
            lproof.merkle_path = path
            lproof.merkle_nonce = nonces
            zkps[i].com_proof = lproof
            out.append(write_zk_proof(zkps[i], c, p, F))
        return out
