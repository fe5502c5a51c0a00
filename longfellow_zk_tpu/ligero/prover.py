"""Ligero prover: commit (RS-encoded tableau + Merkle column hashes) and
prove (low-degree / linear / quadratic tests + column openings).

Semantic twin of reference lib/ligero/ligero_prover.h:34-356, rebuilt
around batched device Reed-Solomon: every tableau row group with the
same input width is encoded in ONE call over a [rows, n] batch (the
reference encodes row-by-row), which is the natural shard/batch axis for
the TPU mesh (SURVEY §2.15).

The prove responses (y_ldt/y_dot/y_quad, ligero_prover.h:283-350) run as
ONE jitted device program over the resident tableau — batched row
combinations + the Aext interpolation — with a single packed fetch; all
Fiat-Shamir challenges for them come from one host squeeze phase (no
writes interleave, ligero_transcript.h).  Column openings are a device
gather.  Nothing pulls the tableau to host scalars.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..merkle.merkle import MerkleCommitment, NONCE_LEN, leaf_hash
from .param import (
    LigeroCommitment,
    LigeroParam,
    LigeroProof,
    inner_product_vector,
    layout_Aext,
)
from .transcript import (
    gen_alphal,
    gen_alphaq,
    gen_idx,
    gen_uldt,
    gen_uquad,
    write_commitment,
)


# Global jit cache: traces are expensive and provers are constructed per
# proof; programs are pure functions of (field, FULL Ligero layout, RS
# factory) so they are shared across instances.  The traced bodies close
# over self.p (row indices, r/w split) and self.rs_factory (omega), so
# every cache key must carry a complete fingerprint of both — shapes
# alone are NOT sufficient (two layouts with equal tableau shapes but
# different nreq slice y_quad differently).
_JIT_CACHE = {}


def param_fingerprint(p: LigeroParam) -> tuple:
    return (p.nw, p.nq, p.rateinv, p.nreq, p.block, p.dblock, p.block_enc,
            p.block_ext, p.r, p.w, p.nwrow, p.nqtriples, p.nrow,
            p.ildt, p.idot, p.iquad, p.iw, p.iq)


class LigeroProver:
    def __init__(self, p: LigeroParam, F, rs_factory: Callable,
                 mesh=None):
        """rs_factory(n, m) -> encoder with .interpolate(device [L.., rows, n])
        returning [L.., rows, m]).

        mesh: optional jax.sharding.Mesh — the tableau ROWS (independent
        RS encodes, row hashes, response dot products) are sharded over
        the mesh's first axis; XLA inserts the collectives.  Proof bytes
        are identical to the single-device run (integer byte-column
        reductions commute exactly)."""
        self.p = p
        self.F = F
        self.rs_factory = rs_factory
        self.mesh = mesh
        self.mc = MerkleCommitment(p.block_ext)
        self.tableau_dev = None  # device limbs [L.., nrow, block_enc]
        # cache identity: full layout + RS factory identity (factories
        # built by zk.testing.rs_factory_for carry a content fingerprint;
        # ad-hoc factories fall back to object identity)
        self.fp = (F.name, param_fingerprint(p),
                   getattr(rs_factory, "fingerprint", None) or
                   ("id", id(rs_factory)))

    # ------------------------------------------------------------------

    def _commit_prep(self, W_host: Sequence, subfield_boundary: int, lqc,
                     rng):
        """Host-side tableau-row construction (witness blocks, blinding
        rows, quadratic triples, nonces): everything the device commit
        program needs, as numpy arrays — shared by the single-proof
        commit and the batched prover (zk/batch.py)."""
        p, F = self.p, self.F
        for i in range(subfield_boundary):
            assert F.in_subfield(W_host[i]), "element not in subfield"

        zero = F.of_scalar(0)

        def rand_row(n):
            return [F.sample(rng.bytes) for _ in range(n)]

        def rand_subfield_row(n):
            return [F.sample_subfield(rng.bytes) for _ in range(n)]

        # --- block-width rows (ildt, witness, quadratic) ---
        block_rows = []  # list of [block] host scalars
        # ildt
        block_rows.append(rand_row(p.block))
        # witness rows
        for i in range(p.nwrow):
            subfield_only = (i + 1) * p.w <= subfield_boundary
            blinds = rand_subfield_row(p.r) if subfield_only else rand_row(p.r)
            chunk = list(W_host[i * p.w : min((i + 1) * p.w, p.nw)])
            chunk += [zero] * (p.w - len(chunk))
            block_rows.append(blinds + chunk)
        # quadratic rows x, y, z
        qx, qy, qz = [], [], []
        for i in range(p.nqtriples):
            bx, by, bz = rand_row(p.r), rand_row(p.r), rand_row(p.r)
            cx = [zero] * p.w
            cy = [zero] * p.w
            cz = [zero] * p.w
            for j in range(p.w):
                iw = j + i * p.w
                if iw >= p.nq:
                    break
                l = lqc[iw]
                assert W_host[l.z] == F.mul_i(W_host[l.x], W_host[l.y]), \
                    "invalid quadratic constraints"
                cx[j] = W_host[l.x]
                cy[j] = W_host[l.y]
                cz[j] = W_host[l.z]
            qx.append(bx + cx)
            qy.append(by + cy)
            qz.append(bz + cz)
        block_rows += qx + qy + qz

        # --- dblock-width rows (idot, iquad) ---
        # dot-blinding row constrained so the W part sums to zero
        # (ligero_prover.h:188-194): subtract the W-part sum from W[0]
        idot = rand_row(p.dblock)
        s = zero
        for v in idot[p.r : p.r + p.w]:
            s = F.add_i(s, v)
        idot[p.r] = F.sub_i(idot[p.r], s)
        iquad = rand_row(p.dblock)
        for j in range(p.w):
            iquad[p.r + j] = zero

        lead = (8,) if F.kCharacteristicTwo else \
            ((2, F.L) if type(F).__name__ == "Fp2" else (F.L,))
        nbr = len(block_rows)
        flatb = [v for row in block_rows for v in row]
        arr_b = np.asarray(F.to_limbs(flatb)).reshape(lead + (nbr, p.block))
        flatd = idot + iquad
        arr_d = np.asarray(F.to_limbs(flatd)).reshape(lead + (2, p.dblock))

        nonces = [rng.bytes(NONCE_LEN) for _ in range(p.block_ext)]
        nonce_arr = np.frombuffer(b"".join(nonces), dtype=np.uint8).reshape(
            p.block_ext, NONCE_LEN)
        return arr_b, arr_d, nonces, nonce_arr

    def commit(self, ts, W_host: Sequence, subfield_boundary: int, lqc,
               rng) -> LigeroCommitment:
        """Build+encode the tableau, Merkle-commit columns
        (ligero_prover.h:58-79)."""
        p, F = self.p, self.F
        arr_b, arr_d, nonces, nonce_arr = self._commit_prep(
            W_host, subfield_boundary, lqc, rng)
        arr_b = jnp.asarray(arr_b)
        arr_d = jnp.asarray(arr_d)

        # Host-Merkle route: device RS encode + tableau only, column
        # hashing + Merkle on the host (native C SHA-256).  Same root,
        # same proof bytes.  Default for large tableaux — the fully
        # fused commit program at mdoc scale (block_ext ~3.3k x 40-block
        # columns) takes the remote-compile helper >1 h, while the
        # host hash costs ~100 ms on the native SHA.  LFZK_HOST_MERKLE
        # forces it on (1) or off (0).
        import os as _os

        hm = _os.environ.get("LFZK_HOST_MERKLE")
        if hm == "1" or (hm != "0" and p.block_ext > 2048):
            return self._commit_host_merkle(ts, arr_b, arr_d, nonces)

        # One device program: RS encode + tableau + natural serialization
        # + per-column leaf hashing + Merkle tree reduce.  Only the leaf
        # digests and the root cross the host boundary (the tableau
        # stays device-resident for prove); the host rebuilds the tree
        # from the leaves for proof opening.
        key = ("commitf", self.fp, arr_b.shape, arr_d.shape,
               id(self.mesh) if self.mesh is not None else None)
        if key not in _JIT_CACHE:
            if self.mesh is None:
                _JIT_CACHE[key] = jax.jit(self._commit_full_fn)
            else:
                # shard the tableau ROWS over the mesh's first axis —
                # in-program constraint (supports uneven row counts;
                # GSPMD pads).  The single-device HLO is untouched.
                from jax.sharding import NamedSharding, PartitionSpec as P

                ax = self.mesh.axis_names[0]
                spec = [None] * arr_b.ndim
                spec[arr_b.ndim - 2] = ax
                sh = NamedSharding(self.mesh, P(*spec))

                def fn(ab, ad, nz, _f=self._commit_full_fn, _sh=sh):
                    return _f(jax.lax.with_sharding_constraint(ab, _sh),
                              ad, nz)

                _JIT_CACHE[key] = jax.jit(fn)
        tableau, leaves_dev, root_dev = _JIT_CACHE[key](
            arr_b, arr_d, jnp.asarray(nonce_arr))
        self.tableau_dev = tableau
        leaves_np = np.asarray(leaves_dev)
        leaves = [leaves_np[j].tobytes() for j in range(p.block_ext)]
        root = self.mc.commit_leaves(leaves, nonces)
        assert root == np.asarray(root_dev).tobytes(), \
            "device/host Merkle root mismatch"
        commitment = LigeroCommitment(root=root)
        write_commitment(commitment, ts)
        return commitment

    def _commit_host_merkle(self, ts, arr_b, arr_d, nonces):
        """Commit with device RS encode + host column hashing (same
        root/proof bytes as the fused program)."""
        from ..utils.crypto import sha256 as _sha256

        p, F = self.p, self.F
        key = ("committ", self.fp, arr_b.shape, arr_d.shape)
        if key not in _JIT_CACHE:
            _JIT_CACHE[key] = jax.jit(self._commit_fn)
        tableau, nat = _JIT_CACHE[key](arr_b, arr_d)
        self.tableau_dev = tableau
        nat_np = np.asarray(nat)
        bya = F.natural_limbs_to_bytes_np(nat_np)  # [nrow, block_enc, kB]
        ext = bya[:, p.dblock :, :]  # [nrow, block_ext, kB]
        cols = np.transpose(ext, (1, 0, 2)).reshape(p.block_ext, -1)
        leaves = [_sha256(nonces[j] + cols[j].tobytes())
                  for j in range(p.block_ext)]
        root = self.mc.commit_leaves(leaves, nonces)
        commitment = LigeroCommitment(root=root)
        write_commitment(commitment, ts)
        return commitment

    # ------------------------------------------------------------------

    def _commit_fn(self, arr_b, arr_d):
        """RS-encode both width groups, assemble the tableau in row order
        [ildt, idot, iquad, iw.., iq..], and convert to natural form for
        the Merkle column hashing — as one device program."""
        p, F = self.p, self.F
        rs_block = self.rs_factory(p.block, p.block_enc)
        rs_dblock = self.rs_factory(p.dblock, p.block_enc)
        enc_b = rs_block.interpolate(arr_b)  # [L.., nbr, block_enc]
        enc_d = rs_dblock.interpolate(arr_d)
        ax = arr_b.ndim - 2
        nbr = arr_b.shape[ax]
        tableau = jnp.concatenate(
            [
                jax.lax.slice_in_dim(enc_b, 0, 1, axis=ax),
                enc_d,
                jax.lax.slice_in_dim(enc_b, 1, nbr, axis=ax),
            ],
            axis=ax,
        )
        return tableau, F.from_mont_device(tableau)

    def _commit_full_fn(self, arr_b, arr_d, nonce_arr):
        """_commit_fn + column leaf hashing + Merkle root, fully
        in-program (ligero_prover.h:58-79 incl. the merkle commit)."""
        from ..merkle.merkle_jax import merkle_root_dev, sha256_msgs_dev

        p, F = self.p, self.F
        tableau, nat = self._commit_fn(arr_b, arr_d)
        bdev = F.natural_limbs_to_bytes_dev(nat)  # [nrow, block_enc, kB]
        ext = bdev[:, p.dblock :, :]  # [nrow, block_ext, kB]
        cols = jnp.transpose(ext, (1, 0, 2)).reshape(p.block_ext, -1)
        msgs = jnp.concatenate([nonce_arr, cols], axis=1)
        leaves = sha256_msgs_dev(msgs)
        return tableau, leaves, merkle_root_dev(leaves)

    def _responses_core(self, T, u_ldt, A_arr, u_quad):
        """Traced core of the three Ligero tests
        (ligero_prover.h:283-350): returns (y_ldt, y_dot, y_quad, okq)
        as device arrays, for composition into larger programs."""
        p, F = self.p, self.F
        rax = T.ndim - 2  # row axis
        nlead = T.ndim - 2

        def row(i):
            return jnp.take(T, i, axis=rax)

        def rows(lo, hi):
            return jax.lax.slice_in_dim(T, lo, hi, axis=rax)

        wrows = rows(p.iw, p.iw + p.nwqrow)
        # low-degree test: ildt + sum_i u_i * w_i over [0, block)
        t0 = F.mul(u_ldt[..., :, None], wrows[..., : p.block])
        y_ldt = F.add(row(p.ildt)[..., : p.block],
                      F.lazy_sum(t0, axis=nlead - 1))
        # dot test: idot + sum_i Aext_i o w_i over [0, dblock)
        rs = self.rs_factory(p.block, p.dblock)
        aext = rs.interpolate(A_arr)  # [L.., nwqrow, dblock]
        t1 = F.mul(aext, wrows[..., : p.dblock])
        y_dot = F.add(row(p.idot)[..., : p.dblock],
                      F.lazy_sum(t1, axis=nlead - 1))
        # quadratic test: iquad + sum_i u_i * (z_i - x_i o y_i)
        nqt = p.nqtriples
        xr = rows(p.iq, p.iq + nqt)[..., : p.dblock]
        yr = rows(p.iq + nqt, p.iq + 2 * nqt)[..., : p.dblock]
        zr = rows(p.iq + 2 * nqt, p.iq + 3 * nqt)[..., : p.dblock]
        t2 = F.mul(u_quad[..., :, None], F.sub(zr, F.mul(xr, yr)))
        y_quad = F.add(row(p.iquad)[..., : p.dblock],
                       F.lazy_sum(t2, axis=nlead - 1))
        okq = jnp.all(F.is_zero(y_quad[..., p.r : p.r + p.w]))
        return y_ldt, y_dot, y_quad, okq

    def _responses_fn(self, T, u_ldt, A_arr, u_quad):
        """_responses_core with one flat packed output (a single D2H
        transfer; eager casts and per-array fetches cost a relay round
        trip each)."""
        y_ldt, y_dot, y_quad, okq = self._responses_core(
            T, u_ldt, A_arr, u_quad)
        return jnp.concatenate([
            y_ldt.reshape(-1), y_dot.reshape(-1), y_quad.reshape(-1),
            okq.reshape(-1).astype(jnp.uint32)])

    def prove(self, ts, nl: int, llterm, hash_of_llterm: bytes, lqc
              ) -> LigeroProof:
        """(ligero_prover.h:84-146)."""
        p, F = self.p, self.F
        proof = LigeroProof()

        ts.write_bytes(hash_of_llterm)

        # All response challenges come from one squeeze phase (no writes
        # between them, ligero_transcript.h): draw on host, compute on
        # device, fetch once.
        u_ldt = gen_uldt(p, ts, F)
        alphal = gen_alphal(nl, ts, F)
        alphaq = gen_alphaq(p, ts, F)
        A = inner_product_vector(F, p, nl, llterm, alphal, lqc, alphaq)
        u_quad = gen_uquad(p, ts, F)

        lead = (8,) if F.kCharacteristicTwo else \
            ((2, F.L) if type(F).__name__ == "Fp2" else (F.L,))
        u_ldt_d = jnp.asarray(F.to_limbs(u_ldt))
        aflat = [v for i in range(p.nwqrow)
                 for v in layout_Aext(F, p, i, A)]
        A_d = jnp.asarray(F.to_limbs(aflat)).reshape(
            lead + (p.nwqrow, p.block))
        u_quad_d = jnp.asarray(F.to_limbs(u_quad))

        key = ("resp", self.fp, self.tableau_dev.shape, A_d.shape,
               u_ldt_d.shape, u_quad_d.shape)
        if key not in _JIT_CACHE:
            _JIT_CACHE[key] = jax.jit(self._responses_fn)
        flat = _JIT_CACHE[key](self.tableau_dev, u_ldt_d, A_d, u_quad_d)
        got = np.asarray(flat)
        sh_ldt = lead + (p.block,)
        sh_dot = lead + (p.dblock,)
        sh_quad = lead + (p.dblock,)
        nl_ = int(np.prod(sh_ldt))
        nd_ = int(np.prod(sh_dot))
        nq_ = int(np.prod(sh_quad))
        y_ldt = F.from_limbs(got[:nl_].reshape(sh_ldt))
        y_dot = F.from_limbs(got[nl_ : nl_ + nd_].reshape(sh_dot))
        yq = F.from_limbs(got[nl_ + nd_ : nl_ + nd_ + nq_].reshape(sh_quad))
        assert got[-1] == 1, "W part is nonzero"

        proof.y_ldt = list(y_ldt)
        proof.y_dot = list(y_dot)
        proof.y_quad_0 = list(yq[: p.r])
        proof.y_quad_2 = list(yq[p.block : p.dblock])

        # P -> V responses
        ts.write_elts(proof.y_ldt, F)
        ts.write_elts(proof.y_dot, F)
        ts.write_elts(proof.y_quad_0, F)
        ts.write_elts(proof.y_quad_2, F)

        # column openings: device gather + one fetch
        idx = gen_idx(p, ts, F)
        idx_d = jnp.asarray(np.asarray(idx, np.int32) + p.dblock)
        gkey = ("cols", self.fp, self.tableau_dev.shape, len(idx))
        if gkey not in _JIT_CACHE:
            ax = self.tableau_dev.ndim - 1
            _JIT_CACHE[gkey] = jax.jit(
                lambda t, i: jnp.take(t, i, axis=ax))
        cols = np.asarray(_JIT_CACHE[gkey](self.tableau_dev, idx_d))
        colv = F.from_limbs(cols)  # [nrow, nreq] host scalars
        proof.req = [list(colv[i]) for i in range(p.nrow)]
        path, nonces = self.mc.open(idx)
        proof.merkle_path = path
        proof.merkle_nonce = nonces
        return proof
