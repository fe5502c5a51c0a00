"""Ligero prover: commit (RS-encoded tableau + Merkle column hashes) and
prove (low-degree / linear / quadratic tests + column openings).

Semantic twin of reference lib/ligero/ligero_prover.h:34-356, rebuilt
around batched device Reed-Solomon: every tableau row group with the
same input width is encoded in ONE call over a [rows, n] batch (the
reference encodes row-by-row), which is the natural shard/batch axis for
the TPU mesh (SURVEY §2.15).

For this stage of the build the row-combination responses (y_ldt/y_dot/
y_quad) and the column hashing run on host over the pulled tableau; the
device RS encode dominates asymptotically.  Device-side column hashing
(sha256_jax) and row combos are the next optimization step.
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


class LigeroProver:
    def __init__(self, p: LigeroParam, F, rs_factory: Callable):
        """rs_factory(n, m) -> encoder with .interpolate(device [L.., rows, n])
        returning [L.., rows, m]."""
        self.p = p
        self.F = F
        self.rs_factory = rs_factory
        self.mc = MerkleCommitment(p.block_ext)
        self.tableau_np = None  # natural-form numpy limbs [L.., nrow, block_enc]
        self.tableau_host = None  # host scalars [nrow][block_enc]

    # ------------------------------------------------------------------

    def commit(self, ts, W_host: Sequence, subfield_boundary: int, lqc,
               rng) -> LigeroCommitment:
        """Build+encode the tableau, Merkle-commit columns
        (ligero_prover.h:58-79)."""
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

        # --- device RS encode, batched per width group ---
        rs_block = self.rs_factory(p.block, p.block_enc)
        rs_dblock = self.rs_factory(p.dblock, p.block_enc)
        lead = (8,) if F.kCharacteristicTwo else \
            ((2, F.L) if type(F).__name__ == "Fp2" else (F.L,))
        nbr = len(block_rows)
        flatb = [v for row in block_rows for v in row]
        arr_b = jnp.asarray(F.to_limbs(flatb)).reshape(lead + (nbr, p.block))
        enc_b = rs_block.interpolate(arr_b)  # [L.., nbr, block_enc]
        flatd = idot + iquad
        arr_d = jnp.asarray(F.to_limbs(flatd)).reshape(lead + (2, p.dblock))
        enc_d = rs_dblock.interpolate(arr_d)

        # assemble tableau in row order [ildt, idot, iquad, iw.., iq..]
        ax = arr_b.ndim - 2
        tableau = jnp.concatenate(
            [
                jax.lax.slice_in_dim(enc_b, 0, 1, axis=ax),
                enc_d,
                jax.lax.slice_in_dim(enc_b, 1, nbr, axis=ax),
            ],
            axis=ax,
        )
        self.tableau_dev = tableau
        nat = np.asarray(F.from_mont_device(tableau))
        self.tableau_bytes = F.natural_limbs_to_bytes_np(nat)
        # host scalars for the response computations
        self.tableau_host = F.from_limbs(np.asarray(tableau))

        # --- Merkle commitment over ext columns (device-batched SHA-256) ---
        from ..merkle.sha256_jax import sha256_batch

        nonces = [rng.bytes(NONCE_LEN) for _ in range(p.block_ext)]
        # message per column j: nonce_j || column bytes (rows in order)
        cols = np.ascontiguousarray(
            self.tableau_bytes[:, p.dblock :, :].transpose(1, 0, 2)
        ).reshape(p.block_ext, -1)
        nonce_arr = np.frombuffer(b"".join(nonces), dtype=np.uint8).reshape(
            p.block_ext, NONCE_LEN)
        msgs = np.concatenate([nonce_arr, cols], axis=1)
        digests = sha256_batch(msgs)
        leaves = [digests[j].tobytes() for j in range(p.block_ext)]
        root = self.mc.commit_leaves(leaves, nonces)
        commitment = LigeroCommitment(root=root)
        write_commitment(commitment, ts)
        return commitment

    # ------------------------------------------------------------------

    def prove(self, ts, nl: int, llterm, hash_of_llterm: bytes, lqc
              ) -> LigeroProof:
        """(ligero_prover.h:84-146)."""
        p, F = self.p, self.F
        T = self.tableau_host  # [nrow][block_enc] host scalars
        proof = LigeroProof()

        ts.write_bytes(hash_of_llterm)

        # low-degree test
        u_ldt = gen_uldt(p, ts, F)
        y = list(T[p.ildt][: p.block])
        for i in range(p.nwqrow):
            row = T[p.iw + i]
            u = u_ldt[i]
            y = [F.add_i(y[j], F.mul_i(u, row[j])) for j in range(p.block)]
        proof.y_ldt = y

        # linear (dot) test
        alphal = gen_alphal(nl, ts, F)
        alphaq = gen_alphaq(p, ts, F)
        A = inner_product_vector(F, p, nl, llterm, alphal, lqc, alphaq)
        proof.y_dot = self._dot_proof(A)

        # quadratic test
        u_quad = gen_uquad(p, ts, F)
        yq = list(T[p.iquad][: p.dblock])
        iqx, iqy, iqz = p.iq, p.iq + p.nqtriples, p.iq + 2 * p.nqtriples
        for i in range(p.nqtriples):
            u = u_quad[i]
            xr, yr, zr = T[iqx + i], T[iqy + i], T[iqz + i]
            for j in range(p.dblock):
                t = F.sub_i(zr[j], F.mul_i(xr[j], yr[j]))
                yq[j] = F.add_i(yq[j], F.mul_i(u, t))
        # sanity: W part of yq is zero
        for j in range(p.w):
            assert yq[p.r + j] == F.of_scalar(0), "W part is nonzero"
        proof.y_quad_0 = yq[: p.r]
        proof.y_quad_2 = yq[p.block : p.dblock]

        # P -> V responses
        ts.write_elts(proof.y_ldt, F)
        ts.write_elts(proof.y_dot, F)
        ts.write_elts(proof.y_quad_0, F)
        ts.write_elts(proof.y_quad_2, F)

        # column openings
        idx = gen_idx(p, ts, F)
        proof.req = [
            [T[i][p.dblock + j] for j in idx] for i in range(p.nrow)
        ]
        path, nonces = self.mc.open(idx)
        proof.merkle_path = path
        proof.merkle_nonce = nonces
        return proof

    def _dot_proof(self, A: List) -> List:
        """y_dot = idot + sum_i Aext_i (x) W_i over dblock
        (ligero_prover.h:293-309); Aext interpolation batched on device."""
        p, F = self.p, self.F
        rs = self.rs_factory(p.block, p.dblock)
        lead = (8,) if F.kCharacteristicTwo else \
            ((2, F.L) if type(F).__name__ == "Fp2" else (F.L,))
        rows = [layout_Aext(F, p, i, A) for i in range(p.nwqrow)]
        flat = [v for row in rows for v in row]
        arr = jnp.asarray(F.to_limbs(flat)).reshape(lead + (p.nwqrow, p.block))
        aext = F.from_limbs(np.asarray(rs.interpolate(arr)))
        T = self.tableau_host
        y = list(T[p.idot][: p.dblock])
        for i in range(p.nwqrow):
            row = T[p.iw + i]
            arow = aext[i]
            for j in range(p.dblock):
                y[j] = F.add_i(y[j], F.mul_i(arow[j], row[j]))
        return y
