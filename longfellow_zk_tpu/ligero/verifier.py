"""Ligero verifier (reference lib/ligero/ligero_verifier.h:31-269).

Host-side replay of the challenges, Merkle check over opened columns,
then the three consistency checks (low-degree, linear/dot, quadratic)
evaluated at the opened column indices.  The RS re-encodes of the proof
responses run on device via the shared rs_factory.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..merkle.merkle import MerkleCommitmentVerifier, leaf_hash
from .param import LigeroParam, LigeroProof, inner_product_vector, layout_Aext
from .transcript import (
    gen_alphal,
    gen_alphaq,
    gen_idx,
    gen_uldt,
    gen_uquad,
    write_commitment,
)


def _interpolate_full(F, rs_factory, ylen: int, block_enc: int, y: List):
    lead = (8,) if F.kCharacteristicTwo else \
        ((2, F.L) if type(F).__name__ == "Fp2" else (F.L,))
    rs = rs_factory(ylen, block_enc)
    arr = jnp.asarray(F.to_limbs(list(y))).reshape(lead + (1, ylen))
    ext = rs.interpolate(arr)
    return F.from_limbs(np.asarray(ext))[0]


class LigeroVerifier:
    def __init__(self, p: LigeroParam, F, rs_factory):
        self.p = p
        self.F = F
        self.rs_factory = rs_factory

    def receive_commitment(self, commitment, ts):
        write_commitment(commitment, ts)

    def verify(self, commitment, proof: LigeroProof, ts, nl: int, llterm,
               hash_of_llterm: bytes, b: List, lqc) -> Tuple[bool, str]:
        p, F = self.p, self.F

        # replay the protocol to recover all challenges
        ts.write_bytes(hash_of_llterm)
        u_ldt = gen_uldt(p, ts, F)
        alphal = gen_alphal(nl, ts, F)
        alphaq = gen_alphaq(p, ts, F)
        u_quad = gen_uquad(p, ts, F)
        ts.write_elts(proof.y_ldt, F)
        ts.write_elts(proof.y_dot, F)
        ts.write_elts(proof.y_quad_0, F)
        ts.write_elts(proof.y_quad_2, F)
        idx = gen_idx(p, ts, F)

        if not self._merkle_check(commitment, proof, idx):
            return False, "merkle_check failed"
        if not self._low_degree_check(proof, idx, u_ldt):
            return False, "low_degree_check failed"

        A = inner_product_vector(F, p, nl, llterm, alphal, lqc, alphaq)
        if not self._dot_check(proof, idx, A):
            return False, "dot_check failed"
        # check the claimed inner product value
        want = F.of_scalar(0)
        for bi, al in zip(b, alphal):
            want = F.add_i(want, F.mul_i(bi, al))
        got = F.of_scalar(0)
        for j in range(p.w):
            got = F.add_i(got, proof.y_dot[p.r + j])
        if want != got:
            return False, "wrong dot product"

        if not self._quadratic_check(proof, idx, u_quad):
            return False, "quadratic_check failed"
        return True, "ok"

    # ------------------------------------------------------------------

    def _merkle_check(self, commitment, proof, idx) -> bool:
        p, F = self.p, self.F
        cols = []
        for r in range(p.nreq):
            col = b"".join(F.to_bytes(proof.req[i][r]) for i in range(p.nrow))
            cols.append(col)
        mcv = MerkleCommitmentVerifier(p.block_ext, commitment.root)
        return mcv.verify(proof.merkle_path, cols, proof.merkle_nonce, idx)

    def _req_gather(self, ylen, y, idx) -> List:
        p = self.p
        yext = _interpolate_full(self.F, self.rs_factory, ylen, p.block_enc, y)
        return [yext[p.dblock + j] for j in idx]

    def _low_degree_check(self, proof, idx, u_ldt) -> bool:
        p, F = self.p, self.F
        yc = list(proof.req[p.ildt])
        for i in range(p.nwqrow):
            u = u_ldt[i]
            row = proof.req[p.iw + i]
            yc = [F.add_i(yc[r], F.mul_i(u, row[r])) for r in range(p.nreq)]
        yp = self._req_gather(p.block, proof.y_ldt, idx)
        return yp == yc

    def _dot_check(self, proof, idx, A) -> bool:
        p, F = self.p, self.F
        yc = list(proof.req[p.idot])
        # batched device interpolation of all Aext rows at once
        lead = (8,) if F.kCharacteristicTwo else \
            ((2, F.L) if type(F).__name__ == "Fp2" else (F.L,))
        rows = [layout_Aext(F, p, i, A) for i in range(p.nwqrow)]
        flat = [v for row in rows for v in row]
        rs = self.rs_factory(p.block, p.block_enc)
        arr = jnp.asarray(F.to_limbs(flat)).reshape(lead + (p.nwqrow, p.block))
        aext = F.from_limbs(np.asarray(rs.interpolate(arr)))
        for i in range(p.nwqrow):
            arow = aext[i]
            wrow = proof.req[p.iw + i]
            for r, j in enumerate(idx):
                yc[r] = F.add_i(yc[r], F.mul_i(arow[p.dblock + j], wrow[r]))
        yp = self._req_gather(p.dblock, proof.y_dot, idx)
        return yp == yc

    def _quadratic_check(self, proof, idx, u_quad) -> bool:
        p, F = self.p, self.F
        yc = list(proof.req[p.iquad])
        iqx, iqy, iqz = p.iq, p.iq + p.nqtriples, p.iq + 2 * p.nqtriples
        for i in range(p.nqtriples):
            u = u_quad[i]
            xr = proof.req[iqx + i]
            yr = proof.req[iqy + i]
            zr = proof.req[iqz + i]
            for r in range(p.nreq):
                t = F.sub_i(zr[r], F.mul_i(xr[r], yr[r]))
                yc[r] = F.add_i(yc[r], F.mul_i(u, t))
        yquad = (list(proof.y_quad_0) + [F.of_scalar(0)] * p.w +
                 list(proof.y_quad_2))
        yp = self._req_gather(p.dblock, yquad, idx)
        return yp == yc
