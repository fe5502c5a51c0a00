"""Host witness builder for the ML-DSA circuit
(twin of reference ml_dsa_witness.h:29-394)."""

from __future__ import annotations

from typing import List

from ..sha3.witness import Sha3Witness
from . import reference as ref
from .params import D, MLDsaParams, N, Q


def _sym_reduce(delta: int) -> int:
    delta %= Q
    if delta > Q // 2:
        delta -= Q
    return delta


class MLDsaWitness:
    def __init__(self, params: MLDsaParams):
        self.p = params

    def compute_witness(self, pk: bytes, sig: bytes, msg: bytes,
                        ctx: bytes) -> bool:
        p = self.p
        if len(ctx) > 255:
            return False
        self.a_hat, self.t1, self.tr = ref.pk_decode(p, pk)
        dec = ref.sig_decode(p, sig)
        if dec is None:
            return False
        self.c_tilde, self.z, self.h = dec
        self.msg = msg

        self.h_sum = sum(sum(1 for b in row if b) for row in self.h)

        bound = p.gamma_1 - p.beta
        self.z_bits = []
        self.nttz = []
        for zp in self.z:
            row = []
            for v in zp:
                val = v if v <= Q // 2 else v - Q
                row.append(val + bound - 1)
            self.z_bits.append(row)
            self.nttz.append(ref.ntt(zp))

        self.c = ref.sample_in_ball(p, self.c_tilde)
        self.nttc = ref.ntt(self.c)

        # SHAKE witness for SampleInBall + rejection-sampling trace
        shake_in = bytes(self.c_tilde)
        self.shake_bws = Sha3Witness.compute_witness_shake256(shake_in, 136)[0]
        out = ref.shake256(shake_in, 136)
        self.j_vals, self.j_k_indices = [], []
        idx = 8
        for i in range(256 - p.tau, 256):
            while True:
                if idx >= len(out):
                    return False
                j = out[idx]
                idx += 1
                if j <= i:
                    break
            self.j_vals.append(j)
            self.j_k_indices.append(idx - 1)
        # position trace
        self.position_trace = []
        cur: List[int] = []
        for s in range(p.tau):
            j = self.j_vals[s]
            i = 256 - p.tau + s
            for t in range(len(cur)):
                if cur[t] == j:
                    cur[t] = i
                    break
            cur.append(j)
            self.position_trace.append(list(cur))

        scale = pow(2, D, Q)
        self.nttt1 = [ref.ntt([x * scale % Q for x in t1p])
                      for t1p in self.t1]

        self.w_prime_approx = []
        for i in range(p.K):
            acc = [0] * N
            for j in range(p.L):
                acc = ref.poly_add(
                    acc, ref.poly_pointwise(self.a_hat[i][j], self.nttz[j]))
            acc = ref.poly_sub(acc, ref.poly_pointwise(self.nttc,
                                                       self.nttt1[i]))
            self.w_prime_approx.append(ref.inv_ntt(acc))

        self.w1 = []
        self.hint_aux_bits = []
        self.w_prime_1 = []
        for i in range(p.K):
            w1_row, aux_row, wp1_row = [], [], []
            for k in range(N):
                val = self.w_prime_approx[i][k]
                r1, _r0 = ref.decompose(p, val)
                h_bit = self.h[i][k]
                wp1_row.append(ref.use_hint(p, h_bit, val))
                w1_row.append(r1)
                delta = _sym_reduce(val - r1 * 2 * p.gamma_2)
                R = delta + p.gamma_2
                s = 0 if delta > 0 else 1
                aux_row.append(R | (s << p.r0_bits))
            self.w1.append(w1_row)
            self.hint_aux_bits.append(aux_row)
            self.w_prime_1.append(wp1_row)

        self.w1_tilde = ref.w1_encode(p, self.w_prime_1)
        self.mu = ref.compute_mu(self.tr, msg, ctx)
        ct_in = self.mu + self.w1_tilde
        self.c_prime_tilde = ref.shake256(ct_in, p.c_tilde_bytes)
        self.c_prime_tilde_bws = Sha3Witness.compute_witness_shake256(
            ct_in, p.c_tilde_bytes)
        return self.c_prime_tilde == self.c_tilde

    # -- fills (wire order of circuit.PkWires/SignatureWires/WitnessWires) ----

    def _bits(self, F, v: int, n: int) -> List:
        return [F.of_scalar((v >> i) & 1) for i in range(n)]

    def fill_pk(self, F) -> List:
        p = self.p
        out = []
        for i in range(p.K):
            for j in range(p.L):
                out.extend(F.of_scalar(x) for x in self.a_hat[i][j])
        for i in range(p.K):
            out.extend(F.of_scalar(x) for x in self.nttt1[i])
        for b in self.tr:
            out.extend(self._bits(F, b, 8))
        return out

    def fill_sig(self, F) -> List:
        p = self.p
        out = []
        for b in self.c_tilde:
            out.extend(self._bits(F, b, 8))
        for zp in self.z:
            out.extend(F.of_scalar(x) for x in zp)
        for row in self.z_bits:
            for v in row:
                out.extend(self._bits(F, v, p.z_bits))
        for hrow in self.h:
            out.extend(F.of_scalar(1 if b else 0) for b in hrow)
        return out

    def fill_witness(self, F) -> List:
        p = self.p
        out = []
        for s in range(p.tau):
            out.extend(self._bits(F, self.j_vals[s], 8))
            out.extend(self._bits(F, self.j_k_indices[s], 16))
        out.extend(Sha3Witness.fill_witness(F, [self.shake_bws]))
        for s in range(p.tau):
            for k in range(s + 1):
                out.extend(self._bits(F, self.position_trace[s][k], 8))
        out.extend(F.of_scalar(x) for x in self.c)
        for i in range(p.K):
            out.extend(F.of_scalar(x) for x in self.w_prime_approx[i])
            out.extend(F.of_scalar(x) for x in self.w1[i])
            for v in self.w1[i]:
                out.extend(self._bits(F, v, p.r1_bits))
            for v in self.hint_aux_bits[i]:
                out.extend(self._bits(F, v, p.r0_bits + 1))
            out.extend(F.of_scalar(x) for x in self.w_prime_1[i])
            for v in self.w_prime_1[i]:
                out.extend(self._bits(F, v, p.r1_bits))
        for i in range(p.L):
            out.extend(F.of_scalar(x) for x in self.nttz[i])
        out.extend(F.of_scalar(x) for x in self.nttc)
        for b in self.w1_tilde:
            out.extend(self._bits(F, b, 8))
        out.extend(Sha3Witness.fill_witness(F, self.c_prime_tilde_bws))
        out.extend(self._bits(F, self.h_sum, p.omega_bits))
        return out

    def fill_mu(self, F) -> List:
        out = []
        for b in self.mu:
            out.extend(self._bits(F, b, 8))
        return out
