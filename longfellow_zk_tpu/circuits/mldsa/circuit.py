"""ML-DSA (FIPS 204) signature-verification circuit.

Semantic twin of reference lib/circuits/tests/pq/ml_dsa/
ml_dsa_circuit.h:70-852: proves possession of a valid ML-DSA signature
(c_tilde, z, h) on a public message hash mu under a public key
(A_hat, ntt(t1*2^d), tr).  The pipeline:

  1. SampleInBall: challenge c from c_tilde via a constrained
     Fisher-Yates shuffle over witnessed SHAKE256 output (the rejection
     sampling and the shuffle trace are verified positionally, O(1)
     depth in the shuffle steps).
  2. w'_approx = InvNTT(A_hat o NTT(z) - NTT(c) o nttt1): the NTTs are
     *asserted* against witnessed transforms (assert_ntt), so the
     butterflies are additions/constant-muls only.
  3. UseHint via the interval-shifting trick: one range check per
     coefficient (see assert_use_hint_single).
  4. ||z||_inf < gamma_1 - beta via shifted bit decompositions.
  5. c_tilde == SHAKE256(mu || w1Encode(w1'), lambda/4).

Field: Fp24_6 (coefficients live in the Fp24 subfield; the extension
provides sumcheck soundness).  All bit packs use powers of 2 mod the
characteristic q = 8380417, which the coefficient widths (<= 20 bits)
never overflow.
"""

from __future__ import annotations

from typing import List

from ...compiler.logic import Logic
from ..sha3.circuit import Sha3Circuit
from .params import MLDsaParams, N, Q, zetas

_INV256 = pow(256, -1, Q)


class PkWires:
    def __init__(self, L_: Logic, params: MLDsaParams):
        self.a_hat = [[[L_.eltw_input() for _ in range(N)]
                       for _ in range(params.L)] for _ in range(params.K)]
        self.nttt1 = [[L_.eltw_input() for _ in range(N)]
                      for _ in range(params.K)]
        self.tr = [L_.vinput(8) for _ in range(64)]


class SignatureWires:
    def __init__(self, L_: Logic, params: MLDsaParams):
        self.c_tilde = [L_.vinput(8) for _ in range(params.c_tilde_bytes)]
        self.z = [[L_.eltw_input() for _ in range(N)]
                  for _ in range(params.L)]
        self.z_bits = [[L_.vinput(params.z_bits) for _ in range(N)]
                       for _ in range(params.L)]
        self.h = [[L_.eltw_input() for _ in range(N)]
                  for _ in range(params.K)]


class SampleInBallWires:
    def __init__(self, L_: Logic, sha3: Sha3Circuit, params: MLDsaParams):
        self.j_vals = []
        self.j_k_indices = []
        for _ in range(params.tau):
            self.j_vals.append(L_.vinput(8))
            self.j_k_indices.append(L_.vinput(16))
        self.shake_bws = sha3.block_witness_input()
        self.position_trace = [[L_.vinput(8) for _ in range(s + 1)]
                               for s in range(params.tau)]


class WitnessWires:
    def __init__(self, L_: Logic, sha3: Sha3Circuit, params: MLDsaParams,
                 n_ctilde_bws: int):
        p = params
        self.sample_in_ball = SampleInBallWires(L_, sha3, p)
        self.c = [L_.eltw_input() for _ in range(N)]
        self.w_prime_approx = []
        self.w1 = []
        self.w1_bits = []
        self.hint_aux_bits = []
        self.w_prime_1 = []
        self.w_prime_1_bits = []
        for _ in range(p.K):
            self.w_prime_approx.append(
                [L_.eltw_input() for _ in range(N)])
            self.w1.append([L_.eltw_input() for _ in range(N)])
            self.w1_bits.append(
                [L_.vinput(p.r1_bits) for _ in range(N)])
            self.hint_aux_bits.append(
                [L_.vinput(p.r0_bits + 1) for _ in range(N)])
            self.w_prime_1.append([L_.eltw_input() for _ in range(N)])
            self.w_prime_1_bits.append(
                [L_.vinput(p.r1_bits) for _ in range(N)])
        self.nttz = [[L_.eltw_input() for _ in range(N)]
                     for _ in range(p.L)]
        self.nttc = [L_.eltw_input() for _ in range(N)]
        self.w1_tilde = [L_.vinput(8)
                         for _ in range(p.K * p.w1_bytes)]
        self.c_prime_tilde_bws = [sha3.block_witness_input()
                                  for _ in range(n_ctilde_bws)]
        self.h_sum_bits = L_.vinput(p.omega_bits)


class MLDSAVerify:
    def __init__(self, lc: Logic, params: MLDsaParams):
        self.l = lc
        self.p = params
        self.sha3 = Sha3Circuit(lc)

    # number of SHAKE block witnesses for the c_tilde hash
    def n_ctilde_bws(self) -> int:
        p = self.p
        inlen = 64 + p.K * p.w1_bytes
        return self.sha3.num_block_witnesses(inlen, p.c_tilde_bytes)

    def pk_input(self) -> PkWires:
        return PkWires(self.l, self.p)

    def sig_input(self) -> SignatureWires:
        return SignatureWires(self.l, self.p)

    def witness_input(self) -> WitnessWires:
        return WitnessWires(self.l, self.sha3, self.p, self.n_ctilde_bws())

    # -- NTT assertions (ml_dsa_circuit.h:246-292) -----------------------------

    def assert_ntt(self, c: List, cprime: List) -> None:
        L = self.l
        F = L.F
        pv = list(c)
        k = 1
        ln = N // 2
        while ln > 0:
            for start in range(0, N, 2 * ln):
                zeta = F.of_scalar(zetas[k])
                neg_zeta = F.neg_i(zeta)
                k += 1
                for j in range(start, start + ln):
                    t = L.bk.axpy(pv[j], zeta, pv[j + ln])
                    pv[j + ln] = L.bk.axpy(pv[j], neg_zeta, pv[j + ln])
                    pv[j] = t
            ln //= 2
        for i in range(N):
            L.assert_eq_elt(pv[i], cprime[i])

    def assert_inverse_ntt(self, c: List, cprime: List) -> None:
        L = self.l
        F = L.F
        pv = list(c)
        k = 256
        ln = 1
        while ln < N:
            for start in range(0, N, 2 * ln):
                k -= 1
                neg_zeta = F.neg_i(F.of_scalar(zetas[k]))
                for j in range(start, start + ln):
                    t = pv[j]
                    pv[j] = L.add(t, pv[j + ln])
                    diff = L.sub(t, pv[j + ln])
                    pv[j + ln] = L.bk.ax(neg_zeta, diff)
            ln *= 2
        f = F.of_scalar(_INV256)
        for i in range(N):
            L.assert_eq_elt(L.bk.ax(f, pv[i]), cprime[i])

    # -- linear algebra --------------------------------------------------------

    def matrix_vector_mul(self, A, x):
        L = self.l
        out = []
        for i in range(self.p.K):
            row = []
            for cidx in range(N):
                acc = None
                for j in range(self.p.L):
                    t = L.mul(A[i][j][cidx], x[j][cidx])
                    acc = t if acc is None else L.add(acc, t)
                row.append(acc)
            out.append(row)
        return out

    def scalar_vector_mul(self, c, x):
        L = self.l
        return [[L.mul(c[k], x[i][k]) for k in range(N)]
                for i in range(self.p.K)]

    def assert_w_prime_approx(self, pk: PkWires, sig: SignatureWires,
                              w: WitnessWires) -> None:
        L = self.l
        for i in range(self.p.L):
            self.assert_ntt(sig.z[i], w.nttz[i])
        self.assert_ntt(w.c, w.nttc)
        Az = self.matrix_vector_mul(pk.a_hat, w.nttz)
        ct1 = self.scalar_vector_mul(w.nttc, pk.nttt1)
        for i in range(self.p.K):
            diff = [L.sub(Az[i][k], ct1[i][k]) for k in range(N)]
            self.assert_inverse_ntt(diff, w.w_prime_approx[i])

    # -- UseHint (ml_dsa_circuit.h:296-434) ------------------------------------

    def assert_use_hint_single(self, h_elt, r_elt, r1_raw, r1_raw_bits,
                               hint_r0_bits, hinted_r1, r1_bits) -> None:
        L = self.l
        p = self.p
        F = L.F
        two_gamma2 = F.of_scalar(2 * p.gamma_2)
        L.assert_is_bit_elt(h_elt)

        L.assert_eq_elt(r1_raw, L.as_scalar(r1_raw_bits))
        L.assert1(L.vleq(r1_raw_bits, p.M - 1))

        r0_shifted = L.as_scalar(hint_r0_bits[: p.r0_bits])
        L.assert1(L.vleq(hint_r0_bits[: p.r0_bits], 2 * p.gamma_2))

        s_bit = hint_r0_bits[p.r0_bits]
        is_leq = L.vleq(hint_r0_bits[: p.r0_bits], p.gamma_2)
        L.assert_eq(s_bit, is_leq)

        neg_h = L.sub(L.konst(0), h_elt)
        c_elt = L.mux_elt(s_bit, neg_h, h_elt)

        delta = L.sub(r0_shifted, L.konst(p.gamma_2))
        val = L.add(L.bk.ax(two_gamma2, r1_raw), delta)
        L.assert_eq_elt(r_elt, val)

        L.assert_eq_elt(hinted_r1, L.as_scalar(r1_bits))
        L.assert1(L.vleq(r1_bits, p.M - 1))

        diff = L.sub(r1_raw, hinted_r1)
        tsd = L.add(diff, c_elt)
        m = F.of_scalar(p.M)
        prod = L.mul(tsd, L.sub(tsd, L.konst(p.M)))
        prod = L.mul(prod, L.add(tsd, L.konst(p.M)))
        L.assert0_elt(prod)

    def assert_use_hint(self, sig: SignatureWires, w: WitnessWires) -> None:
        L = self.l
        p = self.p
        acc = None
        for i in range(p.K):
            for k in range(N):
                self.assert_use_hint_single(
                    sig.h[i][k], w.w_prime_approx[i][k], w.w1[i][k],
                    w.w1_bits[i][k], w.hint_aux_bits[i][k],
                    w.w_prime_1[i][k], w.w_prime_1_bits[i][k])
                acc = sig.h[i][k] if acc is None else \
                    L.add(acc, sig.h[i][k])
        L.assert1(L.vleq(w.h_sum_bits, p.omega))
        L.assert_eq_elt(acc, L.as_scalar(w.h_sum_bits))

    # -- norms + encoding ------------------------------------------------------

    def assert_infty_norm(self, vec, vec_bits, bound: int) -> None:
        L = self.l
        for i in range(len(vec)):
            for j in range(N):
                r = L.as_scalar(vec_bits[i][j])
                shifted = L.add(vec[i][j], L.konst(bound - 1))
                L.assert_eq_elt(shifted, r)
                L.assert1(L.vleq(vec_bits[i][j], 2 * bound - 2))

    def assert_w1_encode(self, w_prime_1_bits, w1_tilde) -> None:
        """SimpleBitPack of the r1_bits decompositions into the byte
        array fed to the final hash (ml_dsa_circuit.h:477-525)."""
        L = self.l
        p = self.p
        all_bits = []
        for k in range(p.K):
            for i in range(N):
                all_bits.extend(w_prime_1_bits[k][i][: p.r1_bits])
        for i in range(p.K * p.w1_bytes):
            for b in range(8):
                idx = i * 8 + b
                want = all_bits[idx] if idx < len(all_bits) else L.bit(0)
                L.assert_eq(w1_tilde[i][b], want)

    # -- SampleInBall (ml_dsa_circuit.h:527-641) -------------------------------

    def assert_sample_in_ball(self, c_tilde, cprime,
                              w: SampleInBallWires) -> None:
        L = self.l
        p = self.p
        out = self.sha3.assert_shake256(list(c_tilde), 136, [w.shake_bws])

        prev_k = L.bits(16, 8)
        for s in range(p.tau):
            i = 256 - p.tau + s
            j = w.j_vals[s]
            k_idx = w.j_k_indices[s]
            L.assert1(L.vleq(k_idx, len(out) - 1))
            L.assert1(L.vleq(prev_k, k_idx))
            j_ext = list(j) + [L.bit(0)] * 8
            L.assert1(L.vleq(j_ext, i))
            for k in range(len(out)):
                k_bits = L.bits(16, k)
                is_target = L.veq(k_bits, k_idx)
                L.assert_implies(is_target, L.veq(out[k], j))
                in_range = L.land(L.vleq(prev_k, k_bits),
                                  L.vlt(k_bits, k_idx))
                out_ext = list(out[k]) + [L.bit(0)] * 8
                L.assert_implies(in_range,
                                 L.vlt(L.bits(16, i), out_ext))
            prev_k = L.vadd(k_idx, L.bits(16, 1))

        # shuffle trace
        L.vassert_eq(w.position_trace[0][0], w.j_vals[0])
        for s in range(1, p.tau):
            i = 256 - p.tau + s
            j = w.j_vals[s]
            prev_pos = w.position_trace[s - 1]
            curr_pos = w.position_trace[s]
            L.vassert_eq(curr_pos[s], j)
            for k in range(s):
                is_j = L.veq(prev_pos[k], j)
                i_v = L.bits(8, i)
                target = [L.mux(is_j, i_v[b], prev_pos[k][b])
                          for b in range(8)]
                L.vassert_eq(curr_pos[k], target)

        final_pos = w.position_trace[p.tau - 1]
        one = L.konst(1)
        mone = L.konst(L.F.neg_i(L.F.of_scalar(1)))
        zero = L.konst(0)
        trace_vals = []
        for s in range(p.tau):
            sign_bit = out[s // 8][s % 8]
            trace_vals.append(L.mux_elt(sign_bit, mone, one))
        for k in range(N):
            k_v = L.bits(8, k)
            val_k = None
            for s in range(p.tau):
                t = L.mux_elt(L.veq(final_pos[s], k_v), trace_vals[s], zero)
                val_k = t if val_k is None else L.add(val_k, t)
            L.assert_eq_elt(cprime[k], val_k)

    # -- mu (optional; mu may also be public) ----------------------------------

    def assert_mu(self, tr, msg, mu_bws, mu) -> None:
        """mu == SHAKE256(tr || msg', 64) with msg' already
        domain-separated (ml_dsa_circuit.h:672-771)."""
        L = self.l
        sha3 = self.sha3
        rate = 136
        inp = list(tr) + list(msg)
        # shake256 pad to whole blocks
        padlen = rate - (len(inp) % rate)
        if padlen == 1:
            inp.append(L.bits(8, 0x9F))
        else:
            inp.append(L.bits(8, 0x1F))
            inp.extend([L.bits(8, 0)] * (padlen - 2))
            inp.append(L.bits(8, 0x80))
        assert len(inp) % rate == 0
        nblocks = len(inp) // rate
        assert len(mu_bws) == nblocks
        A = sha3.new_state()
        for b in range(nblocks):
            sha3.xorin_block(A, inp[b * rate : (b + 1) * rate], rate)
            sha3.keccak_f_1600_w(A, mu_bws[b])
            A = [[mu_bws[b][23][x][y] for y in range(5)] for x in range(5)]
        # squeeze 64 bytes from the final witnessed state
        sq = []
        x = y = 0
        st = mu_bws[nblocks - 1][23]
        for i in range(0, 64, 8):
            lane = st[x][y]
            for bb in range(8):
                sq.append(lane[bb * 8 : bb * 8 + 8])
            x += 1
            if x == 5:
                x, y = 0, y + 1
        for i in range(64):
            L.vassert_eq(sq[i], mu[i])

    def assert_ctilde(self, mu, w1_tilde, bws, c_tilde) -> None:
        L = self.l
        inp = list(mu) + list(w1_tilde)
        squeezed = self.sha3.assert_shake256(inp, self.p.c_tilde_bytes, bws)
        for i in range(self.p.c_tilde_bytes):
            L.vassert_eq(squeezed[i], c_tilde[i])

    # -- top level (ml_dsa_circuit.h:815-845) ----------------------------------

    def assert_valid_signature_on_mu(self, pk: PkWires, sig: SignatureWires,
                                     mu, w: WitnessWires) -> None:
        p = self.p
        self.assert_sample_in_ball(sig.c_tilde, w.c, w.sample_in_ball)
        self.assert_w_prime_approx(pk, sig, w)
        self.assert_use_hint(sig, w)
        self.assert_w1_encode(w.w_prime_1_bits, w.w1_tilde)
        self.assert_infty_norm(sig.z, sig.z_bits, p.gamma_1 - p.beta)
        self.assert_ctilde(mu, w.w1_tilde, w.c_prime_tilde_bws, sig.c_tilde)
