"""SHA-3 / SHAKE256 circuit over the Logic DSL.

Semantic twin of reference lib/circuits/tests/sha3/sha3_circuit.h:48-351
(and sha3_slicing.h): the Keccak-f[1600] permutation as xor/and gates on
64-bit lanes, with the prover supplying the full 5x5 state as a packed
witness every `slice` rounds — the circuit recomputes the rounds in
between and asserts equality with the witnessed state, which caps the
multiplicative depth (chi is the only AND level per round).

State layout: A[x][y] lanes of 64 bits each (LSB-first bitvecs).
"""

from __future__ import annotations

from typing import List, Sequence

from ...compiler.logic import Logic
from .reference import keccak_rc, keccak_rotc

K_RATE_SHAKE256 = 136


def sha3_slice_at(rnd: int, period: int = 6) -> bool:
    """Witness-slicing schedule (sha3_slicing.h:23-28): always at the
    final round, plus every `period` rounds."""
    return rnd == 23 or (rnd % period) == (period - 1)


class Sha3Circuit:
    def __init__(self, l: Logic):
        self.l = l
        self._rc = keccak_rc()
        self._rotc = keccak_rotc()

    # -- lane helpers -------------------------------------------------------

    def _vrotl(self, a, n: int):
        return self.l.vrotr(a, (64 - n) % 64)

    def _lane_const(self, x: int):
        return self.l.bits(64, x)

    def new_state(self, zero: bool = True):
        if zero:
            return [[self._lane_const(0) for _ in range(5)] for _ in range(5)]
        return [[None] * 5 for _ in range(5)]

    def input_state(self):
        return [[self.l.vinput(64) for _ in range(5)] for _ in range(5)]

    # -- step mappings (FIPS 202 §3.2) ---------------------------------------

    def theta(self, A) -> None:
        L = self.l
        # split C = C0 ^ C1 with C1 = A[x][4] so the deep half of the
        # xor tree is two levels and C1 rides for free (the reference's
        # depth balancing, sha3_circuit.h:76-113)
        C0, C1 = [], []
        for x in range(5):
            a01 = L.vxor(A[x][0], A[x][1])
            a23 = L.vxor(A[x][2], A[x][3])
            C0.append(L.vxor(a23, a01))
            C1.append(A[x][4])
        for x in range(5):
            d0 = L.vxor(C0[(x + 4) % 5], self._vrotl(C0[(x + 1) % 5], 1))
            d1 = L.vxor(C1[(x + 4) % 5], self._vrotl(C1[(x + 1) % 5], 1))
            for y in range(5):
                A[x][y] = L.vxor(L.vxor(A[x][y], d1), d0)

    def rho(self, A) -> None:
        x, y = 1, 0
        for t in range(24):
            A[x][y] = self._vrotl(A[x][y], self._rotc[t])
            x, y = y, (2 * x + 3 * y) % 5

    def pi(self, A):
        return [[A[(x + 3 * y) % 5][x] for y in range(5)] for x in range(5)]

    def chi(self, A1):
        L = self.l
        return [[L.vxor(A1[x][y], L.vand(A1[(x + 2) % 5][y],
                                         L.vnot(A1[(x + 1) % 5][y])))
                 for y in range(5)] for x in range(5)]

    def iota(self, A, rnd: int) -> None:
        A[0][0] = self.l.vxor(A[0][0], self._lane_const(self._rc[rnd]))

    def _round(self, A, rnd: int):
        self.theta(A)
        self.rho(A)
        A = self.chi(self.pi(A))
        self.iota(A, rnd)
        return A

    # -- permutation --------------------------------------------------------

    def keccak_f_1600(self, A):
        """Witness-free baseline (depth = 24 AND levels)."""
        for rnd in range(24):
            A = self._round(A, rnd)
        return A

    def block_witness_input(self):
        """One 5x5 witnessed state per sliced round
        (sha3_circuit.h BlockWitness::input)."""
        return {rnd: self.input_state()
                for rnd in range(24) if sha3_slice_at(rnd)}

    def keccak_f_1600_w(self, A, bw) -> None:
        """Witnessed permutation: at each sliced round assert the
        computed state equals the witness, then continue from the
        witness (caps depth at `period` AND levels)."""
        for rnd in range(24):
            A = self._round(A, rnd)
            if sha3_slice_at(rnd):
                for x in range(5):
                    for y in range(5):
                        self._assert_lane_eq(A[x][y], bw[rnd][x][y])
                A = [[bw[rnd][x][y] for y in range(5)] for x in range(5)]

    def _assert_lane_eq(self, a, b) -> None:
        """Packed 64-bit lane equality: as_scalar over subfield-sized
        slices (sha3_circuit.h:317-335)."""
        L = self.l
        sfb = getattr(L.F, "kSubFieldBits", 0)
        if L.F.kCharacteristicTwo and sfb == 16:
            cuts = (0, 16, 32, 48, 64)
        else:
            cuts = (0, 22, 43, 64)  # needs a >=22-bit subfield/packing
        for i0, i1 in zip(cuts, cuts[1:]):
            L.assert_eq_elt(L.as_scalar(L.slice_bits(a, i0, i1)),
                            L.as_scalar(L.slice_bits(b, i0, i1)))

    # -- SHAKE256 ------------------------------------------------------------

    def xorin_block(self, A, block, rate: int) -> None:
        """Absorb rate bytes of v8s into lanes (x-major)."""
        L = self.l
        x = y = 0
        for i in range(0, rate, 8):
            lane = []
            for b in range(8):
                lane.extend(block[i + b])
            A[x][y] = L.vxor(A[x][y], lane)
            x += 1
            if x == 5:
                x, y = 0, y + 1

    def num_block_witnesses(self, seedlen: int, outlen: int) -> int:
        rate = K_RATE_SHAKE256
        return (seedlen + rate) // rate + \
            (0 if outlen == 0 else (outlen - 1) // rate)

    def assert_shake256(self, seed: Sequence, outlen: int,
                        bws: List[dict]) -> List:
        """SHAKE256(seed)[:outlen] with witnessed permutations
        (sha3_circuit.h:221-322).  seed: list of v8 bitvecs.  Returns
        outlen v8 bitvecs read from the witnessed final states."""
        L = self.l
        rate = K_RATE_SHAKE256
        n_absorb = (len(seed) + rate) // rate
        n_squeeze = 0 if outlen == 0 else (outlen - 1) // rate
        assert len(bws) == n_absorb + n_squeeze, \
            (len(bws), n_absorb, n_squeeze)

        # output bytes come straight from the witnessed round-23 states
        out = []
        sqz = 0
        while len(out) < outlen:
            st = bws[n_absorb - 1 + sqz][23]
            x = y = 0
            blk = []
            for i in range(0, rate, 8):
                lane = st[x][y]
                for b in range(8):
                    blk.append(lane[b * 8 : b * 8 + 8])
                x += 1
                if x == 5:
                    x, y = 0, y + 1
            take = min(rate, outlen - len(out))
            out.extend(blk[:take])
            sqz += 1

        # absorb phase
        zero8 = L.bits(8, 0)
        block = [zero8] * rate
        bw_idx = 0
        ptr = 0
        for byte in seed:
            block[ptr] = byte
            ptr += 1
            if ptr == rate:
                A = self._chain_state(bws, bw_idx)
                self.xorin_block(A, block, rate)
                self.keccak_f_1600_w(A, bws[bw_idx])
                bw_idx += 1
                ptr = 0
                block = [zero8] * rate

        # last (padded) block
        block[ptr] = L.vxor(block[ptr], L.bits(8, 0x1F))
        block[rate - 1] = L.vxor(block[rate - 1], L.bits(8, 0x80))
        A = self._chain_state(bws, bw_idx)
        self.xorin_block(A, block, rate)
        self.keccak_f_1600_w(A, bws[bw_idx])
        bw_idx += 1

        # squeeze phase
        for i in range(n_squeeze):
            A = [[bws[n_absorb - 1 + i][23][x][y] for y in range(5)]
                 for x in range(5)]
            self.keccak_f_1600_w(A, bws[bw_idx])
            bw_idx += 1
        assert bw_idx == len(bws)
        return out

    def _chain_state(self, bws, bw_idx: int):
        if bw_idx == 0:
            return self.new_state()
        prev = bws[bw_idx - 1][23]
        return [[prev[x][y] for y in range(5)] for x in range(5)]
