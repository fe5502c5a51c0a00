"""Host witness generation for the SHA-3/SHAKE256 circuit.

Semantic twin of reference lib/circuits/tests/sha3/sha3_witness.{h,cc}:
runs the real Keccak permutation recording every round's full state;
the filler emits only the sliced rounds, bit-by-bit, in the same order
the circuit's block_witness_input() declared its wires.
"""

from __future__ import annotations

from typing import List

from .circuit import K_RATE_SHAKE256, sha3_slice_at
from .reference import Sha3Reference

BlockWitness = List  # a_intermediate[24][5][5] uint64


class Sha3Witness:
    @staticmethod
    def compute_witness_block(A, bw_out: List) -> None:
        """One keccak-f[1600] on state A (updated in place), recording
        each round's state into bw_out[24][5][5]."""
        for rnd in range(24):
            Sha3Reference.round(A, rnd)
            bw_out.append([[A[x][y] for y in range(5)] for x in range(5)])

    @staticmethod
    def compute_witness_shake256(seed: bytes, outlen: int) -> List[BlockWitness]:
        rate = K_RATE_SHAKE256
        A = Sha3Reference.new_state()
        witnesses: List[BlockWitness] = []
        block = bytearray(rate)
        ptr = 0
        for b in seed:
            block[ptr] = b
            ptr += 1
            if ptr == rate:
                Sha3Reference.xorin(A, bytes(block), rate)
                bw: List = []
                Sha3Witness.compute_witness_block(A, bw)
                witnesses.append(bw)
                ptr = 0
                block = bytearray(rate)
        block[ptr] ^= 0x1F
        block[rate - 1] ^= 0x80
        Sha3Reference.xorin(A, bytes(block), rate)
        bw = []
        Sha3Witness.compute_witness_block(A, bw)
        witnesses.append(bw)

        out_ptr = 0
        while out_ptr < outlen:
            take = min(rate, outlen - out_ptr)
            out_ptr += take
            if out_ptr < outlen:
                bw = []
                Sha3Witness.compute_witness_block(A, bw)
                witnesses.append(bw)
        return witnesses

    @staticmethod
    def fill_witness(F, bws: List[BlockWitness]) -> List:
        """Field elements for the circuit's witness wires: sliced
        rounds only, 64 bits per lane, y-inner like input_state()."""
        out = []
        for bw in bws:
            for rnd in range(24):
                if sha3_slice_at(rnd):
                    for x in range(5):
                        for y in range(5):
                            v = bw[rnd][x][y]
                            out.extend(F.of_scalar((v >> i) & 1)
                                       for i in range(64))
        return out
