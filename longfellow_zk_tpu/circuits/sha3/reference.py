"""Host Keccak-f[1600] / SHAKE256 reference (FIPS PUB 202).

Semantic twin of reference lib/circuits/tests/sha3/sha3_reference.{h,cc}
and sha3_round_constants.cc — but the round constants and rotation
offsets are *computed* from the FIPS 202 definitions (the rc LFSR of
§3.2.5 and the triangular-number offsets of §3.2.2) instead of being
transcribed as tables.  Cross-checked against hashlib.shake_256 in
tests/test_sha3.py.
"""

from __future__ import annotations

from typing import List, Tuple

_M64 = (1 << 64) - 1


def _rc_bit(t: int) -> int:
    """FIPS 202 Algorithm 5: rc(t) via the degree-8 LFSR."""
    if t % 255 == 0:
        return 1
    r = 1
    for _ in range(t % 255):
        r <<= 1
        if r & 0x100:
            r ^= 0x171  # x^8 + x^6 + x^5 + x^4 + 1
    return r & 1


def _compute_rc() -> List[int]:
    rc = []
    for ir in range(24):
        v = 0
        for j in range(7):
            v |= _rc_bit(j + 7 * ir) << ((1 << j) - 1)
        rc.append(v)
    return rc


def _compute_rotc() -> List[int]:
    """Rotation offsets in rho order: t = 0..23 walking (x,y) via the
    (y, 2x+3y) map from (1,0) (FIPS 202 §3.2.2)."""
    return [(((t + 1) * (t + 2)) // 2) % 64 for t in range(24)]


def keccak_rc() -> List[int]:
    return list(_RC)


def keccak_rotc() -> List[int]:
    return list(_ROTC)


_RC = _compute_rc()
_ROTC = _compute_rotc()


def _rotl(x: int, n: int) -> int:
    n %= 64
    return ((x << n) | (x >> (64 - n))) & _M64


State = List[List[int]]  # A[x][y], 5x5 uint64


class Sha3Reference:
    """Step mappings operating on A[x][y] (column-major like the
    reference so witnesses line up wire-for-wire)."""

    @staticmethod
    def new_state() -> State:
        return [[0] * 5 for _ in range(5)]

    @staticmethod
    def theta(A: State) -> None:
        C = [A[x][0] ^ A[x][1] ^ A[x][2] ^ A[x][3] ^ A[x][4]
             for x in range(5)]
        for x in range(5):
            d = C[(x + 4) % 5] ^ _rotl(C[(x + 1) % 5], 1)
            for y in range(5):
                A[x][y] ^= d

    @staticmethod
    def rho(A: State) -> None:
        x, y = 1, 0
        for t in range(24):
            A[x][y] = _rotl(A[x][y], _ROTC[t])
            x, y = y, (2 * x + 3 * y) % 5

    @staticmethod
    def pi(A: State, A1: State) -> None:
        for x in range(5):
            for y in range(5):
                A1[x][y] = A[(x + 3 * y) % 5][x]

    @staticmethod
    def chi(A1: State, A: State) -> None:
        for x in range(5):
            for y in range(5):
                A[x][y] = A1[x][y] ^ (A1[(x + 2) % 5][y]
                                      & (A1[(x + 1) % 5][y] ^ _M64))

    @staticmethod
    def iota(A: State, rnd: int) -> None:
        A[0][0] ^= _RC[rnd]

    @staticmethod
    def keccak_f_1600(A: State) -> None:
        for rnd in range(24):
            Sha3Reference.round(A, rnd)

    @staticmethod
    def round(A: State, rnd: int) -> None:
        Sha3Reference.theta(A)
        Sha3Reference.rho(A)
        A1 = Sha3Reference.new_state()
        Sha3Reference.pi(A, A1)
        Sha3Reference.chi(A1, A)
        Sha3Reference.iota(A, rnd)

    @staticmethod
    def xorin(A: State, block: bytes, rate: int) -> None:
        """Absorb `rate` bytes, little-endian lanes, x-major order."""
        x = y = 0
        for i in range(0, rate, 8):
            lane = int.from_bytes(block[i : i + 8], "little")
            A[x][y] ^= lane
            x += 1
            if x == 5:
                x, y = 0, y + 1

    @staticmethod
    def squeeze_bytes(A: State, n: int) -> bytes:
        out = bytearray()
        x = y = 0
        while len(out) < n:
            out += A[x][y].to_bytes(8, "little")
            x += 1
            if x == 5:
                x, y = 0, y + 1
        return bytes(out[:n])

    @staticmethod
    def shake256(seed: bytes, outlen: int) -> bytes:
        rate = 136
        A = Sha3Reference.new_state()
        ptr = 0
        block = bytearray(rate)
        for b in seed:
            block[ptr] = b
            ptr += 1
            if ptr == rate:
                Sha3Reference.xorin(A, bytes(block), rate)
                Sha3Reference.keccak_f_1600(A)
                ptr = 0
                block = bytearray(rate)
        block[ptr] ^= 0x1F
        block[rate - 1] ^= 0x80
        Sha3Reference.xorin(A, bytes(block), rate)
        Sha3Reference.keccak_f_1600(A)
        out = bytearray()
        while True:
            take = min(rate, outlen - len(out))
            out += Sha3Reference.squeeze_bytes(A, take)
            if len(out) >= outlen:
                return bytes(out)
            Sha3Reference.keccak_f_1600(A)
