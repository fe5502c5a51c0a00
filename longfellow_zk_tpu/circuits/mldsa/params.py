"""ML-DSA (FIPS 204) parameter sets and NTT constants.

Semantic twin of reference lib/circuits/tests/pq/ml_dsa/
ml_dsa_shared.h:29-139 — but the zeta table is *computed* from the FIPS
204 definition (zetas[k] = 1753^bitrev8(k) mod q) rather than
transcribed.
"""

from __future__ import annotations

from dataclasses import dataclass

Q = 8380417  # = 2^23 - 2^13 + 1
N = 256
D = 13
ZETA = 1753  # 512th root of unity mod Q (FIPS 204 §7.5)


def _bitrev8(k: int) -> int:
    return int(f"{k:08b}"[::-1], 2)


zetas = tuple(pow(ZETA, _bitrev8(k), Q) for k in range(256))


def bitlen(v: int) -> int:
    return v.bit_length()


@dataclass(frozen=True)
class MLDsaParams:
    K: int
    L: int
    tau: int
    omega: int
    c_tilde_bytes: int
    gamma_1: int
    gamma_2: int
    beta: int
    z_bits: int
    r1_bits: int
    w1_bytes: int

    @property
    def z_coeff_bits(self) -> int:
        return bitlen(2 * self.gamma_1 - 1)

    @property
    def r0_bits(self) -> int:
        return 18 if self.gamma_2 == 95232 else 19

    @property
    def M(self) -> int:
        return (Q - 1) // (2 * self.gamma_2)

    @property
    def omega_bits(self) -> int:
        return bitlen(self.omega)


MLDSA_44 = MLDsaParams(4, 4, 39, 80, 32, 131072, 95232, 78, 19, 6, 192)
MLDSA_65 = MLDsaParams(6, 5, 49, 55, 48, 524288, 261888, 196, 20, 4, 128)
