"""ZK test harnesses (reference lib/zk/zk_testing.h:40-154).

kLigeroRate/kLigeroNreq default to the production v7 parameters
(mdoc_zk.h:33-37: rate 1/7 inverse -> rateinv 4 historical; here we keep
them as explicit arguments with the reference test defaults).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..fields.fp2 import Fp2
from ..random_oracle.engine import SecureRandomEngine
from ..random_oracle.transcript import Transcript
from ..sumcheck.circuit import Circuit
from ..transforms.lch14 import LCH14ReedSolomon
from ..transforms.ntt import (
    ReedSolomon,
    make_fft_convolution_factory,
    make_fft_ext_convolution_factory,
)
from .proof import ZkProof
from .prover import ZkProver
from .serialization import read_zk_proof, write_zk_proof
from .verifier import ZkVerifier

K_LIGERO_RATE = 4
K_LIGERO_NREQ = 128
K_VERSION = 7


def rs_factory_for(F, omega=None, omega_order: int = None, F2=None,
                   omega2=None):
    """Uniform RS factory: LCH14 for binary fields, NTT for prime fields
    with a native root, FFTExt via Fp2 otherwise."""
    cache = {}
    if F.kCharacteristicTwo:
        def factory(n, m):
            if (n, m) not in cache:
                cache[(n, m)] = LCH14ReedSolomon(n, m, F)
            return cache[(n, m)]

        factory.fingerprint = ("lch14", F.name)
    elif F2 is not None:
        conv = make_fft_ext_convolution_factory(F, F2, omega2, omega_order)

        def factory(n, m):
            if (n, m) not in cache:
                cache[(n, m)] = ReedSolomon(n, m, F, conv)
            return cache[(n, m)]

        factory.fingerprint = ("fftext", F.name, omega2, omega_order)
    else:
        conv = make_fft_convolution_factory(F, omega, omega_order)

        def factory(n, m):
            if (n, m) not in cache:
                cache[(n, m)] = ReedSolomon(n, m, F, conv)
            return cache[(n, m)]

        factory.fingerprint = ("fft", F.name, omega, omega_order)
    return factory


def run_test_zk(circ: Circuit, W: List, pub: List, F, rs_factory,
                rate: int = K_LIGERO_RATE, nreq: int = K_LIGERO_NREQ,
                block_enc: Optional[int] = None,
                init: bytes = b"zk_test") -> Tuple[bool, str]:
    """Prove, serialize, re-parse, verify (zk_testing.h:44-86).
    Returns (ok, why)."""
    zkp = ZkProof(rate=rate, nreq=nreq)
    prover = ZkProver(circ, F, rs_factory, rate=rate, nreq=nreq,
                      block_enc=block_enc)
    tp = Transcript(init, version=K_VERSION)
    prover.commit(zkp, W, tp, SecureRandomEngine())
    if not prover.prove(zkp, W, tp):
        return False, "prover failed"
    data = write_zk_proof(zkp, circ, prover.param, F)
    zkp2 = read_zk_proof(data, circ, prover.param, F, rate, nreq)
    if zkp2 is None:
        return False, "reparse failed"
    verifier = ZkVerifier(circ, F, rs_factory, rate=rate, nreq=nreq,
                          block_enc=block_enc)
    tv = Transcript(init, version=K_VERSION)
    verifier.recv_commitment(zkp2, tv)
    return verifier.verify(zkp2, pub, tv)


def run_failing_test_zk(circ: Circuit, W: List, F, rs_factory,
                        rate: int = K_LIGERO_RATE, nreq: int = K_LIGERO_NREQ,
                        block_enc: Optional[int] = None) -> bool:
    """Prover must refuse an unsatisfying witness (zk_testing.h:88-113).
    Returns True if the prover correctly failed."""
    zkp = ZkProof(rate=rate, nreq=nreq)
    prover = ZkProver(circ, F, rs_factory, rate=rate, nreq=nreq,
                      block_enc=block_enc)
    tp = Transcript(b"zk_test", version=K_VERSION)
    try:
        prover.commit(zkp, W, tp, SecureRandomEngine())
        ok = prover.prove(zkp, W, tp)
    except AssertionError:
        return True
    return not ok
