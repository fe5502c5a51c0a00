"""ZK proof serialization roundtrip (reference zk_proof.h wire format)."""

import random

from longfellow_zk_tpu.fields.fp_instances import (
    fp128, P128_OMEGA, P128_OMEGA_ORDER)
from longfellow_zk_tpu.random_oracle.engine import DeterministicEngine
from longfellow_zk_tpu.random_oracle.transcript import Transcript
from longfellow_zk_tpu.transforms.ntt import (
    ReedSolomon, make_fft_convolution_factory)
from longfellow_zk_tpu.zk.proof import ZkProof
from longfellow_zk_tpu.zk.prover import ZkProver
from longfellow_zk_tpu.zk.serialization import read_zk_proof, write_zk_proof
from longfellow_zk_tpu.zk.verifier import ZkVerifier

from test_zk import _rs_factory, _zk_circuit


def test_zk_proof_serialization_roundtrip():
    F = fp128()
    factory = _rs_factory(F)
    circ = _zk_circuit(F)
    rng = random.Random(31)
    a, b = rng.randrange(F.p), rng.randrange(F.p)
    c = F.mul_i(a, b)
    W = [c, 1, a, b]
    zkp = ZkProof(rate=4, nreq=6)
    prover = ZkProver(circ, F, factory, rate=4, nreq=6, block_enc=128)
    tsp = Transcript(b"zk_ser")
    prover.commit(zkp, W, tsp, DeterministicEngine())
    assert prover.prove(zkp, W, tsp)

    data = write_zk_proof(zkp, circ, prover.param, F)
    assert isinstance(data, bytes) and len(data) > 100

    zkp2 = read_zk_proof(data, circ, prover.param, F, rate=4, nreq=6)
    assert zkp2 is not None
    # write(read(x)) == x
    assert write_zk_proof(zkp2, circ, prover.param, F) == data

    # the deserialized proof verifies
    verifier = ZkVerifier(circ, F, factory, rate=4, nreq=6, block_enc=128)
    tsv = Transcript(b"zk_ser")
    verifier.recv_commitment(zkp2, tsv)
    ok, why = verifier.verify(zkp2, [c, 1], tsv)
    assert ok, why

    # corrupted bytes fail to parse or fail to verify
    bad = bytearray(data)
    bad[40] ^= 1
    zkp3 = read_zk_proof(bytes(bad), circ, prover.param, F, rate=4, nreq=6)
    if zkp3 is not None:
        tsv2 = Transcript(b"zk_ser")
        verifier.recv_commitment(zkp3, tsv2)
        ok2, _ = verifier.verify(zkp3, [c, 1], tsv2)
        assert not ok2
    # truncated fails
    assert read_zk_proof(data[:-5], circ, prover.param, F, 4, 6) is None
