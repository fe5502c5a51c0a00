"""Multi-chip PRODUCTION prover: the real ZkProver / BatchZkProver /
DeviceSumcheckProver running end-to-end over a jax.sharding.Mesh (8
virtual CPU devices), with proof bytes asserted IDENTICAL to the
single-device run.  This is the integration the standalone kernels in
parallel/ can't cover: challenge streams, layer transitions, and the
Ligero handoff under sharding (reference prover_layers.h:34-36,
SURVEY §2.15/§7 step 8)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longfellow_zk_tpu.fields.fp_instances import fp128
from longfellow_zk_tpu.parallel.mesh import make_mesh, shard_copies
from longfellow_zk_tpu.random_oracle.engine import DeterministicEngine
from longfellow_zk_tpu.random_oracle.transcript import Transcript
from longfellow_zk_tpu.sumcheck.prover_device import DeviceSumcheckProver
from longfellow_zk_tpu.sumcheck.transcript_sumcheck import TranscriptSumcheck
from longfellow_zk_tpu.sumcheck.verifier import verify
from longfellow_zk_tpu.zk.proof import ZkProof
from longfellow_zk_tpu.zk.prover import ZkProver
from longfellow_zk_tpu.zk.serialization import write_zk_proof
from longfellow_zk_tpu.zk.verifier import ZkVerifier

from test_sumcheck import _device_w, _mul_check_circuit, _witness
from test_zk import _rs_factory, _zk_circuit

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _prove_zk(circ, F, factory, W, mesh):
    zkp = ZkProof(rate=4, nreq=6)
    prover = ZkProver(circ, F, factory, rate=4, nreq=6, block_enc=128,
                      mesh=mesh)
    tsp = Transcript(b"mesh_test")
    prover.commit(zkp, W, tsp, DeterministicEngine(b"meshseed"))
    assert prover.prove(zkp, W, tsp)
    return write_zk_proof(zkp, circ, prover.param, F), tsp


@needs8
def test_zkprover_mesh_bit_identical():
    """Full ZkProver (commit + sumcheck + Ligero responses) with the
    tableau rows sharded over an 8-device mesh: byte-identical proof."""
    F = fp128()
    factory = _rs_factory(F)
    circ = _zk_circuit(F)
    rng = random.Random(31)
    a, b = rng.randrange(F.p), rng.randrange(F.p)
    W = [F.mul_i(a, b), F.of_scalar(1), a, b]

    blob0, ts0 = _prove_zk(circ, F, factory, W, mesh=None)
    mesh = make_mesh(8, 1)
    blob1, ts1 = _prove_zk(circ, F, factory, W, mesh=mesh)
    assert blob0 == blob1
    assert ts0.elt(F) == ts1.elt(F)

    verifier = ZkVerifier(circ, F, factory, rate=4, nreq=6, block_enc=128)
    from longfellow_zk_tpu.zk.serialization import read_zk_proof
    zkp = read_zk_proof(blob1, circ, verifier.param, F, 4, 6)
    tsv = Transcript(b"mesh_test")
    verifier.recv_commitment(zkp, tsv)
    ok, why = verifier.verify(zkp, [W[0], W[1]], tsv)
    assert ok, why


@needs8
def test_sumcheck_copy_axis_sharded_proof():
    """Production DeviceSumcheckProver with the copy axis (nc=8) sharded
    across the mesh: full multi-layer proof, bit-identical bytes."""
    F = fp128()
    circ = _mul_check_circuit(F, 8)
    rng = random.Random(41)
    W_host = [_witness(F, rng) for _ in range(8)]
    W0 = _device_w(F, W_host)

    dev_p = DeviceSumcheckProver(F)
    ts0 = Transcript(b"meshsc")
    tss0 = TranscriptSumcheck(ts0, F)
    tss0.write_input(W_host)
    proof0, aux0, _ = dev_p.prove_with_witness(circ, W0, tss0,
                                               with_aux=True)
    assert proof0 is not None

    mesh = make_mesh(1, 8)
    W0s = jax.device_put(W0, shard_copies(mesh, nlead=1))
    ts1 = Transcript(b"meshsc")
    tss1 = TranscriptSumcheck(ts1, F)
    tss1.write_input(W_host)
    proof1, aux1, _ = dev_p.prove_with_witness(circ, W0s, tss1,
                                               with_aux=True)
    assert proof1 is not None
    for l0, l1 in zip(proof0.layers, proof1.layers):
        assert l0.cp == l1.cp and l0.hp == l1.hp and l0.wc == l1.wc
    assert aux0.bound_quad == aux1.bound_quad
    assert ts0.elt(F) == ts1.elt(F)

    tsv = Transcript(b"meshsc")
    ok, why = verify(circ, proof1, W_host, TranscriptSumcheck(tsv, F), F)
    assert ok, why


@needs8
def test_batch_prover_mesh_dp():
    """BatchZkProver with the proof axis sharded over 8 devices (serving
    data parallelism): all B proofs byte-identical to unsharded."""
    from longfellow_zk_tpu.zk.batch import BatchZkProver

    F = fp128()
    factory = _rs_factory(F)
    circ = _zk_circuit(F)
    rng = random.Random(51)
    B = 8
    W_list = []
    for _ in range(B):
        a, b = rng.randrange(F.p), rng.randrange(F.p)
        W_list.append([F.mul_i(a, b), F.of_scalar(1), a, b])

    def run(mesh):
        bp = BatchZkProver(circ, F, factory, rate=4, nreq=6, mesh=mesh)
        ts = [Transcript(b"meshb%d" % i) for i in range(B)]
        return bp.prove_batch(W_list, ts, DeterministicEngine(b"bseed"))

    blobs0 = run(None)
    blobs1 = run(make_mesh(8, 1))
    assert blobs0 == blobs1
