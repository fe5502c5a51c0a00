#!/usr/bin/env python
"""Profile the 1-block SHA-256 ZK prove path phase by phase."""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from longfellow_zk_tpu.utils.cache import enable_compilation_cache, force_cpu
enable_compilation_cache()
if os.environ.get('BENCH_TPU') != '1':
    force_cpu()

import gzip

import jax.numpy as jnp
import numpy as np

from longfellow_zk_tpu.circuits.sha.sha256 import (
    SHA256_INIT, pack_block_witness, sha256_pad, transform_block_witness)
from longfellow_zk_tpu.fields.fp_instances import (
    fp128, P128_OMEGA, P128_OMEGA_ORDER)
from longfellow_zk_tpu.proto.lfc1 import FP128_ID, read_circuit
from longfellow_zk_tpu.random_oracle.engine import SecureRandomEngine
from longfellow_zk_tpu.random_oracle.transcript import Transcript
from longfellow_zk_tpu.zk.proof import ZkProof
from longfellow_zk_tpu.zk.prover import ZkProver
from longfellow_zk_tpu.zk.testing import rs_factory_for, K_VERSION
from longfellow_zk_tpu.zk.verifier import ZkVerifier
from longfellow_zk_tpu.zk.serialization import read_zk_proof, write_zk_proof


def witness_for_block(F, msg=b"abc"):
    padded = sha256_pad(msg)
    assert len(padded) == 64
    bw = transform_block_witness(SHA256_INIT, padded)
    W = [F.of_scalar(1)]
    for byte in padded:
        for i in range(8):
            W.append(F.of_scalar((byte >> i) & 1))
    W.extend(pack_block_witness(F, 4, [bw]))
    return W


def main():
    t0 = time.time()
    F = fp128()
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "sha256_1block_fp128.lfc1.gz")
    data = gzip.open(path, "rb").read()
    circ = read_circuit(F, FP128_ID, data)
    print(f"load circuit: {time.time()-t0:.2f}s  nl={circ.nl} "
          f"ninputs={circ.ninputs} nterms={circ.nterms()} "
          f"logws={[l.logw for l in circ.layers]} logc={circ.logc}")

    W = witness_for_block(F)
    assert len(W) == circ.ninputs, (len(W), circ.ninputs)

    rs_factory = rs_factory_for(F, P128_OMEGA, P128_OMEGA_ORDER)
    zkp = ZkProof(rate=4, nreq=128)
    prover = ZkProver(circ, F, rs_factory, rate=4, nreq=128)
    tp = Transcript(b"profile", version=K_VERSION)

    t = time.time()
    prover.commit(zkp, W, tp, SecureRandomEngine())
    print(f"commit: {time.time()-t:.2f}s", flush=True)

    # instrument prove() phases
    from longfellow_zk_tpu.zk import common as zkc
    from longfellow_zk_tpu.sumcheck.transcript_sumcheck import (
        TranscriptSumcheck)

    c = circ
    zkc.initialize_sumcheck_fiat_shamir(tp, c, W, F)
    tst = tp.clone()
    t = time.time()
    W0 = jnp.asarray(F.to_limbs(W)).reshape(F.L, c.ninputs, 1)
    inputs, finalV = prover.sumcheck.eval_circuit(c, W0)
    out = F.from_limbs(np.asarray(finalV))
    assert all(v == 0 for v in np.ravel(out))
    print(f"eval_circuit: {time.time()-t:.2f}s")

    t = time.time()
    tsts = TranscriptSumcheck(tst, F)
    proof, aux, _ = prover.sumcheck.prove(c, inputs, tsts, pad=prover.pad,
                                          with_aux=True)
    zkp.proof = proof
    print(f"sumcheck prove: {time.time()-t:.2f}s")

    t = time.time()
    a, b, ci = zkc.verifier_constraints(c, W, proof, aux, tp,
                                        prover.n_witness, F)
    print(f"verifier_constraints: {time.time()-t:.2f}s  nA={len(a)}")

    t = time.time()
    zkp.com_proof = prover.lp.prove(tp, ci, a, zkc.HASH_OF_A, prover.lqc)
    print(f"ligero prove: {time.time()-t:.2f}s")

    t = time.time()
    data = write_zk_proof(zkp, circ, prover.param, F)
    print(f"serialize: {time.time()-t:.2f}s  proof={len(data)}B")

    t = time.time()
    zkp2 = read_zk_proof(data, circ, prover.param, F, 4, 128)
    verifier = ZkVerifier(circ, F, rs_factory, rate=4, nreq=128)
    tv = Transcript(b"profile", version=K_VERSION)
    verifier.recv_commitment(zkp2, tv)
    ok, why = verifier.verify(zkp2, W[:circ.npub_in], tv)
    print(f"verify: {time.time()-t:.2f}s  ok={ok} {why}")
    print(f"TOTAL: {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
