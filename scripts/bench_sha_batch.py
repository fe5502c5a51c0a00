#!/usr/bin/env python
"""Throughput benchmark: B independent 1-block ZK-SHA256 proofs per
device launch pair (batched commit + batched fused prove, zk/batch.py).

The TPU story for small proofs: single-proof latency is bounded by
sequential Fiat-Shamir rounds + relay turnaround, but the whole pipeline
vmaps over a proof axis, so serving throughput scales with batch size
until the VPU lanes saturate.  Reference: BM_ShaZK_fp2_128/1 = 5.30 ms
per proof single-threaded (BASELINE.md).

  BENCH_TPU=1 python scripts/bench_sha_batch.py   # real chip
  python scripts/bench_sha_batch.py               # CPU
"""

import gzip
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from longfellow_zk_tpu.utils.cache import enable_compilation_cache, force_cpu
enable_compilation_cache()
if os.environ.get("BENCH_TPU") != "1":
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=1")
    force_cpu()

from longfellow_zk_tpu.circuits.sha.sha256 import (
    SHA256_INIT, pack_block_witness, sha256_pad, transform_block_witness)
from longfellow_zk_tpu.fields.fp_instances import (
    fp128, P128_OMEGA, P128_OMEGA_ORDER)
from longfellow_zk_tpu.proto.lfc1 import FP128_ID, read_circuit
from longfellow_zk_tpu.random_oracle.engine import SecureRandomEngine
from longfellow_zk_tpu.random_oracle.transcript import Transcript
from longfellow_zk_tpu.zk.batch import BatchZkProver
from longfellow_zk_tpu.zk.testing import rs_factory_for, K_VERSION


def witness_for_block(F, msg):
    padded = sha256_pad(msg)
    bw = transform_block_witness(SHA256_INIT, padded)
    W = [F.of_scalar(1)]
    for byte in padded:
        for i in range(8):
            W.append(F.of_scalar((byte >> i) & 1))
    W.extend(pack_block_witness(F, 4, [bw]))
    return W


def main():
    B = int(os.environ.get("BENCH_B", "8"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    F = fp128()
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "sha256_1block_fp128.lfc1.gz")
    circ = read_circuit(F, FP128_ID, gzip.open(path, "rb").read())
    rs_factory = rs_factory_for(F, P128_OMEGA, P128_OMEGA_ORDER)

    print("setup done", flush=True)
    W_list = [witness_for_block(F, b"msg%04d" % i) for i in range(B)]
    bp = BatchZkProver(circ, F, rs_factory, rate=4, nreq=128)

    def tags():
        return [Transcript(b"bench%d" % i, version=K_VERSION)
                for i in range(B)]

    t0 = time.perf_counter()
    proofs = bp.prove_batch(W_list, tags(), SecureRandomEngine())
    print(f"warmup: {time.perf_counter()-t0:.2f}s "
          f"proof={len(proofs[0])}B x {B}", flush=True)

    t0 = time.perf_counter()
    for _ in range(iters):
        proofs = bp.prove_batch(W_list, tags(), SecureRandomEngine())
    dt = (time.perf_counter() - t0) / iters
    print(f"batch={B} total_ms {dt*1000:.1f} per_proof_ms {dt/B*1000:.2f} "
          f"proofs_per_s {B/dt:.1f}", flush=True)


if __name__ == "__main__":
    main()
