#!/usr/bin/env python
"""Time the full mdoc anonymous-credential prove/verify (the reference's
BM_MdocProver / BM_MdocVerifier, mdoc_zk_test.cc:658-721) on our stack.

Local reference C++ baseline on this machine (BASELINE.md): prover
2398.6 ms, verifier 959.5 ms (v7 1-attribute shipped circuit).

  BENCH_TPU=1 python scripts/bench_mdoc.py   # real chip (single-tenant!)
  python scripts/bench_mdoc.py               # CPU
"""

import json
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

from longfellow_zk_tpu.circuits.mdoc import api
from longfellow_zk_tpu.circuits.mdoc.witness import RequestedAttribute
from longfellow_zk_tpu.circuits.mdoc.zk_spec import find_zk_spec_by_version
from longfellow_zk_tpu.random_oracle.engine import SecureRandomEngine

CIRCUITS_DIR = "/root/reference/lib/circuits/mdoc/circuits"
EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "mdoc_examples.json")


def main():
    iters = int(os.environ.get("BENCH_MDOC_ITERS", "2"))
    spec = find_zk_spec_by_version(7, 1)
    path = os.path.join(CIRCUITS_DIR, spec.circuit_hash)
    circuit_bytes = open(path, "rb").read()
    ex = json.load(open(EXAMPLES))[0]
    mdoc, tr = bytes.fromhex(ex["mdoc"]), bytes.fromhex(ex["transcript"])
    pkx, pky, now = int(ex["pkx"], 16), int(ex["pky"], 16), ex["now"].encode()
    attrs = [RequestedAttribute(id=b"age_over_18", cbor_value=b"\xf5")]
    doc_type = b"org.iso.18013.5.1.mDL"

    t0 = time.perf_counter()
    proof = api.run_mdoc_prover(circuit_bytes, mdoc, pkx, pky, tr, attrs,
                                now, spec, rng=SecureRandomEngine())
    warm = time.perf_counter() - t0
    print(f"warmup prove: {warm:.2f}s  proof={len(proof)}B", flush=True)

    t0 = time.perf_counter()
    for _ in range(iters):
        proof = api.run_mdoc_prover(circuit_bytes, mdoc, pkx, pky, tr,
                                    attrs, now, spec,
                                    rng=SecureRandomEngine())
    prove_ms = (time.perf_counter() - t0) / iters * 1000.0
    print(f"mdoc_prover_ms {prove_ms:.1f}", flush=True)

    ok = api.run_mdoc_verifier(circuit_bytes, pkx, pky, tr, attrs, now,
                               proof, doc_type, spec)
    assert ok
    t0 = time.perf_counter()
    for _ in range(iters):
        ok = api.run_mdoc_verifier(circuit_bytes, pkx, pky, tr, attrs, now,
                                   proof, doc_type, spec)
        assert ok
    verify_ms = (time.perf_counter() - t0) / iters * 1000.0
    print(f"mdoc_verifier_ms {verify_ms:.1f}", flush=True)


if __name__ == "__main__":
    main()
