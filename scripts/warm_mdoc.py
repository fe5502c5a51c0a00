#!/usr/bin/env python
"""Warm the mdoc bench phase on the TPU: compile+cache every program in
the run_mdoc_prover / run_mdooc_verifier path, then time warm runs and
run the mdoc-scale proof interop against the reference C++ binary.

Run as THE ONLY TPU process.  Never kill mid-compile."""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from longfellow_zk_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    t0 = time.perf_counter()
    print("devices:", jax.devices(), flush=True)

    from longfellow_zk_tpu.circuits.mdoc import api
    from longfellow_zk_tpu.circuits.mdoc.witness import RequestedAttribute
    from longfellow_zk_tpu.circuits.mdoc.zk_spec import find_zk_spec_by_version
    from longfellow_zk_tpu.random_oracle.engine import SecureRandomEngine

    spec = find_zk_spec_by_version(7, 1)
    path = os.path.join("/root/reference/lib/circuits/mdoc/circuits",
                        spec.circuit_hash)
    circuit_bytes = open(path, "rb").read()
    ex = json.load(open(os.path.join(REPO, "artifacts",
                                     "mdoc_examples.json")))[0]
    mdoc, tr = bytes.fromhex(ex["mdoc"]), bytes.fromhex(ex["transcript"])
    pkx, pky = int(ex["pkx"], 16), int(ex["pky"], 16)
    now = ex["now"].encode()
    attrs = [RequestedAttribute(id=b"age_over_18", cbor_value=b"\xf5")]

    print("parsing circuits...", flush=True)
    api.load_circuits(circuit_bytes)
    print("parsed at +%.0fs" % (time.perf_counter() - t0), flush=True)

    def prove():
        return api.run_mdoc_prover(circuit_bytes, mdoc, pkx, pky, tr,
                                   attrs, now, spec,
                                   rng=SecureRandomEngine())

    print("cold prove (compiles)...", flush=True)
    tp = time.perf_counter()
    proof = prove()
    print("cold prove: %.1fs, proof %d bytes" %
          (time.perf_counter() - tp, len(proof)), flush=True)

    tp = time.perf_counter()
    proof = prove()
    print("warm prove: %.3fs" % (time.perf_counter() - tp), flush=True)

    with open(os.path.join(REPO, "artifacts", "our_mdoc_proof.bin"),
              "wb") as f:
        f.write(proof)
    print("wrote artifacts/our_mdoc_proof.bin", flush=True)

    def verify(p):
        return api.run_mdoc_verifier(circuit_bytes, pkx, pky, tr, attrs,
                                     now, p, b"org.iso.18013.5.1.mDL",
                                     spec)

    print("cold verify (compiles)...", flush=True)
    tp = time.perf_counter()
    ok = verify(proof)
    print("cold verify: %.1fs ok=%s" % (time.perf_counter() - tp, ok),
          flush=True)
    assert ok
    tp = time.perf_counter()
    ok = verify(proof)
    print("warm verify: %.3fs ok=%s" % (time.perf_counter() - tp, ok),
          flush=True)

    # mdoc-scale interop: OUR verifier on the REFERENCE C++ proof
    ref_path = os.path.join(REPO, "artifacts", "ref_mdoc_proof.bin")
    if os.path.exists(ref_path):
        refp = open(ref_path, "rb").read()
        tp = time.perf_counter()
        ok = verify(refp)
        print("our verifier on REFERENCE proof: ok=%s (%.1fs)" %
              (ok, time.perf_counter() - tp), flush=True)
        assert ok, "reference proof must verify"
        print("INTEROP_REF2US_OK", flush=True)

    print("WARM_MDOC DONE at +%.0fs" % (time.perf_counter() - t0),
          flush=True)


if __name__ == "__main__":
    main()
