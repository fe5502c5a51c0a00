#!/usr/bin/env python
"""Drive the reference-shipped v7 1-attribute mdoc circuits with our
witness builders and check satisfiability (eval_circuit == 0)."""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from longfellow_zk_tpu.utils.cache import enable_compilation_cache, force_cpu
enable_compilation_cache()
if os.environ.get('BENCH_TPU') != '1':
    force_cpu()

import jax.numpy as jnp
import numpy as np

from longfellow_zk_tpu.circuits.mdoc import api
from longfellow_zk_tpu.circuits.mdoc.witness import (
    MdocHashWitness, MdocSignatureWitness, RequestedAttribute)
from longfellow_zk_tpu.circuits.mdoc.zk_spec import find_zk_spec_by_version
from longfellow_zk_tpu.ec.curves import p256_curve
from longfellow_zk_tpu.random_oracle.engine import DeterministicEngine
from longfellow_zk_tpu.sumcheck.prover_device import DeviceSumcheckProver
from longfellow_zk_tpu.circuits.mac.mac import MACReference

CIRCUITS_DIR = "/root/reference/lib/circuits/mdoc/circuits"


def main():
    spec = find_zk_spec_by_version(7, 1)
    data = open(os.path.join(CIRCUITS_DIR, spec.circuit_hash), "rb").read()
    c_sig, c_hash = api.load_circuits(data)
    print(f"sig: ninputs={c_sig.ninputs} npub={c_sig.npub_in} "
          f"hash: ninputs={c_hash.ninputs} npub={c_hash.npub_in}")

    ex = json.load(open(os.path.join(
        os.path.dirname(__file__), "..", "artifacts",
        "mdoc_examples.json")))[0]
    mdoc = bytes.fromhex(ex["mdoc"])
    tr = bytes.fromhex(ex["transcript"])
    pkx, pky = int(ex["pkx"], 16), int(ex["pky"], 16)
    now = ex["now"].encode()
    attrs = [RequestedAttribute(id=b"age_over_18", cbor_value=b"\xf5")]

    GF, FB = api.GF, api.FB
    version = spec.version

    hw = MdocHashWitness(1, GF, version)
    hw.compute_witness(mdoc, tr, attrs)
    sw = MdocSignatureWitness(p256_curve(), FB)
    sw.compute_witness(pkx, pky, mdoc, tr)
    print("witnesses computed; e match:", hw.e_nat == sw.e_nat)

    rng = DeterministicEngine(b"mdoc eval")
    mac_ref = MACReference()
    ap = mac_ref.sample(6, rng)
    av = int.from_bytes(rng.bytes(16), "little")
    macs, _ = api.compute_macs(
        [hw.e_nat % FB.p, hw.dpkx_nat, hw.dpky_nat], ap, av)

    # ---- sig witness ----
    W_sig = api.fill_sig_public(pkx, pky, sw.e2_nat, macs, av)
    assert len(W_sig) == c_sig.npub_in, (len(W_sig), c_sig.npub_in)
    W_sig.extend(sw.fill_witness(ap))
    assert len(W_sig) == c_sig.ninputs, (len(W_sig), c_sig.ninputs)

    t = time.time()
    prover = DeviceSumcheckProver(FB)
    W0 = jnp.asarray(FB.to_limbs(W_sig)).reshape(FB.L, c_sig.ninputs, 1)
    inputs, finalV = prover.eval_circuit(c_sig, W0)
    ok_s = finalV is not None and all(
        v == 0 for v in np.ravel(FB.from_limbs(np.asarray(finalV))))
    print(f"SIG eval: {time.time()-t:.1f}s satisfied={ok_s}", flush=True)

    # ---- hash witness ----
    W_hash = api.fill_hash_public(attrs, now, macs, av, version)
    assert len(W_hash) == c_hash.npub_in, (len(W_hash), c_hash.npub_in)
    for val in (hw.e_nat % FB.p, hw.dpkx_nat, hw.dpky_nat):
        W_hash.extend(GF.of_scalar((val >> i) & 1) for i in range(256))
    W_hash.extend(hw.fill_witness())
    for i in range(3):
        W_hash.extend(ap[2 * i : 2 * i + 2])
    assert len(W_hash) == c_hash.ninputs, (len(W_hash), c_hash.ninputs)
    assert c_hash.subfield_boundary == c_hash.ninputs - 6

    t = time.time()
    hprover = DeviceSumcheckProver(GF)
    W0h = jnp.asarray(GF.to_limbs(W_hash)).reshape(8, c_hash.ninputs, 1)
    inputs_h, finalV_h = hprover.eval_circuit(c_hash, W0h)
    okh = finalV_h is not None and all(
        v == 0 for v in np.ravel(GF.from_limbs(np.asarray(finalV_h))))
    print(f"HASH eval: {time.time()-t:.1f}s satisfied={okh}")


if __name__ == "__main__":
    main()
