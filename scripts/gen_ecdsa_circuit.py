#!/usr/bin/env python
"""Compile the ECDSA P-256 verify circuit (verify_signature3) and cache
it as a gzipped LFC1 file, so the ECDSA ZK benchmark (the reference's
BM_ECDSAZKProver, ecdsa/verify_test.cc:452-589) starts from the same
precompiled-circuit footing as the reference's test fixtures."""

import gzip
import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from longfellow_zk_tpu.circuits.ecdsa.verify import VerifyCircuit, EcdsaWitness
from longfellow_zk_tpu.compiler.logic import CompilerBackend, Logic
from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit, dump_info
from longfellow_zk_tpu.ec.curves import p256_curve
from longfellow_zk_tpu.fields.fp_instances import p256_base
from longfellow_zk_tpu.proto.lfc1 import P256_ID, write_circuit


def build():
    F = p256_base()
    ec = p256_curve()
    qc = QuadCircuit(F)
    L = Logic(CompilerBackend(qc), F)
    vc = VerifyCircuit(L, ec)
    pkx = L.eltw_input()
    pky = L.eltw_input()
    e = L.eltw_input()
    qc.private_input()
    w = EcdsaWitness(L, ec.kBits)
    vc.verify_signature3(pkx, pky, e, w)
    circ = qc.mkcircuit(nc=1)
    print(dump_info("ECDSA.verify_signature3", qc))
    return F, circ


def main():
    F, circ = build()
    data = write_circuit(F, P256_ID, circ)
    out = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "ecdsa_p256.lfc1.gz")
    with gzip.open(out, "wb") as f:
        f.write(data)
    print("wrote %s: %d bytes raw, %d gz, circuit id %s" % (
        out, len(data), os.path.getsize(out),
        hashlib.sha256(data).hexdigest()[:16]))


if __name__ == "__main__":
    main()
