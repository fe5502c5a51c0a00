#!/usr/bin/env python
"""Compile the one-block flat SHA-256 transform circuit over Fp128 and
cache it as a gzipped LFC1 file (the analogue of the reference's
pre-built circuit cache, lib/circuits/mdoc/circuits/)."""

import gzip
import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from longfellow_zk_tpu.circuits.sha.sha256 import (
    FlatSHA256Circuit, SHA256_INIT)
from longfellow_zk_tpu.compiler.logic import CompilerBackend, Logic
from longfellow_zk_tpu.compiler.quad_circuit import QuadCircuit, dump_info
from longfellow_zk_tpu.fields.fp_instances import fp128
from longfellow_zk_tpu.proto.lfc1 import FP128_ID, write_circuit


def build():
    F = fp128()
    qc = QuadCircuit(F)
    L = Logic(CompilerBackend(qc), F)
    sha = FlatSHA256Circuit(L, plucker_logn=4)
    qc.private_input()
    inb = [L.vinput(8) for _ in range(64)]
    tmp = []
    for i in range(16):
        tmp.append(L.vappend(L.vappend(inb[4 * i + 3], inb[4 * i + 2]),
                             L.vappend(inb[4 * i + 1], inb[4 * i + 0])))
    bw = sha.block_witness_input()
    H0 = [L.bits(32, v) for v in SHA256_INIT]
    sha.assert_transform_block_packed(tmp, H0, bw)
    circ = qc.mkcircuit(nc=1)
    print(dump_info("FlatSHA256.assert_transform_block_packed", qc))
    return F, circ


def main():
    F, circ = build()
    data = write_circuit(F, FP128_ID, circ)
    out = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "sha256_1block_fp128.lfc1.gz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with gzip.open(out, "wb") as f:
        f.write(data)
    print("wrote %s: %d bytes raw, %d gz, circuit id %s" % (
        out, len(data), os.path.getsize(out),
        hashlib.sha256(data).hexdigest()[:16]))


if __name__ == "__main__":
    main()
