#!/bin/sh
# Build the reference longfellow-zk library (header-template C++ from
# /root/reference/lib, compiled in place, never copied into this repo)
# against the minimal OpenSSL shim, producing the interop CLI used by
# tests/test_refcheck.py.
set -e
cd "$(dirname "$0")"
REF=${REF:-/root/reference/lib}
mkdir -p _build
g++ -O1 -std=c++17 -w -march=native \
    -I "$REF" -I shim \
    refcheck_cli.cc \
    shim/shim.c \
    "$REF/util/crypto.cc" \
    "$REF/util/log.cc" \
    "$REF/algebra/nat.cc" \
    "$REF/ec/p256.cc" \
    -o _build/refcheck_cli
echo "built _build/refcheck_cli"
g++ -O2 -std=c++17 -w -march=native \
    -I "$REF" -I shim \
    mdoc_bench_cli.cc \
    shim/shim.c \
    "$REF/util/crypto.cc" \
    "$REF/util/log.cc" \
    "$REF/algebra/nat.cc" \
    "$REF/ec/p256.cc" \
    "$REF/circuits/mdoc/mdoc_zk.cc" \
    "$REF/circuits/mdoc/mdoc_decompress.cc" \
    "$REF/circuits/mdoc/zk_spec.cc" \
    "$REF/circuits/sha/flatsha256_witness.cc" \
    "$REF/circuits/sha/sha256_constants.cc" \
    -lzstd \
    -o _build/mdoc_bench_cli
echo "built _build/mdoc_bench_cli"
