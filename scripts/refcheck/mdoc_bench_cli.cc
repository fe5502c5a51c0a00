// Local baseline for the reference's BM_MdocProver / BM_MdocVerifier
// (mdoc_zk_test.cc:658-721): no published milliseconds exist for the
// end-to-end mdoc prover (BASELINE.md:29-31), so we time the REFERENCE
// C++ `run_mdoc_prover` / `run_mdoc_verifier` on THIS machine's CPU to
// establish the number our TPU prover must beat.
//
//   mdoc_bench_cli <circuit-file> [prover-iters] [verifier-iters]
//
// Interop modes (mdoc-scale cross-implementation check — the
// reference's own bar is bit-level proof interop on the real
// application, rust/README.md:45):
//
//   mdoc_bench_cli <circuit-file> prove-out <path>
//       run the REFERENCE prover on mdoc_tests[0]/age_over_18 and write
//       the proof bytes to <path> (for the Python run_mdoc_verifier).
//   mdoc_bench_cli <circuit-file> verify-in <path>
//       read proof bytes produced by the Python run_mdoc_prover from
//       <path> and check them with the REFERENCE run_mdoc_verifier
//       (mdoc_zk.h:180-192).  Prints INTEROP_VERIFY_OK on success.
//
// <circuit-file>: a shipped compressed circuit from
// lib/circuits/mdoc/circuits/ whose name matches kZkSpecs[0]'s
// circuit_hash (generate_circuit output bytes, README.md there).
// Prints one line per phase: "mdoc_prover_ms <ms>" etc.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <ctime>
#include <fstream>
#include <iterator>
#include <string>
#include <vector>

#include "circuits/mdoc/mdoc_examples.h"
#include "circuits/mdoc/mdoc_test_attributes.h"
#include "circuits/mdoc/mdoc_zk.h"
#include "util/log.h"

namespace {

using namespace proofs;

bool slurp(const std::string& path, std::vector<uint8_t>* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  out->assign(std::istreambuf_iterator<char>(f),
              std::istreambuf_iterator<char>());
  return true;
}

double now_ms() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec * 1000.0 + ts.tv_nsec / 1e6;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <circuit-file> [prover-iters] [verifier-iters]\n",
            argv[0]);
    return 2;
  }
  set_log_level(ERROR);
  int piters = argc > 2 ? atoi(argv[2]) : 3;
  int viters = argc > 3 ? atoi(argv[3]) : 3;

  std::vector<uint8_t> circuit;
  if (!slurp(argv[1], &circuit)) {
    fprintf(stderr, "cannot read %s\n", argv[1]);
    return 2;
  }

  const ZkSpecStruct& zk_spec = kZkSpecs[0];  // v7, 1 attribute
  const RequestedAttribute attrs[1] = {test::age_over_18};
  const MdocTests* test = &mdoc_tests[0];
  size_t num_attrs = 1;

  const std::string mode = argc > 2 ? argv[2] : "";
  if (mode == "verify-in") {
    std::vector<uint8_t> proof;
    if (argc < 4 || !slurp(argv[3], &proof)) {
      fprintf(stderr, "cannot read proof file\n");
      return 2;
    }
    MdocVerifierErrorCode rv = run_mdoc_verifier(
        circuit.data(), circuit.size(), test->pkx.as_pointer,
        test->pky.as_pointer, test->transcript, test->transcript_size,
        attrs, num_attrs, (const char*)test->now, proof.data(),
        proof.size(), test->doc_type, &zk_spec);
    if (rv != MDOC_VERIFIER_SUCCESS) {
      fprintf(stderr, "INTEROP_VERIFY_FAIL %d\n", (int)rv);
      return 1;
    }
    printf("INTEROP_VERIFY_OK\n");
    return 0;
  }
  if (mode == "prove-out") {
    if (argc < 4) return 2;
    uint8_t* zp = nullptr;
    size_t pl = 0;
    MdocProverErrorCode rp = run_mdoc_prover(
        circuit.data(), circuit.size(), test->mdoc, test->mdoc_size,
        test->pkx.as_pointer, test->pky.as_pointer, test->transcript,
        test->transcript_size, attrs, num_attrs, (const char*)test->now,
        &zp, &pl, &zk_spec);
    if (rp != MDOC_PROVER_SUCCESS) {
      fprintf(stderr, "prover failed: %d\n", (int)rp);
      return 1;
    }
    std::ofstream out(argv[3], std::ios::binary);
    out.write((const char*)zp, pl);
    out.close();
    printf("INTEROP_PROVE_OK %zu\n", pl);
    free(zp);
    return 0;
  }

  // one warm-up prove, kept for the verifier timing
  uint8_t* zkproof = nullptr;
  size_t proof_len = 0;
  MdocProverErrorCode ret = run_mdoc_prover(
      circuit.data(), circuit.size(), test->mdoc, test->mdoc_size,
      test->pkx.as_pointer, test->pky.as_pointer, test->transcript,
      test->transcript_size, attrs, num_attrs, (const char*)test->now,
      &zkproof, &proof_len, &zk_spec);
  if (ret != MDOC_PROVER_SUCCESS) {
    fprintf(stderr, "prover failed: %d\n", (int)ret);
    return 1;
  }
  printf("proof_len %zu\n", proof_len);

  double t0 = now_ms();
  for (int i = 0; i < piters; ++i) {
    uint8_t* zp = nullptr;
    size_t pl = 0;
    ret = run_mdoc_prover(circuit.data(), circuit.size(), test->mdoc,
                          test->mdoc_size, test->pkx.as_pointer,
                          test->pky.as_pointer, test->transcript,
                          test->transcript_size, attrs, num_attrs,
                          (const char*)test->now, &zp, &pl, &zk_spec);
    if (ret != MDOC_PROVER_SUCCESS) return 1;
    free(zp);
  }
  printf("mdoc_prover_ms %.3f\n", (now_ms() - t0) / piters);

  t0 = now_ms();
  for (int i = 0; i < viters; ++i) {
    MdocVerifierErrorCode rv = run_mdoc_verifier(
        circuit.data(), circuit.size(), test->pkx.as_pointer,
        test->pky.as_pointer, test->transcript, test->transcript_size, attrs,
        num_attrs, (const char*)test->now, zkproof, proof_len, test->doc_type,
        &zk_spec);
    if (rv != MDOC_VERIFIER_SUCCESS) {
      fprintf(stderr, "verifier failed: %d\n", (int)rv);
      return 1;
    }
  }
  printf("mdoc_verifier_ms %.3f\n", (now_ms() - t0) / viters);
  free(zkproof);
  return 0;
}
