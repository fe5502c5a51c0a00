// Cross-implementation interop CLI: drives the REFERENCE longfellow-zk
// C++ library (built from /root/reference/lib against the OpenSSL shim
// in shim/) so the Python/TPU implementation can assert byte-level
// proof interoperability both directions (rust/README.md:45 duty):
//
//   refcheck_cli prove  <fp128|gf2128|p256> <circuit.lfc1> <witness.bin>
//                       <proof.out> <rate> <nreq>
//   refcheck_cli verify <fp128|gf2128|p256> <circuit.lfc1> <pub.bin>
//                       <proof.bin> <rate> <nreq>
//
// witness.bin / pub.bin: ninputs consecutive canonical little-endian
// field elements (Field::kBytes each, of_bytes_field encoding); pub is
// zero beyond the public prefix, matching Dense zero-initialization in
// the reference's zk_testing.h:44-86 flow.
//
// Exit codes: 0 success / proof valid, 1 prove-or-verify failed,
// 2 usage / IO / parse error.
//
// The Transcript tag and version mirror our zk/testing.py
// (b"zk_test", version 7), which itself mirrors zk_testing.h:66.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iterator>
#include <memory>
#include <string>
#include <vector>

#include "algebra/convolution.h"
#include "algebra/fp2.h"
#include "algebra/fp_p128.h"
#include "algebra/reed_solomon.h"
#include "arrays/dense.h"
#include "ec/p256.h"
#include "gf2k/gf2_128.h"
#include "gf2k/lch14_reed_solomon.h"
#include "proto/circuit_io.h"
#include "proto/circuit_reader.h"
#include "random/secure_random_engine.h"
#include "random/transcript.h"
#include "util/log.h"
#include "util/readbuffer.h"
#include "zk/zk_proof.h"
#include "zk/zk_prover.h"
#include "zk/zk_verifier.h"

namespace {

using namespace proofs;

constexpr size_t kVersion = 7;
const uint8_t kTag[] = "zk_test";
constexpr size_t kTagLen = 7;

bool slurp(const std::string& path, std::vector<uint8_t>* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  out->assign(std::istreambuf_iterator<char>(f),
              std::istreambuf_iterator<char>());
  return true;
}

bool dump(const std::string& path, const std::vector<uint8_t>& data) {
  std::ofstream f(path, std::ios::binary);
  if (!f) return false;
  f.write(reinterpret_cast<const char*>(data.data()),
          static_cast<std::streamsize>(data.size()));
  return f.good();
}

template <class Field>
std::unique_ptr<Circuit<Field>> read_circuit(const Field& F, FieldID fid,
                                             const std::string& path) {
  std::vector<uint8_t> bytes;
  if (!slurp(path, &bytes)) {
    fprintf(stderr, "refcheck: cannot read circuit %s\n", path.c_str());
    return nullptr;
  }
  ReadBuffer rb(bytes);
  CircuitReader<Field> reader(F, fid);
  auto c = reader.from_bytes(rb, /*enforce_circuit_id=*/true);
  if (!c) fprintf(stderr, "refcheck: circuit parse / id check failed\n");
  return c;
}

template <class Field>
bool read_dense(const Field& F, const std::string& path, size_t n,
                Dense<Field>* W) {
  std::vector<uint8_t> bytes;
  if (!slurp(path, &bytes)) {
    fprintf(stderr, "refcheck: cannot read %s\n", path.c_str());
    return false;
  }
  if (bytes.size() != n * Field::kBytes) {
    fprintf(stderr, "refcheck: %s: want %zu bytes (= %zu elts), got %zu\n",
            path.c_str(), n * Field::kBytes, n, bytes.size());
    return false;
  }
  for (size_t i = 0; i < n; ++i) {
    auto e = F.of_bytes_field(&bytes[i * Field::kBytes]);
    if (!e.has_value()) {
      fprintf(stderr, "refcheck: %s: element %zu out of range\n", path.c_str(),
              i);
      return false;
    }
    W->v_[i] = *e;
  }
  return true;
}

template <class Field, class RSFactory>
int do_prove(const Field& F, FieldID fid, const RSFactory& rsf,
             const std::string& circuit_path, const std::string& witness_path,
             const std::string& proof_path, size_t rate, size_t nreq) {
  auto circuit = read_circuit(F, fid, circuit_path);
  if (!circuit) return 2;
  Dense<Field> W(1, circuit->ninputs);
  if (!read_dense(F, witness_path, circuit->ninputs, &W)) return 2;

  ZkProof<Field> zkpr(*circuit, rate, nreq);
  Transcript tp(kTag, kTagLen, kVersion);
  SecureRandomEngine rng;
  ZkProver<Field, RSFactory> prover(*circuit, F, rsf);
  prover.commit(zkpr, W, tp, rng);
  if (!prover.prove(zkpr, W, tp)) {
    fprintf(stderr, "refcheck: reference prover FAILED\n");
    return 1;
  }
  std::vector<uint8_t> zbuf;
  zkpr.write(zbuf, F);
  if (!dump(proof_path, zbuf)) return 2;
  fprintf(stderr, "refcheck: proof %zu bytes -> %s\n", zbuf.size(),
          proof_path.c_str());
  return 0;
}

template <class Field, class RSFactory>
int do_verify(const Field& F, FieldID fid, const RSFactory& rsf,
              const std::string& circuit_path, const std::string& pub_path,
              const std::string& proof_path, size_t rate, size_t nreq) {
  auto circuit = read_circuit(F, fid, circuit_path);
  if (!circuit) return 2;
  Dense<Field> pub(1, circuit->ninputs);
  if (!read_dense(F, pub_path, circuit->ninputs, &pub)) return 2;
  std::vector<uint8_t> pbytes;
  if (!slurp(proof_path, &pbytes)) return 2;

  ZkProof<Field> zkp(*circuit, rate, nreq);
  ReadBuffer rb(pbytes);
  if (!zkp.read(rb, F)) {
    fprintf(stderr, "refcheck: proof deserialization FAILED\n");
    return 1;
  }
  ZkVerifier<Field, RSFactory> verifier(*circuit, rsf, rate, nreq, F);
  Transcript tv(kTag, kTagLen, kVersion);
  verifier.recv_commitment(zkp, tv);
  if (!verifier.verify(zkp, pub, tv)) {
    fprintf(stderr, "refcheck: reference verifier REJECTED the proof\n");
    return 1;
  }
  fprintf(stderr, "refcheck: reference verifier accepted the proof\n");
  return 0;
}

template <class Field>
int do_param(const Field& F, FieldID fid, const std::string& circuit_path,
             size_t rate, size_t nreq) {
  auto circuit = read_circuit(F, fid, circuit_path);
  if (!circuit) return 2;
  ZkProof<Field> zkpr(*circuit, rate, nreq);
  const auto& p = zkpr.param;
  printf(
      "{\"nw\": %zu, \"nq\": %zu, \"block_enc\": %zu, \"block\": %zu, "
      "\"dblock\": %zu, \"block_ext\": %zu, \"r\": %zu, \"w\": %zu, "
      "\"nwrow\": %zu, \"nqtriples\": %zu, \"nrow\": %zu, "
      "\"mc_pathlen\": %zu}\n",
      p.nw, p.nq, p.block_enc, p.block, p.dblock, p.block_ext, p.r, p.w,
      p.nwrow, p.nqtriples, p.nrow, p.mc_pathlen);
  return 0;
}

// rs mode: circuit_path = input elements file (n elts), writes m
// extended elements to proof_path; rate/nreq args carry n/m.
template <class Field, class RSFactory>
int do_rs(const Field& F, const RSFactory& rsf, const std::string& in_path,
          const std::string& out_path, size_t n, size_t m) {
  std::vector<uint8_t> bytes;
  if (!slurp(in_path, &bytes) || bytes.size() != n * Field::kBytes) return 2;
  std::vector<typename Field::Elt> v(m);
  for (size_t i = 0; i < n; ++i) {
    auto e = F.of_bytes_field(&bytes[i * Field::kBytes]);
    if (!e.has_value()) return 2;
    v[i] = *e;
  }
  auto rs = rsf.make(n, m);
  rs->interpolate(&v[0]);
  std::vector<uint8_t> out(m * Field::kBytes);
  for (size_t i = 0; i < m; ++i) F.to_bytes_field(&out[i * Field::kBytes], v[i]);
  if (!dump(out_path, out)) return 2;
  return 0;
}

template <class Field, class RSFactory>
int run(const Field& F, FieldID fid, const RSFactory& rsf,
        const std::string& mode, const std::string& circuit_path,
        const std::string& aux_path, const std::string& proof_path,
        size_t rate, size_t nreq) {
  if (mode == "rs") {
    return do_rs<Field, RSFactory>(F, rsf, circuit_path, proof_path, rate,
                                   nreq);
  }
  if (mode == "param") {
    return do_param(F, fid, circuit_path, rate, nreq);
  }
  if (mode == "prove") {
    return do_prove<Field, RSFactory>(F, fid, rsf, circuit_path, aux_path,
                                      proof_path, rate, nreq);
  }
  if (mode == "verify") {
    return do_verify<Field, RSFactory>(F, fid, rsf, circuit_path, aux_path,
                                       proof_path, rate, nreq);
  }
  fprintf(stderr, "refcheck: unknown mode %s\n", mode.c_str());
  return 2;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 8) {
    fprintf(stderr,
            "usage: %s <prove|verify> <fp128|gf2128|p256> <circuit.lfc1>\n"
            "       <witness.bin|pub.bin> <proof> <rate> <nreq>\n",
            argv[0]);
    return 2;
  }
  const std::string mode = argv[1], field = argv[2], circuit_path = argv[3],
                    aux_path = argv[4], proof_path = argv[5];
  const size_t rate = static_cast<size_t>(atoi(argv[6]));
  const size_t nreq = static_cast<size_t>(atoi(argv[7]));
  set_log_level(INFO);

  if (field == "fp128") {
    using Field = Fp128<true>;
    const Field F;
    // 2^32-order root (fp_p128.h:50).  Any valid root yields the same
    // RS extension values (the FFT is only the convolution engine), so
    // this interoperates with our Python side's 2^108-order root; the
    // order must fit in the uint64 omega_order parameter.
    const auto omega =
        F.of_string("164956748514267535023998284330560247862");
    using Factory = FFTConvolutionFactory<Field>;
    const Factory fft(F, omega, 1ull << 32);
    using RSFactory = ReedSolomonFactory<Field, Factory>;
    const RSFactory rsf(fft, F);
    return run<Field, RSFactory>(F, FP128_ID, rsf, mode, circuit_path,
                                 aux_path, proof_path, rate, nreq);
  }
  if (field == "gf2128") {
    using Field = GF2_128<>;
    const Field F;
    using RSFactory = LCH14ReedSolomonFactory<Field>;
    const RSFactory rsf(F);
    return run<Field, RSFactory>(F, GF2_128_ID, rsf, mode, circuit_path,
                                 aux_path, proof_path, rate, nreq);
  }
  if (field == "p256") {
    using Field = Fp256Base;
    using Field2 = Fp2<Field>;
    const Field2 p256_2(p256_base);
    // Same 2^31-order Fp2 root as our fields/fp_instances.py
    // (mdoc_zk.cc:83-88).
    const auto omega = p256_2.of_string(
        "1126492241464102818735004576096902583730188404304894087292237141715"
        "82664680802",
        "8408799435854090769574046142781866056018216899718237874931301825445"
        "0460212908");
    using Factory = FFTExtConvolutionFactory<Field, Field2>;
    const Factory fft(p256_base, p256_2, omega, 1ull << 31);
    using RSFactory = ReedSolomonFactory<Field, Factory>;
    const RSFactory rsf(fft, p256_base);
    return run<Field, RSFactory>(p256_base, P256_ID, rsf, mode, circuit_path,
                                 aux_path, proof_path, rate, nreq);
  }
  fprintf(stderr, "refcheck: unknown field %s\n", field.c_str());
  return 2;
}
