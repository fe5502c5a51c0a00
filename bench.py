#!/usr/bin/env python
"""Headline benchmark suite.  The LAST stdout line is the result:

  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N, "extra": {...}}

A checkpoint line is printed after every phase and a SIGALRM deadline
(BENCH_BUDGET, default 1500 s) flushes the best-so-far line before the
driver's timeout can kill the process — a cold compile of one phase can
never erase the other metrics.

Headline: the full mdoc anonymous-credential prove (the reference's
BM_MdocProver, mdoc_zk_test.cc:658-721) on the TPU vs the reference C++
measured on THIS machine (BASELINE.md: 2398.6 ms prover / 959.5 ms
verifier, v7 1-attribute shipped circuit).  Extras: 1-block ZK-SHA256
latency + batched throughput (BM_ShaZK_fp2_128/1 = 5.30 ms) and the
Fp128 2^20 NTT (BM_FFT_Fp128/1048576 = 57.06 ms).

Every phase runs in its own child process: the TPU tunnel is
single-tenant (two concurrent holders deadlock), and a child that dies
on a compile timeout must not take the whole bench with it.  Programs
persist in .jax_cache, so steady-state numbers survive across runs.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

MDOC_PROVER_BASELINE_MS = 2398.6   # local BM_MdocProver (BASELINE.md)
ZK_SHA_BASELINE_MS = 5.30          # BM_ShaZK_fp2_128/1 (Mac M4)
FFT_BASELINE_MS = 57.06            # BM_FFT_Fp128/1048576 (Mac M4)
ECDSA_BASELINE_MS = 16.71          # BM_ECDSAZKProver/1 (Mac M4)
BUDGET_S = int(os.environ.get("BENCH_BUDGET", "1500"))
_T0 = time.time()


def _left() -> float:
    return BUDGET_S - (time.time() - _T0)


# ---------------------------------------------------------------------------
# phases (each runs in a child process; prints "RESULT <json>")
# ---------------------------------------------------------------------------

def phase_mdoc() -> dict:
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

    def one():
        return api.run_mdoc_prover(circuit_bytes, mdoc, pkx, pky, tr, attrs,
                                   now, spec, rng=SecureRandomEngine())

    one()  # warm-up: compiles + circuit parse/upload
    iters = 2
    t0 = time.perf_counter()
    for _ in range(iters):
        proof = one()
    ms = (time.perf_counter() - t0) / iters * 1000.0
    out = {"mdoc_prover_ms": round(ms, 1), "mdoc_proof_bytes": len(proof)}
    import resource
    out["mdoc_peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1)
    ok = api.run_mdoc_verifier(circuit_bytes, pkx, pky, tr, attrs, now,
                               proof, b"org.iso.18013.5.1.mDL", spec)
    assert ok
    t0 = time.perf_counter()
    ok = api.run_mdoc_verifier(circuit_bytes, pkx, pky, tr, attrs, now,
                               proof, b"org.iso.18013.5.1.mDL", spec)
    assert ok
    out["mdoc_verifier_ms"] = round((time.perf_counter() - t0) * 1000.0, 1)
    return out


def _sha_setup():
    import gzip

    from longfellow_zk_tpu.circuits.sha.sha256 import (
        SHA256_INIT, pack_block_witness, sha256_pad, transform_block_witness)
    from longfellow_zk_tpu.fields.fp_instances import (
        fp128, P128_OMEGA, P128_OMEGA_ORDER)
    from longfellow_zk_tpu.proto.lfc1 import FP128_ID, read_circuit
    from longfellow_zk_tpu.zk.testing import rs_factory_for

    F = fp128()
    path = os.path.join(REPO, "artifacts", "sha256_1block_fp128.lfc1.gz")
    circ = read_circuit(F, FP128_ID, gzip.open(path, "rb").read())

    def witness(msg):
        padded = sha256_pad(msg)
        bw = transform_block_witness(SHA256_INIT, padded)
        W = [F.of_scalar(1)]
        for byte in padded:
            for i in range(8):
                W.append(F.of_scalar((byte >> i) & 1))
        W.extend(pack_block_witness(F, 4, [bw]))
        return W

    return F, circ, rs_factory_for(F, P128_OMEGA, P128_OMEGA_ORDER), witness


def phase_sha() -> dict:
    from longfellow_zk_tpu.random_oracle.engine import SecureRandomEngine
    from longfellow_zk_tpu.random_oracle.transcript import Transcript
    from longfellow_zk_tpu.zk.proof import ZkProof
    from longfellow_zk_tpu.zk.prover import ZkProver
    from longfellow_zk_tpu.zk.testing import K_VERSION

    F, circ, rs_factory, witness = _sha_setup()
    W = witness(b"abc")

    def one_proof():
        zkp = ZkProof(rate=4, nreq=128)
        prover = ZkProver(circ, F, rs_factory, rate=4, nreq=128)
        tp = Transcript(b"bench", version=K_VERSION)
        prover.commit(zkp, W, tp, SecureRandomEngine())
        assert prover.prove(zkp, W, tp)

    one_proof()
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        one_proof()
    ms = (time.perf_counter() - t0) / iters * 1000.0
    return {"zk_sha256_1block_prove_ms": round(ms, 3)}


def phase_sha_batch() -> dict:
    from longfellow_zk_tpu.random_oracle.engine import SecureRandomEngine
    from longfellow_zk_tpu.random_oracle.transcript import Transcript
    from longfellow_zk_tpu.zk.batch import BatchZkProver
    from longfellow_zk_tpu.zk.testing import K_VERSION

    B = int(os.environ.get("BENCH_B", "8"))
    F, circ, rs_factory, witness = _sha_setup()
    W_list = [witness(b"msg%04d" % i) for i in range(B)]
    bp = BatchZkProver(circ, F, rs_factory, rate=4, nreq=128)

    def tags():
        return [Transcript(b"bench%d" % i, version=K_VERSION)
                for i in range(B)]

    bp.prove_batch(W_list, tags(), SecureRandomEngine())
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        bp.prove_batch(W_list, tags(), SecureRandomEngine())
    dt = (time.perf_counter() - t0) / iters
    return {"zk_sha256_batch%d_per_proof_ms" % B: round(dt / B * 1000, 3),
            "zk_sha256_batch%d_proofs_per_s" % B: round(B / dt, 2)}


def phase_fft() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from longfellow_zk_tpu.fields.fp_instances import (
        fp128, P128_OMEGA, P128_OMEGA_ORDER)
    from longfellow_zk_tpu.transforms.matmul_ntt import MatmulNTT

    F = fp128()
    ntt = MatmulNTT(F, P128_OMEGA, P128_OMEGA_ORDER)
    rng = np.random.default_rng(0)
    limbs = rng.integers(0, 1 << 16, size=(F.L, 1 << 20), dtype=np.uint32)
    limbs[F.L - 1] &= 0x7FFF
    x = jnp.asarray(limbs)
    fftb = jax.jit(ntt.fftb)
    y = fftb(x)
    np.asarray(y[0, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        y = fftb(x)
    np.asarray(y[0, :1])
    out = {"fft_fp128_2e20_ms": round(
        (time.perf_counter() - t0) / 3 * 1000.0, 3)}

    # FFT over Fp256^2, n=2^20 (benchmarks.md:23: 446.8 ms Mac M4)
    from longfellow_zk_tpu.fields.fp_instances import (
        P256_FP2_ROOT_ORDER, P256_FP2_ROOT_X, P256_FP2_ROOT_Y, p256_base)
    from longfellow_zk_tpu.fields.fp2 import Fp2
    from longfellow_zk_tpu.transforms.ntt import NTT, ReedSolomon, \
        make_fft_convolution_factory

    FB = p256_base()
    F2 = Fp2(FB)
    ntt2 = NTT(F2, (P256_FP2_ROOT_X, P256_FP2_ROOT_Y),
               P256_FP2_ROOT_ORDER)
    limbs2 = rng.integers(0, 1 << 16, size=(2, FB.L, 1 << 20),
                          dtype=np.uint32)
    limbs2[:, FB.L - 1] &= 0x7FFF
    x2 = jnp.asarray(limbs2)
    fftb2 = jax.jit(ntt2.fftb)
    np.asarray(fftb2(x2)[0, 0, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        y2 = fftb2(x2)
    np.asarray(y2[0, 0, :1])
    out["fft_fp256x2_2e20_ms"] = round(
        (time.perf_counter() - t0) / 3 * 1000.0, 3)
    out["fft_fp256x2_vs_baseline"] = round(
        446.8 / out["fft_fp256x2_2e20_ms"], 2)

    # Reed-Solomon extension (BM_ReedSolomon twin,
    # reed_solomon_test.cc:334-398): fp128, 2^16 -> 4*2^16 points
    conv = make_fft_convolution_factory(F, P128_OMEGA, P128_OMEGA_ORDER)
    rs = ReedSolomon(1 << 16, 3 << 16, F, conv)
    xr = jnp.asarray(limbs[:, : 1 << 16])
    ext = jax.jit(rs.interpolate)
    np.asarray(ext(xr)[0, :1])
    t0 = time.perf_counter()
    for _ in range(3):
        yr = ext(xr)
    np.asarray(yr[0, :1])
    out["rs_encode_fp128_2e16_x3_ms"] = round(
        (time.perf_counter() - t0) / 3 * 1000.0, 3)
    return out


def phase_ecdsa() -> dict:
    """BM_ECDSAZKProver/1 twin (verify_signature3 full ZK prove;
    ref 16.71 ms Mac M4)."""
    import gzip
    import random

    from longfellow_zk_tpu.circuits.ecdsa.verify import compute_witness
    from longfellow_zk_tpu.ec.curves import ecdsa_sign, p256_curve
    from longfellow_zk_tpu.fields.fp_instances import (
        P256_FP2_ROOT_ORDER, P256_FP2_ROOT_X, P256_FP2_ROOT_Y, p256_base)
    from longfellow_zk_tpu.fields.fp2 import Fp2
    from longfellow_zk_tpu.proto.lfc1 import P256_ID, read_circuit
    from longfellow_zk_tpu.random_oracle.engine import SecureRandomEngine
    from longfellow_zk_tpu.random_oracle.transcript import Transcript
    from longfellow_zk_tpu.zk.proof import ZkProof
    from longfellow_zk_tpu.zk.prover import ZkProver
    from longfellow_zk_tpu.zk.testing import rs_factory_for, K_VERSION

    F = p256_base()
    ec = p256_curve()
    path = os.path.join(REPO, "artifacts", "ecdsa_p256.lfc1.gz")
    circ = read_circuit(F, P256_ID, gzip.open(path, "rb").read())
    rng = random.Random(1234)
    d = rng.randrange(1, ec.order)
    pk = ec.normalize(ec.scalar_mult(ec.generator(), d))
    e = rng.randrange(1, ec.order)
    r, s = ecdsa_sign(ec, d, e, rng.randrange(1, ec.order))
    vw = compute_witness(ec, pk.x, pk.y, e, r, s)
    W = [F.of_scalar(1), pk.x, pk.y, e % F.p]
    W.extend(vw.fill())
    rs = rs_factory_for(F, F2=Fp2(F),
                        omega2=(P256_FP2_ROOT_X, P256_FP2_ROOT_Y),
                        omega_order=P256_FP2_ROOT_ORDER)

    def one_proof():
        zkp = ZkProof(rate=4, nreq=128)
        prover = ZkProver(circ, F, rs, rate=4, nreq=128)
        tp = Transcript(b"bench", version=K_VERSION)
        prover.commit(zkp, W, tp, SecureRandomEngine())
        assert prover.prove(zkp, W, tp)

    one_proof()
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        one_proof()
    return {"ecdsa_zk_prover_ms": round(
        (time.perf_counter() - t0) / iters * 1000.0, 3)}


PHASES = {"mdoc": phase_mdoc, "sha": phase_sha, "sha_batch": phase_sha_batch,
          "fft": phase_fft, "ecdsa": phase_ecdsa}


def child_main(name: str) -> None:
    from longfellow_zk_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    res = PHASES[name]()
    print("RESULT " + json.dumps(res), flush=True)


# ---------------------------------------------------------------------------
# parent orchestration
# ---------------------------------------------------------------------------

_CHILD = [None]


def run_phase(name: str, timeout_s: float) -> dict:
    try:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--phase", name],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        _CHILD[0] = proc
        try:
            out, err = proc.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.communicate()
            return {name + "_error": "timeout %ds" % int(timeout_s)}
        finally:
            _CHILD[0] = None
        for line in out.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        tail = (err or out or "").strip().splitlines()
        return {name + "_error": (tail[-1] if tail else "no output")[:160]}
    except Exception as e:  # pragma: no cover
        return {name + "_error": repr(e)[:160]}


def emit(extra: dict) -> None:
    """Print the current best headline line.  Called after EVERY phase
    (and from the deadline alarm): the driver reads the LAST line, so a
    kill mid-bench still leaves the latest complete result on stdout."""
    extra = dict(extra)
    mdoc_ms = extra.pop("mdoc_prover_ms", None)
    sha_ms = extra.get("zk_sha256_1block_prove_ms")
    fft_ms = extra.get("fft_fp128_2e20_ms")
    if sha_ms:
        extra["sha_vs_baseline"] = round(ZK_SHA_BASELINE_MS / sha_ms, 3)
    if fft_ms:
        extra["fft_vs_baseline"] = round(FFT_BASELINE_MS / fft_ms, 2)
    ecdsa_ms = extra.get("ecdsa_zk_prover_ms")
    if ecdsa_ms:
        extra["ecdsa_vs_baseline"] = round(ECDSA_BASELINE_MS / ecdsa_ms, 3)
    if mdoc_ms:
        line = {"metric": "mdoc_prover_ms", "value": mdoc_ms, "unit": "ms",
                "vs_baseline": round(MDOC_PROVER_BASELINE_MS / mdoc_ms, 3),
                "extra": extra}
    elif sha_ms:
        line = {"metric": "zk_sha256_1block_prove_ms", "value": sha_ms,
                "unit": "ms",
                "vs_baseline": round(ZK_SHA_BASELINE_MS / sha_ms, 3),
                "extra": extra}
    else:
        line = {"metric": "fft_fp128_2e20_ms", "value": fft_ms or -1,
                "unit": "ms",
                "vs_baseline": round(FFT_BASELINE_MS / fft_ms, 2) if fft_ms
                else 0, "extra": extra}
    print(json.dumps(line), flush=True)


def main() -> None:
    extra = {}

    def on_alarm(signum, frame):  # hard deadline: flush and exit
        extra["deadline"] = "hit %ds" % BUDGET_S
        if _CHILD[0] is not None:
            try:
                _CHILD[0].kill()
            except Exception:
                pass
        emit(extra)
        os._exit(0)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(max(60, BUDGET_S - 15))

    # order: cheap-and-cached first so a long compile of a later phase
    # can never erase the metrics that are already warm; emit() after
    # every phase checkpoints the best-so-far line.
    plan = [("fft", 420), ("sha", 600), ("sha_batch", 420),
            ("ecdsa", 420), ("mdoc", 900)]
    if os.environ.get("BENCH_ONLY"):
        only = os.environ["BENCH_ONLY"].split(",")
        plan = [(n, t) for n, t in plan if n in only]
    for name, cap in plan:
        budget = min(cap, _left() - 30)
        if budget < 60:
            extra[name + "_error"] = "skipped: budget"
            continue
        extra.update(run_phase(name, budget))
        emit(extra)

    # One retry pass: a killed/OOMed remote compile wedges the relay for
    # a few minutes, which can fail an otherwise-warm phase; retry
    # errored phases with whatever budget remains.
    for name, cap in plan:
        if not any(k == name + "_error" and "skip" not in str(v)
                   for k, v in extra.items()):
            continue
        budget = min(cap, _left() - 30)
        if budget < 90:
            continue
        res = run_phase(name, budget)
        if not any(k.endswith("_error") for k in res):
            extra.pop(name + "_error", None)
        extra.update(res)
        emit(extra)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        child_main(sys.argv[2])
    else:
        main()
