#!/usr/bin/env python
"""Headline benchmark: full 1-block ZK-SHA256 proof (commit + sumcheck +
Ligero), the reference's BM_ShaZK_fp2_128/1 (5.30 ms single-threaded
Mac M4, docs/content/en/docs/benchmarks.md:55; see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N, "extra": {...}}

vs_baseline is the speedup factor (reference_time / our_time).

The prove is measured steady-state (programs compiled once per circuit
shape and persisted in the XLA compilation cache).  A secondary metric
in "extra" reports the Fp128 2^20 NTT vs the 57.06 ms reference FFT when
the time budget allows.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from longfellow_zk_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

ZK_SHA_BASELINE_MS = 5.30    # BM_ShaZK_fp2_128/1
FFT_BASELINE_MS = 57.06      # BM_FFT_Fp128/1048576
BUDGET_S = int(os.environ.get("BENCH_BUDGET", "2700"))
_T0 = time.time()


def _left() -> float:
    return BUDGET_S - (time.time() - _T0)


def bench_zk_sha() -> float:
    """Returns steady-state ms for one full ZK proof of the 1-block
    SHA-256 transform circuit (267k terms, 10 layers)."""
    import gzip

    from longfellow_zk_tpu.circuits.sha.sha256 import (
        SHA256_INIT, pack_block_witness, sha256_pad, transform_block_witness)
    from longfellow_zk_tpu.fields.fp_instances import (
        fp128, P128_OMEGA, P128_OMEGA_ORDER)
    from longfellow_zk_tpu.proto.lfc1 import FP128_ID, read_circuit
    from longfellow_zk_tpu.random_oracle.engine import SecureRandomEngine
    from longfellow_zk_tpu.random_oracle.transcript import Transcript
    from longfellow_zk_tpu.zk.proof import ZkProof
    from longfellow_zk_tpu.zk.prover import ZkProver
    from longfellow_zk_tpu.zk.testing import rs_factory_for, K_VERSION

    F = fp128()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "artifacts", "sha256_1block_fp128.lfc1.gz")
    circ = read_circuit(F, FP128_ID, gzip.open(path, "rb").read())

    padded = sha256_pad(b"abc")
    bw = transform_block_witness(SHA256_INIT, padded)
    W = [F.of_scalar(1)]
    for byte in padded:
        for i in range(8):
            W.append(F.of_scalar((byte >> i) & 1))
    W.extend(pack_block_witness(F, 4, [bw]))

    rs_factory = rs_factory_for(F, P128_OMEGA, P128_OMEGA_ORDER)

    def one_proof():
        zkp = ZkProof(rate=4, nreq=128)
        prover = ZkProver(circ, F, rs_factory, rate=4, nreq=128)
        tp = Transcript(b"bench", version=K_VERSION)
        prover.commit(zkp, W, tp, SecureRandomEngine())
        ok = prover.prove(zkp, W, tp)
        assert ok
        return zkp

    one_proof()  # warm-up: compiles every layer program once
    iters = 3 if _left() > 120 else 1
    t0 = time.perf_counter()
    for _ in range(iters):
        one_proof()
    return (time.perf_counter() - t0) / iters * 1000.0


def bench_fft(matmul: bool = False) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from longfellow_zk_tpu.fields.fp_instances import (
        fp128, P128_OMEGA, P128_OMEGA_ORDER)
    if matmul:
        from longfellow_zk_tpu.transforms.matmul_ntt import MatmulNTT as NTT
    else:
        from longfellow_zk_tpu.transforms.ntt import NTT

    F = fp128()
    ntt = NTT(F, P128_OMEGA, P128_OMEGA_ORDER)
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
    return (time.perf_counter() - t0) / 3 * 1000.0


def main() -> None:
    extra = {}
    value = None

    # 1) MXU matmul-NTT in a deadline-guarded child process FIRST — the
    # TPU tunnel is single-tenant, so the child must run before this
    # process initializes the backend (two holders deadlock); its first
    # compile through the remote relay can take very long.
    if _left() > 1500 and os.environ.get("BENCH_SKIP_FFT") != "1":
        import subprocess

        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import sys; sys.path.insert(0, %r); import bench; "
                 "print('FFTMS', bench.bench_fft(matmul=True))"
                 % os.path.dirname(os.path.abspath(__file__))],
                capture_output=True, text=True,
                timeout=min(1500, max(300, _left() - 900)))
            for line in out.stdout.splitlines():
                if line.startswith("FFTMS"):
                    fft_ms = float(line.split()[1])
                    extra["fft_fp128_2e20_ms"] = round(fft_ms, 3)
                    extra["fft_vs_baseline"] = round(
                        FFT_BASELINE_MS / fft_ms, 2)
        except Exception as e:  # pragma: no cover
            extra["fft_matmul_error"] = repr(e)[:120]

    # 2) the headline: full ZK-SHA proof
    try:
        value = bench_zk_sha()
    except Exception as e:  # pragma: no cover
        extra["zk_sha_error"] = repr(e)[:200]

    if value is not None:
        print(json.dumps({
            "metric": "zk_sha256_1block_prove_ms",
            "value": round(value, 3),
            "unit": "ms",
            "vs_baseline": round(ZK_SHA_BASELINE_MS / value, 3),
            "extra": extra,
        }))
    else:
        fft_ms = extra.get("fft_fp128_2e20_ms") or bench_fft()
        print(json.dumps({
            "metric": "fft_fp128_2e20_ms",
            "value": round(fft_ms, 3),
            "unit": "ms",
            "vs_baseline": round(FFT_BASELINE_MS / fft_ms, 2),
            "extra": extra,
        }))


if __name__ == "__main__":
    main()
