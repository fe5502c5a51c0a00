#!/usr/bin/env python
"""Headline benchmark: Fp128 NTT (2^20) vs the reference CPU FFT.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: reference BM_FFT_Fp128/2^20 = 57.06 ms single-threaded Mac M4
(docs/content/en/docs/benchmarks.md:30; see BASELINE.md).  vs_baseline
is the speedup factor (reference_time / our_time).

The fast path is the MXU matmul-NTT (~11-14 ms, 4-5x baseline), but its
first compile through the remote-compile relay takes 10-20 minutes and
is not locally cacheable.  To guarantee a result, the attempt runs in a
child process under a deadline; on timeout the parent falls back to the
VPU butterfly NTT (~122 ms).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MS = 57.06  # reference BM_FFT_Fp128/1048576
N = 1 << 20
MATMUL_DEADLINE_S = int(os.environ.get("BENCH_MATMUL_DEADLINE", "1500"))


def _measure(make_ntt) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from longfellow_zk_tpu.fields.fp_instances import (
        fp128, P128_OMEGA, P128_OMEGA_ORDER)

    F = fp128()
    ntt = make_ntt(F, P128_OMEGA, P128_OMEGA_ORDER)
    rng = np.random.default_rng(0)
    limbs = rng.integers(0, 1 << 16, size=(F.L, N), dtype=np.uint32)
    limbs[F.L - 1] &= 0x7FFF  # < 2^127 < p
    x = jnp.asarray(limbs)
    fftb = jax.jit(ntt.fftb)
    # warm up; force completion via host readback (the axon relay does
    # not block in block_until_ready)
    y = fftb(x)
    np.asarray(y[0, :1])
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fftb(x)
    np.asarray(y[0, :1])
    return (time.perf_counter() - t0) / iters * 1000.0


def _emit(metric: str, dt_ms: float) -> None:
    print(json.dumps({
        "metric": metric,
        "value": round(dt_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / dt_ms, 2),
    }))


def main() -> None:
    if os.environ.get("BENCH_CHILD") == "1":
        from longfellow_zk_tpu.transforms.matmul_ntt import MatmulNTT

        dt = _measure(MatmulNTT)
        _emit("fft_fp128_2e20_ms", dt)
        return

    env = dict(os.environ, BENCH_CHILD="1")
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=MATMUL_DEADLINE_S)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return
    except subprocess.TimeoutExpired:
        pass
    # fallback: VPU butterfly NTT (compiles in ~2 minutes)
    from longfellow_zk_tpu.transforms.ntt import NTT

    dt = _measure(NTT)
    _emit("fft_fp128_2e20_ms_vpu_fallback", dt)


if __name__ == "__main__":
    main()
