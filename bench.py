#!/usr/bin/env python
"""Headline benchmark: Fp128 NTT throughput vs the reference CPU FFT.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: reference BM_FFT_Fp128/2^20 = 57.06 ms single-threaded Mac M4
(docs/content/en/docs/benchmarks.md:30; see BASELINE.md).  vs_baseline
is the speedup factor (reference_time / our_time).
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax

# persistent compilation cache: first compile of the 2^20 matmul-NTT
# graph takes minutes through the remote-compile relay; cache it.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from longfellow_zk_tpu.fields.fp_instances import (
    fp128,
    P128_OMEGA,
    P128_OMEGA_ORDER,
)
from longfellow_zk_tpu.transforms.matmul_ntt import MatmulNTT

BASELINE_MS = 57.06  # reference BM_FFT_Fp128/1048576
N = 1 << 20


def main():
    F = fp128()
    ntt = MatmulNTT(F, P128_OMEGA, P128_OMEGA_ORDER)
    rng = np.random.default_rng(0)
    # random residues; build limbs directly (uniform 16-bit limbs with a
    # top-limb clamp keeps values < p without host bigint conversion)
    limbs = rng.integers(0, 1 << 16, size=(F.L, N), dtype=np.uint32)
    limbs[F.L - 1] &= 0x7FFF  # < 2^127 < p
    x = jnp.asarray(limbs)

    fftb = jax.jit(ntt.fftb)
    # warm up (compile); force completion via host readback — on the axon
    # relay, block_until_ready returns before execution finishes.
    y = fftb(x)
    np.asarray(y[0, :1])

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fftb(x)
    np.asarray(y[0, :1])  # forces the queued executions to complete
    dt_ms = (time.perf_counter() - t0) / iters * 1000.0

    print(json.dumps({
        "metric": "fft_fp128_2e20_ms",
        "value": round(dt_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / dt_ms, 2),
    }))


if __name__ == "__main__":
    main()
