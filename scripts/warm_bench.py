#!/usr/bin/env python
"""Warm every bench phase on the TPU, one child process at a time (the
tunnel is single-tenant), with NO per-phase timeout — a killed remote
compile wedges the relay.  Run AFTER scripts/warm_mdoc.py.

Usage: python scripts/warm_bench.py [phase ...]   (default: all)"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

PHASES = sys.argv[1:] or ["fft", "sha", "ecdsa", "sha_batch", "mdoc"]


def main():
    for name in PHASES:
        t0 = time.time()
        print("=== warming phase %s ===" % name, flush=True)
        p = subprocess.run([sys.executable, BENCH, "--phase", name],
                           capture_output=True, text=True)
        out = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        print("phase %s: rc=%d %.0fs %s" %
              (name, p.returncode, time.time() - t0,
               out[-1] if out else (p.stderr or "").strip()[-300:]),
              flush=True)
    print("WARM_BENCH DONE", flush=True)


if __name__ == "__main__":
    main()
