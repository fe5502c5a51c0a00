#!/usr/bin/env python
"""Feasibility probe: compile + time the per-layer sumcheck program for
the largest mdoc hash-circuit layers (3.58M / 1.43M terms) on the TPU
relay.  Run in background; never kill mid-compile (a killed remote
compile wedges the relay)."""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    from longfellow_zk_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    print("devices:", jax.devices(), flush=True)
    print("devices took", time.perf_counter() - t0, flush=True)

    from longfellow_zk_tpu.circuits.mdoc import api
    from longfellow_zk_tpu.circuits.mdoc.zk_spec import find_zk_spec_by_version
    from longfellow_zk_tpu.sumcheck.prover_device import DeviceSumcheckProver
    from longfellow_zk_tpu.random_oracle import device_fs as dfs
    from longfellow_zk_tpu.random_oracle.transcript import Transcript

    spec = find_zk_spec_by_version(7, 1)
    path = os.path.join("/root/reference/lib/circuits/mdoc/circuits",
                        spec.circuit_hash)
    cb = open(path, "rb").read()
    c_sig, c_hash = api.load_circuits(cb)
    GF = api.GF
    sc = DeviceSumcheckProver(GF)

    ts = Transcript(b"probe", version=7)
    fs = dfs.fs_init_from_host(ts)
    from longfellow_zk_tpu.sumcheck.circuit import KMAX_BINDINGS
    if sc._begin_jit is None:
        sc._begin_jit = jax.jit(sc._begin_circuit_fn)
    t0 = time.perf_counter()
    fs, q40, g40, prf = sc._begin_jit(fs)
    np.asarray(q40)
    print("begin program (compile+run):", time.perf_counter() - t0,
          flush=True)

    logc, nc = c_hash.logc, c_hash.nc
    claims = jnp.zeros((GF.L if not GF.kCharacteristicTwo else 8, 2),
                       jnp.uint32)

    for ly in (14, 13, 16):
        layer = c_hash.layers[ly]
        logv = c_hash.layers[ly - 1].logw if ly > 0 else c_hash.logv
        logw = layer.logw
        qd = sc._quad_dev(layer.quad)
        T = int(qd["h0"].shape[0])
        lead = (8,)
        W = jnp.zeros(lead + (layer.nw, nc), jnp.uint32)
        cp_pad, hp_pad, wc_pad = sc._pads_dev(None, logc, logw)
        key = ("layer", logc, nc, logv, logw, T, W.shape, True,
               q40.shape, g40.shape)
        print(f"layer {ly}: T={T} logv={logv} logw={logw} "
              f"W={W.shape}", flush=True)
        if key not in sc._layer_jit:
            sc._layer_jit[key] = jax.jit(
                sc._layer_fn, static_argnums=(11, 12, 13, 14, 15))
        t0 = time.perf_counter()
        out = sc._layer_jit[key](fs, prf, claims, q40, g40, g40, qd, W,
                                 cp_pad, hp_pad, wc_pad, logc, nc, logv,
                                 logw, True)
        np.asarray(out[1])
        print(f"layer {ly} compile+run: {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        out = sc._layer_jit[key](fs, prf, claims, q40, g40, g40, qd, W,
                                 cp_pad, hp_pad, wc_pad, logc, nc, logv,
                                 logw, True)
        np.asarray(out[1])
        print(f"layer {ly} warm run: {time.perf_counter() - t0:.3f}s",
              flush=True)
    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
