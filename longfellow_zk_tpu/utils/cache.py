"""Persistent XLA compilation cache setup.

The prover programs are jitted per circuit-layer shape; compiles are
expensive (tens of seconds on CPU, minutes through a remote-TPU relay)
but fully reusable across processes.  Call enable_compilation_cache()
before the first jit (conftest, bench, profiling scripts)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    import jax

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass


def force_cpu() -> None:
    """Pin JAX to the CPU backend.  The axon sitecustomize registers the
    TPU tunnel before user code runs, so JAX_PLATFORMS env alone is not
    honored; the config update is required (two concurrent holders of
    the single-tenant tunnel deadlock)."""
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
