"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths can
be exercised without TPU hardware (the driver separately dry-runs the
multi-chip path).  IMPORTANT: this environment's sitecustomize
(/root/.axon_site) force-registers a single-tenant TPU tunnel for every
python process; tests must not grab it (two concurrent holders deadlock).
We therefore force the CPU platform *before* jax initializes a backend.
"""

import os
import sys

# Must happen before jax backend initialization.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# Persistent compilation cache: the jitted prover programs are keyed by
# circuit layer shapes and reused across test sessions.
try:
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
