"""Global backend configuration.

Two implementations exist for the Montgomery multiply:

- *unrolled*: ~100-600 flat uint32 ops; fuses well, no control flow.
- *compact*: outer-product + lax.scan reduction; tiny traced graph.

Choice matters because of two failure modes measured in this repo:
- XLA **CPU** LLVM chokes (minutes) compiling big compositions of the
  unrolled form (e.g. Fp2/P-256 mul chains under jit);
- the compact form's lax.scan triggers a fresh XLA compile on every
  **eager** call with a new shape (~68 ms each, dominating the sumcheck
  prover: 1500 compiles per layer).

Resolution: on TPU always unrolled; on CPU use unrolled for eager
dispatch and compact only while tracing under jit.
"""

from __future__ import annotations

import jax

_unrolled_mul = None  # None = auto


def set_unrolled_mul(value) -> None:
    """Force (True/False) or reset (None) the unrolled-mul choice."""
    global _unrolled_mul
    _unrolled_mul = value


def unrolled_mul() -> bool:
    if _unrolled_mul is not None:
        return _unrolled_mul
    if jax.default_backend() != "cpu":
        return True
    try:
        from jax._src import core as _core

        return _core.trace_state_clean()  # eager -> unrolled
    except Exception:
        return False


def mul_mode(limbs: int = 16) -> str:
    """'unrolled' | 'semi' | 'compact'.

    - eager / TPU: fully unrolled per-limb form (fuses best, no tracing
      concern for eager dispatch);
    - under jit: 'semi' — vectorized columns + static-slice reduction
      loop.  The compact lax.scan form traces ~10x slower per call site,
      which dominates build time of the fused prover programs; keep it
      only as an explicit opt-in (set_unrolled_mul(False)).
    """
    if _unrolled_mul is False:
        return "compact"
    if _unrolled_mul is True:
        return "unrolled"
    try:
        from jax._src import core as _core

        tracing = not _core.trace_state_clean()
    except Exception:
        tracing = True
    if not tracing:
        return "unrolled"
    # Under jit, graph-compact by default for WIDE fields: the TPU
    # remote-compile relay processes roughly 1-2k HLO ops/min, so the
    # semi-unrolled form (~0.7-2k ops per multiply call site) prices
    # Fp256-scale programs at HOURS of compile while compact (~100 ops)
    # lands in minutes.  Narrow fields (L <= 8: fp64/fp128) keep the
    # semi form — their call sites are ~4x smaller and the flagship
    # fp128 programs are already compiled in that form.  Device time of
    # the mul is a minor term next to the gather-bound sumcheck rounds.
    # LFZK_MUL_MODE forces one mode for every field.
    import os as _os

    forced = _os.environ.get("LFZK_MUL_MODE")
    if forced:
        return forced
    return "semi" if limbs <= 8 else "compact"
