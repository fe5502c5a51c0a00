"""Global backend configuration.

The limb-unrolled field kernels fuse best on TPU but their large HLO
graphs choke the XLA *CPU* backend's LLVM pipeline (minutes per compile
for 256-bit fields).  The graph-compact scan-based kernels compile fast
everywhere at some fusion cost.  Default: unrolled on TPU, compact on CPU.
"""

from __future__ import annotations

import jax

_unrolled_mul = None  # None = auto by backend


def set_unrolled_mul(value) -> None:
    """Force (True/False) or reset (None) the unrolled-mul choice."""
    global _unrolled_mul
    _unrolled_mul = value


def unrolled_mul() -> bool:
    if _unrolled_mul is not None:
        return _unrolled_mul
    return jax.default_backend() not in ("cpu",)
