"""Multi-chip sharding for the proving pipeline.

The reference is single-threaded by design (SURVEY §2.15); the natural
parallel axes of this workload are:

  - Ligero tableau ROWS (independent RS encodes)      -> mesh axis "rows"
  - sumcheck data-parallel COPIES / tableau columns   -> mesh axis "cols"

This module places those axes on a jax.sharding.Mesh.  The RS encode is
embarrassingly parallel over rows; XLA inserts the (absent) collectives
automatically.  The copy-axis reductions in the sumcheck round kernels
become psum-style cross-chip reductions under the same sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_rows: int, n_cols: int = 1) -> Mesh:
    devs = np.array(jax.devices()[: n_rows * n_cols]).reshape(n_rows, n_cols)
    return Mesh(devs, ("rows", "cols"))


def shard_rows(mesh: Mesh, nlead: int = 1) -> NamedSharding:
    """Sharding for [lead..., rows, width] arrays over the rows axis."""
    return NamedSharding(mesh, P(*([None] * nlead), "rows", None))


def shard_copies(mesh: Mesh, nlead: int = 1) -> NamedSharding:
    """Sharding for [lead..., wires, copies] arrays over the copy axis."""
    return NamedSharding(mesh, P(*([None] * nlead), None, "cols"))


def sharded_rs_encode(rs, mesh: Mesh, x: jax.Array, nlead: int = 1):
    """RS-extend with rows sharded across the mesh."""
    sh = shard_rows(mesh, nlead)
    f = jax.jit(rs.interpolate, in_shardings=sh, out_shardings=sh)
    return f(x)
