"""In-program (traced) Merkle commitment pieces.

Device twins of merkle.py's leaf hashing and heap-layout tree build
(reference lib/merkle/merkle_tree.h:44-121, merkle_commitment.h:33-88),
usable INSIDE a jitted program: the Ligero commit fuses RS encode,
tableau serialization, per-column leaf hashing, and the tree reduction
into one device program, so only the 32-byte root (plus the leaf
digests, for host-side proof opening) crosses the host boundary.

The heap tree with n leaves stores leaf i at node n+i and internal node
i = H(node 2i || node 2i+1).  Nodes are computed in log2(n) batched
rounds: round r hashes the contiguous parent range
[ceil(n/2^r), ceil(n/2^(r-1))), whose children [2*lo, 2*hi) are always
already available — identical results to the sequential host loop
(merkle.py MerkleTree.build_tree) for any n, not just powers of two.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sha256_jax import sha256_words

DIGEST_LEN = 32


def pad_blocks_dev(msgs: jax.Array) -> jax.Array:
    """Traced twin of sha256_jax.pad_messages_np: uint8[n, mlen] ->
    uint32[nblocks, 16, n] padded big-endian word blocks (mlen static)."""
    n, mlen = msgs.shape
    bitlen = mlen * 8
    padded_len = ((mlen + 9) + 63) // 64 * 64
    tail = np.zeros((padded_len - mlen,), dtype=np.uint8)
    tail[0] = 0x80
    tail[-8:] = np.frombuffer(int(bitlen).to_bytes(8, "big"), dtype=np.uint8)
    buf = jnp.concatenate(
        [msgs, jnp.broadcast_to(jnp.asarray(tail), (n, padded_len - mlen))],
        axis=1)
    w = buf.reshape(n, padded_len // 4, 4).astype(jnp.uint32)
    w32 = (w[:, :, 0] << 24) | (w[:, :, 1] << 16) | (w[:, :, 2] << 8) | w[:, :, 3]
    nblocks = padded_len // 64
    return jnp.transpose(w32.reshape(n, nblocks, 16), (1, 2, 0))


def sha256_msgs_dev(msgs: jax.Array) -> jax.Array:
    """uint8[n, mlen] equal-length messages -> uint8[n, 32] digests,
    fully in-program."""
    out = sha256_words(pad_blocks_dev(msgs))  # uint32[8, n]
    be = jnp.stack([
        (out >> jnp.uint32(24)), (out >> jnp.uint32(16)),
        (out >> jnp.uint32(8)), out], axis=1).astype(jnp.uint8)  # [8,4,n]
    return jnp.transpose(be, (2, 0, 1)).reshape(-1, DIGEST_LEN)


def merkle_root_dev(leaves: jax.Array) -> jax.Array:
    """uint8[n, 32] leaf digests -> uint8[32] root, bit-identical to the
    host MerkleTree.build_tree heap reduction."""
    n = int(leaves.shape[0])
    assert n >= 1
    if n == 1:
        return leaves[0]
    # heap[0] unused; internal nodes 1..n-1; leaves at n..2n-1
    heap = jnp.zeros((2 * n, DIGEST_LEN), dtype=jnp.uint8)
    heap = jax.lax.dynamic_update_slice(heap, leaves, (n, 0))
    hi = n
    while hi > 1:
        lo = (hi + 1) // 2  # ceil(hi/2): parents [lo, hi)
        children = jax.lax.dynamic_slice(
            heap, (2 * lo, 0), (2 * (hi - lo), DIGEST_LEN))
        msgs = children.reshape(hi - lo, 2 * DIGEST_LEN)
        parents = sha256_msgs_dev(msgs)
        heap = jax.lax.dynamic_update_slice(heap, parents, (lo, 0))
        hi = lo
    return heap[1]
