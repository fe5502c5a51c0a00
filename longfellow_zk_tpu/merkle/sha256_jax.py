"""Batched SHA-256 on device.

The Ligero commitment hashes one message per tableau column (32-byte
nonce + nrow serialized field elements, all columns equal length) —
thousands of independent SHA-256 computations.  The reference does this
serially through OpenSSL (ligero_prover.h:71-75); here the compression
function runs as pure uint32 vector ops batched over the message axis,
so the whole tableau commits in a few fused kernels.

Matches hashlib.sha256 bit-for-bit (tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array([
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2], dtype=np.uint32)

_H0 = np.array([0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
                0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
               dtype=np.uint32)


def _rotr(x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _compress(state, block):
    """state: [8, n]; block: [16, n] big-endian words -> new state.

    The rounds/schedule run as lax.scan by default (small graphs; the
    XLA CPU backend mis-executes fully unrolled 64-round chains).  Full
    unrolling is available behind LFZK_UNROLL_SHA=1 — measured on the
    v5e it does NOT improve the prover's steady state (the scan is not
    the bottleneck) while inflating compile time ~8x, so it stays off.
    """
    import os

    unrolled = (os.environ.get("LFZK_UNROLL_SHA") == "1"
                and jax.default_backend() != "cpu")
    if unrolled:
        w = [block[i] for i in range(16)]
        for i in range(16, 64):
            s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ \
                (w[i - 15] >> np.uint32(3))
            s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ \
                (w[i - 2] >> np.uint32(10))
            w.append(w[i - 16] + s0 + w[i - 7] + s1)
        a, b, c, d = state[0], state[1], state[2], state[3]
        e, f, g, h = state[4], state[5], state[6], state[7]
        for i in range(64):
            S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + S1 + ch + np.uint32(_K[i]) + w[i]
            S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = S0 + maj
            h, g, f, e = g, f, e, d + t1
            d, c, b, a = c, b, a, t1 + t2
        return state + jnp.stack([a, b, c, d, e, f, g, h])

    # message schedule: sliding 16-word window
    def sched_step(win, _):
        w15 = win[1]
        w2 = win[14]
        s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> np.uint32(3))
        s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> np.uint32(10))
        new = win[0] + s0 + win[9] + s1
        win = jnp.concatenate([win[1:], new[None]], axis=0)
        return win, new

    _, w_ext = jax.lax.scan(sched_step, block, None, length=48)
    w = jnp.concatenate([block, w_ext], axis=0)  # [64, n]

    def round_step(st, kw):
        k, wi = kw
        a, b, c, d, e, f, g, h = [st[i] for i in range(8)]
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + k + wi
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        return jnp.stack([t1 + t2, a, b, c, d + t1, e, f, g]), None

    st, _ = jax.lax.scan(round_step, state, (jnp.asarray(_K), w))
    return state + st


def sha256_words(blocks: jax.Array) -> jax.Array:
    """blocks: uint32[nblocks, 16, n] padded big-endian message words
    (one full padded message per batch lane n) -> digests uint32[8, n]."""
    state = jnp.broadcast_to(
        jnp.asarray(_H0)[:, None], (8, blocks.shape[2])).astype(jnp.uint32)

    def step(st, blk):
        return _compress(st, blk), None

    state, _ = jax.lax.scan(step, state, blocks)
    return state


def pad_messages_np(msgs: np.ndarray) -> np.ndarray:
    """uint8[n, mlen] equal-length messages -> uint32[nblocks, 16, n]
    padded big-endian word blocks."""
    n, mlen = msgs.shape
    bitlen = mlen * 8
    padded_len = ((mlen + 9) + 63) // 64 * 64  # 0x80 byte + 8-byte length
    buf = np.zeros((n, padded_len), dtype=np.uint8)
    buf[:, :mlen] = msgs
    buf[:, mlen] = 0x80
    buf[:, -8:] = np.frombuffer(
        int(bitlen).to_bytes(8, "big"), dtype=np.uint8)
    words = buf.reshape(n, padded_len // 4, 4)
    w32 = (words[:, :, 0].astype(np.uint32) << 24) | \
        (words[:, :, 1].astype(np.uint32) << 16) | \
        (words[:, :, 2].astype(np.uint32) << 8) | \
        words[:, :, 3].astype(np.uint32)
    nblocks = padded_len // 64
    return np.ascontiguousarray(
        w32.reshape(n, nblocks, 16).transpose(1, 2, 0))


def sha256_batch(msgs: np.ndarray) -> np.ndarray:
    """uint8[n, mlen] -> uint8[n, 32] digests (device compute)."""
    blocks = jnp.asarray(pad_messages_np(msgs))
    out = np.asarray(jax.jit(sha256_words)(blocks))  # [8, n]
    be = out.astype(">u4").T  # [n, 8] big-endian
    return np.frombuffer(be.tobytes(), dtype=np.uint8).reshape(-1, 32)
