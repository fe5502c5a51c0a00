"""On-device Fiat-Shamir transcript.

Byte-exact device twin of the host Transcript/FSPRF
(random_oracle/transcript.py, reference lib/random/transcript.h:33-193),
expressed as pure JAX so an entire sumcheck — all round-polynomial
writes and challenge squeezes — runs as ONE device program.  This is the
load-bearing TPU-native design decision: the proving loop is strictly
sequential through the oracle (challenge feeds the next round), so any
host-side oracle forces a device->host sync per round; on a real
deployment (and especially through a remote-TPU relay where a sync costs
~27 ms) that dwarfs the arithmetic.  With the oracle on device the whole
prove is launch-and-fetch-once.

State (a small pytree of device scalars/vectors):

  fs  = {h: uint32[8], buf: uint8[64], cnt: uint32}
        running SHA-256 midstate; buf bytes >= cnt%64 are zero.
  prf = {rk: uint8[15,16], nb: uint32, saved: uint8[16], ptr: uint32}
        AES-256-CTR stream (16-byte LE block counter), byte-granular
        read pointer, matching FSPRF exactly.

The host transcript exports/imports the same (h, cnt, buf) midstate
(utils/crypto.SHA256.export_state), so control can migrate mid-stream.

All absorbs have static byte length, so each lowers to a fixed number of
SHA-256 compressions (selected against the running block offset), with
no data-dependent shapes anywhere.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..merkle.sha256_jax import _compress
from ..utils import crypto as hostcrypto

TAG_BSTR = 0
TAG_FIELD_ELEM = 1
TAG_ARRAY = 2

_U8 = jnp.uint8
_U32 = jnp.uint32


# ---------------------------------------------------------------------------
# SHA-256 absorb / finalize
# ---------------------------------------------------------------------------

def _block_words(blk: jax.Array) -> jax.Array:
    """uint8[64] -> big-endian uint32[16]."""
    b = blk.astype(_U32)
    return (b[0::4] << 24) | (b[1::4] << 16) | (b[2::4] << 8) | b[3::4]


def fs_init_from_host(ts) -> dict:
    """Host Transcript -> device state."""
    blob = ts.export_state()
    h = np.frombuffer(blob[:32], dtype="<u4").astype(np.uint32)
    cnt = int.from_bytes(blob[32:40], "little")
    buf = np.zeros(64, dtype=np.uint8)
    off = cnt % 64
    buf[:off] = np.frombuffer(blob[40 : 40 + off], dtype=np.uint8)
    return dict(h=jnp.asarray(h), buf=jnp.asarray(buf),
                cnt=jnp.asarray(np.uint32(cnt)))


def fs_state_to_host(ts, fs_np: dict) -> None:
    """Fetched device state (numpy) -> host Transcript."""
    h = np.asarray(fs_np["h"], dtype=np.uint32)
    buf = np.asarray(fs_np["buf"], dtype=np.uint8)
    cnt = int(np.asarray(fs_np["cnt"]))
    blob = h.astype("<u4").tobytes() + cnt.to_bytes(8, "little")
    off = cnt % 64
    blob += buf.tobytes()[:off] + b"\x00" * (64 - off)
    ts.import_state(blob)


def fs_absorb(fs: dict, data: jax.Array) -> dict:
    """Absorb uint8[n] (n static)."""
    n = int(data.shape[0])
    off = fs["cnt"] % np.uint32(64)
    nblk_max = (63 + n) // 64
    ext = jnp.zeros((64 * nblk_max + 64,), dtype=_U8)
    ext = jax.lax.dynamic_update_slice(ext, fs["buf"], (0,))
    ext = jax.lax.dynamic_update_slice(ext, data.astype(_U8), (off,))
    ndone = (off + np.uint32(n)) // np.uint32(64)
    h = fs["h"]
    for i in range(nblk_max):
        h2 = _compress(h, _block_words(
            jax.lax.slice_in_dim(ext, 64 * i, 64 * (i + 1))))
        h = jnp.where(np.uint32(i) < ndone, h2, h)
    newbuf = jax.lax.dynamic_slice(ext, (ndone * np.uint32(64),), (64,))
    return dict(h=h, buf=newbuf, cnt=fs["cnt"] + np.uint32(n))


def fs_getkey(fs: dict) -> jax.Array:
    """Fork+finalize -> 32-byte key (uint8[32])."""
    off = fs["cnt"] % np.uint32(64)
    ext = jnp.zeros((128,), dtype=_U8)
    ext = jax.lax.dynamic_update_slice(ext, fs["buf"], (0,))
    ext = ext.at[off].set(np.uint8(0x80))
    two = off >= np.uint32(56)
    hi = (fs["cnt"] >> np.uint32(29)).astype(_U32)
    lo = (fs["cnt"] << np.uint32(3)).astype(_U32)
    len8 = jnp.stack([
        (hi >> np.uint32(24)), (hi >> np.uint32(16)),
        (hi >> np.uint32(8)), hi,
        (lo >> np.uint32(24)), (lo >> np.uint32(16)),
        (lo >> np.uint32(8)), lo]).astype(_U8)
    lenpos = jnp.where(two, np.uint32(120), np.uint32(56))
    ext = jax.lax.dynamic_update_slice(ext, len8, (lenpos,))
    h1 = _compress(fs["h"], _block_words(ext[:64]))
    h2 = _compress(h1, _block_words(ext[64:]))
    h = jnp.where(two, h2, h1)
    # digest words -> big-endian bytes
    return jnp.stack([
        (h >> np.uint32(24)), (h >> np.uint32(16)),
        (h >> np.uint32(8)), h], axis=1).reshape(32).astype(_U8)


# ---------------------------------------------------------------------------
# AES-256 block cipher (encrypt only) — the FSPRF core
# ---------------------------------------------------------------------------

_SBOX_NP = np.array(hostcrypto._SBOX, dtype=np.uint8)
_RCON_NP = np.array(hostcrypto._RCON, dtype=np.uint8)
# SubBytes+ShiftRows source index for column-major state s[4c+r]:
# out[4c+r] = SBOX[s[4*((c+r)%4)+r]]
_SHIFT_PERM = np.array([4 * ((c + r) % 4) + r for c in range(4)
                        for r in range(4)], dtype=np.int32)


def aes256_expand(key: jax.Array) -> jax.Array:
    """uint8[32] -> round keys uint8[15, 16] (column-major per round).

    Key schedule as a lax.scan over 8-word windows (the per-squeeze
    expand sits inside every sumcheck round's traced body; the unrolled
    52-step form priced ~260 ops per call site on the remote compiler).
    """
    sbox = jnp.asarray(_SBOX_NP)
    win0 = key.reshape(8, 4)

    def step(win, rcon):
        t = win[7]
        t8 = jnp.take(sbox, jnp.roll(t, -1))
        t8 = t8.at[0].set(t8[0] ^ rcon)
        w0 = win[0] ^ t8
        w1 = win[1] ^ w0
        w2 = win[2] ^ w1
        w3 = win[3] ^ w2
        t4 = jnp.take(sbox, w3)
        w4 = win[4] ^ t4
        w5 = win[5] ^ w4
        w6 = win[6] ^ w5
        w7 = win[7] ^ w6
        nwin = jnp.stack([w0, w1, w2, w3, w4, w5, w6, w7])
        return nwin, nwin

    rcons = jnp.asarray(np.asarray(_RCON_NP[:7], dtype=np.uint8))
    _, wins = jax.lax.scan(step, win0, rcons)  # [7, 8, 4]
    words = jnp.concatenate([win0[None], wins]).reshape(64, 4)
    return words[:60].reshape(15, 16)


def _xt(a: jax.Array) -> jax.Array:
    return ((a << np.uint8(1)) ^ ((a >> np.uint8(7)) * np.uint8(0x1B))
            ).astype(_U8)


def aes256_block(rk: jax.Array, nb: jax.Array) -> jax.Array:
    """Encrypt the counter block LE64(nb)||zeros -> uint8[16]."""
    sbox = jnp.asarray(_SBOX_NP)
    perm = jnp.asarray(_SHIFT_PERM)
    ctr = jnp.zeros((16,), dtype=_U8)
    ctr = ctr.at[0].set((nb & np.uint32(0xFF)).astype(_U8))
    ctr = ctr.at[1].set(((nb >> np.uint32(8)) & np.uint32(0xFF)).astype(_U8))
    ctr = ctr.at[2].set(((nb >> np.uint32(16)) & np.uint32(0xFF)).astype(_U8))
    ctr = ctr.at[3].set(((nb >> np.uint32(24)) & np.uint32(0xFF)).astype(_U8))
    s = ctr ^ rk[0]

    # middle rounds as a scan (13 identical bodies; the body is traced
    # once instead of inflating every FS call site)
    def mid(s, rkr):
        t = jnp.take(sbox, jnp.take(s, perm))
        m = t.reshape(4, 4)  # [column, row]
        a0, a1, a2, a3 = m[:, 0], m[:, 1], m[:, 2], m[:, 3]
        o0 = _xt(a0) ^ (_xt(a1) ^ a1) ^ a2 ^ a3
        o1 = a0 ^ _xt(a1) ^ (_xt(a2) ^ a2) ^ a3
        o2 = a0 ^ a1 ^ _xt(a2) ^ (_xt(a3) ^ a3)
        o3 = (_xt(a0) ^ a0) ^ a1 ^ a2 ^ _xt(a3)
        return jnp.stack([o0, o1, o2, o3], axis=1).reshape(16) ^ rkr, None

    s, _ = jax.lax.scan(mid, s, rk[1:14])
    return jnp.take(sbox, jnp.take(s, perm)) ^ rk[14]


# ---------------------------------------------------------------------------
# FSPRF byte stream
# ---------------------------------------------------------------------------

def prf_fresh(key: jax.Array) -> dict:
    rk = aes256_expand(key)
    return dict(rk=rk, nb=jnp.asarray(np.uint32(1)),
                saved=aes256_block(rk, jnp.asarray(np.uint32(0))),
                ptr=jnp.asarray(np.uint32(0)))


def fs_squeeze(fs: dict) -> dict:
    """Snapshot the transcript into a fresh PRF stream."""
    return prf_fresh(fs_getkey(fs))


def prf_bytes(prf: dict, k: int) -> Tuple[jax.Array, dict]:
    """Read k (static) bytes from the PRF stream."""
    nblk = (k + 30) // 16  # window covers saved + enough fresh blocks
    parts = [prf["saved"]]
    for i in range(nblk - 1):
        parts.append(aes256_block(prf["rk"], prf["nb"] + np.uint32(i)))
    window = jnp.concatenate(parts)
    out = jax.lax.dynamic_slice(window, (prf["ptr"],), (k,))
    newpos = prf["ptr"] + np.uint32(k)
    bi = newpos // np.uint32(16)
    saved = jax.lax.dynamic_slice(window, (bi * np.uint32(16),), (16,))
    return out, dict(rk=prf["rk"], nb=prf["nb"] + bi,
                     saved=saved, ptr=newpos % np.uint32(16))


# ---------------------------------------------------------------------------
# typed writes (device twins of Transcript.write_*)
# ---------------------------------------------------------------------------

def _le8(n: int) -> np.ndarray:
    return np.frombuffer(int(n).to_bytes(8, "little"), dtype=np.uint8)


def fs_write_bytes_const(fs: dict, data: bytes) -> dict:
    arr = np.concatenate([
        np.array([TAG_BSTR], np.uint8), _le8(len(data)),
        np.frombuffer(data, dtype=np.uint8)])
    return fs_absorb(fs, jnp.asarray(arr))


def fs_write_elt(F, fs: dict, x: jax.Array) -> dict:
    """x: [L] field element (Montgomery for prime fields)."""
    data = jnp.concatenate([
        jnp.array([TAG_FIELD_ELEM], dtype=_U8), dev_elt_bytes(F, x)])
    return fs_absorb(fs, data)


def fs_write_elts(F, fs: dict, xs: jax.Array) -> dict:
    """xs: [L, k] field elements, written as one tagged array."""
    k = int(xs.shape[-1])
    header = jnp.asarray(np.concatenate([
        np.array([TAG_ARRAY], np.uint8), _le8(k)]))
    body = dev_elt_bytes(F, xs).reshape(-1)  # [k, kBytes] -> flat
    return fs_absorb(fs, jnp.concatenate([header, body]))


# ---------------------------------------------------------------------------
# field element serialization + sampling (device twins of the host
# Field.to_bytes / Field.sample rejection loops)
# ---------------------------------------------------------------------------

def dev_elt_bytes(F, x: jax.Array) -> jax.Array:
    """[L, ...] field elements -> uint8[..., kBytes] natural LE bytes."""
    nat = F.from_mont_device(x)  # identity for GF2
    lo = (nat & np.uint32(0xFF)).astype(_U8)
    hi = ((nat >> np.uint32(8)) & np.uint32(0xFF)).astype(_U8)
    b = jnp.stack([lo, hi], axis=1)  # [L, 2, ...]
    b = jnp.moveaxis(b.reshape((2 * F.L,) + x.shape[1:]), 0, -1)
    return b[..., : F.kBytes]


def _bytes_to_limbs(F, b: jax.Array) -> jax.Array:
    """uint8[nbytes] -> uint32[L] 16-bit limbs (zero-extended)."""
    bb = jnp.zeros((2 * F.L,), dtype=_U8).at[: b.shape[0]].set(b)
    return bb[0::2].astype(_U32) | (bb[1::2].astype(_U32) << 8)


def _prf_keep(keep, prf_old: dict, prf_new: dict) -> dict:
    """Per-leaf select: where `keep` (bool, possibly batched), retain the
    old PRF state."""

    def sel(o, n):
        k = keep.reshape(keep.shape + (1,) * (o.ndim - keep.ndim)) \
            if getattr(keep, "ndim", 0) and o.ndim > keep.ndim else keep
        return jnp.where(k, o, n)

    return jax.tree_util.tree_map(sel, prf_old, prf_new)


def dev_sample_elt(F, prf: dict) -> Tuple[jax.Array, dict]:
    """Draw one field element with rejection sampling, byte-exact vs the
    host Field.sample (fp.py / gf2.py)."""
    if F.kCharacteristicTwo:
        b, prf = prf_bytes(prf, F.kBytes)
        return _bytes_to_limbs(F, b), prf

    total_l = (F.exact_bits + 7) // 8
    rem = F.exact_bits % 8
    top_mask = np.uint8(0xFF if rem == 0 else (1 << rem) - 1)
    p_limbs = F.p_np

    def attempt(prf):
        b, prf = prf_bytes(prf, total_l)
        b = b.at[total_l - 1].set(b[total_l - 1] & top_mask)
        limbs = _bytes_to_limbs(F, b)
        borrow = jnp.asarray(np.uint32(0))
        for i in range(F.L):
            d = limbs[i] - np.uint32(p_limbs[i]) - borrow
            borrow = d >> np.uint32(31)
        return limbs, borrow == np.uint32(1), prf

    limbs0, ok0, prf0 = attempt(prf)

    def cond(c):
        return ~c[1]

    def body(c):
        limbs_old, ok_old, prf_old = c
        limbs, ok, prf = attempt(prf_old)
        # keep already-accepted lanes' VALUES and PRF STATE (vmap-safe:
        # under vmap the loop runs until every lane accepts, and an
        # accepted lane's byte stream must not advance — the host
        # transcript it twins consumed nothing further)
        return (jnp.where(ok_old, limbs_old, limbs), ok_old | ok,
                _prf_keep(ok_old, prf_old, prf))

    limbs, _, prf = jax.lax.while_loop(cond, body, (limbs0, ok0, prf0))
    # natural -> Montgomery (mul by R2)
    r2 = jnp.asarray(F.r2_np)
    return F.mul(limbs, r2), prf


def dev_sample_elts(F, prf: dict, n: int) -> Tuple[jax.Array, dict]:
    """n consecutive draws from one PRF stream -> [L, n] (lax.scan so the
    traced graph stays one draw regardless of n)."""

    def body(prf, _):
        x, prf = dev_sample_elt(F, prf)
        return prf, x

    prf, xs = jax.lax.scan(body, prf, None, length=n)
    return jnp.moveaxis(xs, 0, -1), prf


def fs_challenge_elt(F, fs: dict) -> Tuple[jax.Array, dict]:
    """Squeeze one element (fresh PRF; transcript state unchanged)."""
    x, _ = dev_sample_elt(F, fs_squeeze(fs))
    return x, fs


# ---------------------------------------------------------------------------
# naturals + distinct-index choose (device twins of Transcript.nat/choose,
# reference random.h:57-105) — used for the Ligero column openings
# ---------------------------------------------------------------------------

def _nat_mask(n: int) -> int:
    mask = 0
    while (n & mask) != n:
        mask = (mask << 1) | 1
    return mask


def dev_nat(prf: dict, n: int) -> Tuple[jax.Array, dict]:
    """Random uint32 < n (static n <= 2^32) by rejection, byte-exact vs
    the host Transcript.nat."""
    assert 0 < n <= 1 << 32
    l = max(1, (int(n).bit_length() + 7) // 8)
    msk = np.uint32(_nat_mask(n))

    def draw(prf):
        b, prf = prf_bytes(prf, l)
        r = jnp.zeros((), _U32)
        for i in range(l):
            r = r | (b[i].astype(_U32) << np.uint32(8 * i))
        return r & msk, prf

    r0, prf0 = draw(prf)

    def cond(c):
        return ~(c[0] < np.uint32(n))

    def body(c):
        r_old, prf_old = c
        ok_old = r_old < np.uint32(n)
        r, prf = draw(prf_old)
        return (jnp.where(ok_old, r_old, r),
                _prf_keep(ok_old, prf_old, prf))

    r, prf = jax.lax.while_loop(cond, body, (r0, prf0))
    return r, prf


def dev_choose(prf: dict, n: int, k: int) -> Tuple[jax.Array, dict]:
    """k distinct naturals in [0, n) via the partial Fisher-Yates walk,
    byte-exact vs the host Transcript.choose.  Returns int32[k]."""
    assert n >= k
    A = jnp.arange(n, dtype=jnp.int32)
    res = []
    for i in range(k):
        r, prf = dev_nat(prf, n - i)
        j = (np.int32(i) + r).astype(jnp.int32)
        ai = A[i]
        aj = A[j]
        A = A.at[i].set(aj).at[j].set(ai)
        res.append(aj)
    return jnp.stack(res), prf
