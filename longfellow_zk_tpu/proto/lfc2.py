"""LFC2 circuit wire format — the next-generation successor of LFC1.

Semantic twin of reference rust/core/proto/src/{writer,reader}/lfc2.rs:
"LFC2" magic, ULEB128 header, deduplicated zigzag-delta term table, a
segment dictionary of delta-index runs, and a token stream expanding to
the term sequence (rust/README.md:40-41: ~1 MB vs ~100 MB for the mdoc
circuits).  Terms reconstruct by wrapping-u32 accumulation of deltas
from (0,0,0).  The 32-byte trailing id is the same canonical circuit id
as LFC1 (rust/core/proto/src/circuit.rs compute_id == C++
sumcheck/circuit_id.h, already bit-verified against the zk_spec
registry).

Writer strategy mirrors the Rust compiler's (scheduler.rs:584): one
segment holding the deduplicated delta indices of the whole layer,
token stream [0] — the size win comes from delta dedup + ULEB encoding.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..sumcheck.circuit import Circuit, Layer, Quad
from ..utils.serialization import ReadBuffer
from .lfc1 import circuit_id, lg

MAGIC = b"LFC2"
MAX_WIRES = 5_000_000
MAX_TERMS = 20_000_000
MAX_LAYERS = 10_000
MAX_CONSTANTS = 5_000_000
_U32 = 0xFFFFFFFF
_ULEB_MAX = 0x0FFF_FFFF


def _uleb(out: bytearray, v: int) -> None:
    assert 0 <= v <= _ULEB_MAX, v
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_uleb(buf: ReadBuffer) -> int:
    v = 0
    shift = 0
    for _ in range(4):
        b = buf.u8()
        v |= (b & 0x7F) << shift
        if not (b & 0x80):
            return v
        shift += 7
    raise ValueError("ULEB128 longer than 4 bytes")


def _zigzag(delta: int) -> int:
    """wrapping-u32 delta -> zigzag u32."""
    d = delta & _U32
    return ((d << 1) & _U32) ^ (_U32 if d >> 31 else 0)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ ((-(v & 1)) & _U32)


def write_circuit(F, field_id: int, circ: Circuit) -> bytes:
    out = bytearray(MAGIC)
    _uleb(out, field_id)
    _uleb(out, circ.nv)
    _uleb(out, 1)  # nc (LFC2 stores single-copy circuits)
    _uleb(out, circ.npub_in)
    _uleb(out, circ.subfield_boundary)
    _uleb(out, circ.ninputs)
    _uleb(out, len(circ.layers))

    # constants in first-use order, deduplicated (like LFC1)
    kvec: List = []
    kmap = {}
    for layer in circ.layers:
        for val in layer.quad.v:
            if val not in kmap:
                kmap[val] = len(kvec)
                kvec.append(val)
    _uleb(out, len(kvec))
    for val in kvec:
        out += F.to_bytes(val)

    for layer in circ.layers:
        _uleb(out, layer.logw)
        _uleb(out, layer.nw)
        q = layer.quad
        # delta-encode, dedupe
        deltas: List[tuple] = []
        dmap = {}
        seg: List[int] = []
        pg = ph0 = ph1 = 0
        for i in range(q.nterms):
            g, h0, h1 = int(q.g[i]), int(q.h0[i]), int(q.h1[i])
            d = ((g - pg) & _U32, (h0 - ph0) & _U32, (h1 - ph1) & _U32,
                 kmap[q.v[i]])
            idx = dmap.get(d)
            if idx is None:
                idx = dmap[d] = len(deltas)
                deltas.append(d)
            seg.append(idx)
            pg, ph0, ph1 = g, h0, h1
        _uleb(out, len(deltas))
        for dg, dh0, dh1, ki in deltas:
            _uleb(out, _zigzag(dg))
            _uleb(out, _zigzag(dh0))
            _uleb(out, _zigzag(dh1))
            _uleb(out, ki)
        _uleb(out, 1)  # one segment
        _uleb(out, len(seg))
        for idx in seg:
            _uleb(out, idx)
        _uleb(out, 1)  # one token
        _uleb(out, 0)

    cid = circuit_id(F, circ)
    out += cid
    return bytes(out)


def read_circuit(F, field_id: int, data: bytes,
                 enforce_circuit_id: bool = True) -> Optional[Circuit]:
    try:
        return _read(F, field_id, ReadBuffer(data), enforce_circuit_id)
    except (ValueError, AssertionError, IndexError):
        return None


def _read(F, field_id: int, buf: ReadBuffer,
          enforce_circuit_id: bool) -> Optional[Circuit]:
    if buf.bytes(4) != MAGIC:
        return None
    if _read_uleb(buf) != field_id:
        return None
    nv = _read_uleb(buf)
    nc = _read_uleb(buf)
    if nv > MAX_WIRES or nc != 1:
        return None
    npub_in = _read_uleb(buf)
    subfield_boundary = _read_uleb(buf)
    ninputs = _read_uleb(buf)
    nl = _read_uleb(buf)
    if max(npub_in, subfield_boundary, ninputs) > MAX_WIRES or \
            nl > MAX_LAYERS:
        return None

    numconst = _read_uleb(buf)
    if numconst > MAX_CONSTANTS:
        return None
    consts = []
    for _ in range(numconst):
        v = F.of_bytes(buf.bytes(F.kBytes))
        if v is None:
            return None
        consts.append(v)

    layers = []
    total_terms = 0
    for _ in range(nl):
        logw = _read_uleb(buf)
        nw = _read_uleb(buf)
        if logw > 40 or nw > MAX_WIRES:
            return None
        ndeltas = _read_uleb(buf)
        if ndeltas > MAX_TERMS:
            return None
        dg = np.zeros(ndeltas, np.uint32)
        dh0 = np.zeros(ndeltas, np.uint32)
        dh1 = np.zeros(ndeltas, np.uint32)
        dk = np.zeros(ndeltas, np.uint32)
        for i in range(ndeltas):
            dg[i] = _unzigzag(_read_uleb(buf))
            dh0[i] = _unzigzag(_read_uleb(buf))
            dh1[i] = _unzigzag(_read_uleb(buf))
            ki = _read_uleb(buf)
            if ki >= numconst:
                return None
            dk[i] = ki
        nseg = _read_uleb(buf)
        if nseg > MAX_TERMS:
            return None
        segments = []
        for _ in range(nseg):
            slen = _read_uleb(buf)
            if slen > MAX_TERMS:
                return None
            seg = np.zeros(slen, np.uint32)
            for i in range(slen):
                idx = _read_uleb(buf)
                if idx >= ndeltas:
                    return None
                seg[i] = idx
            segments.append(seg)
        ntok = _read_uleb(buf)
        if ntok > MAX_TERMS:
            return None
        toks = []
        for _ in range(ntok):
            t = _read_uleb(buf)
            if t >= nseg:
                return None
            toks.append(t)
        # expand tokens -> delta index sequence -> running-sum terms
        if toks:
            didx = np.concatenate([segments[t] for t in toks])
        else:
            didx = np.zeros(0, np.uint32)
        nterms = len(didx)
        total_terms += nterms
        if total_terms > MAX_TERMS:
            return None
        g = np.cumsum(dg[didx], dtype=np.uint32).astype(np.int64)
        h0 = np.cumsum(dh0[didx], dtype=np.uint32).astype(np.int64)
        h1 = np.cumsum(dh1[didx], dtype=np.uint32).astype(np.int64)
        kidx = dk[didx]
        quad = Quad(g=g, h0=h0, h1=h1, kidx=kidx.astype(np.int64),
                    ktable=consts)
        layers.append(Layer(nw=nw, logw=logw, quad=quad))

    cid = buf.bytes(32)
    circ = Circuit(nv=nv, logv=lg(nv), nc=1, logc=0, nl=nl,
                   ninputs=ninputs, npub_in=npub_in,
                   subfield_boundary=subfield_boundary, layers=layers,
                   id=cid)
    if enforce_circuit_id and circuit_id(F, circ) != cid:
        return None
    return circ
