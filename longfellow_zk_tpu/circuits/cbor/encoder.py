"""Minimal deterministic CBOR encoder (RFC 8949 core subset).

Host-side complement of host_decoder.py, used by the verifier service
to build/parse ZKDeviceResponse containers (the reference's Go service
uses fxamacker/cbor for the same purpose,
reference/verifier-service/server/zk/cbor.go:28-101).  Definite-length
encodings only; map keys keep insertion order (the wallet formats are
order-sensitive byte strings, not canonical maps).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any


@dataclass
class Tag:
    number: int
    value: Any


def _head(major: int, n: int) -> bytes:
    if n < 24:
        return bytes([(major << 5) | n])
    if n < 0x100:
        return bytes([(major << 5) | 24, n])
    if n < 0x10000:
        return bytes([(major << 5) | 25]) + n.to_bytes(2, "big")
    if n < 0x100000000:
        return bytes([(major << 5) | 26]) + n.to_bytes(4, "big")
    return bytes([(major << 5) | 27]) + n.to_bytes(8, "big")


def encode(obj: Any) -> bytes:
    if obj is False:
        return b"\xf4"
    if obj is True:
        return b"\xf5"
    if obj is None:
        return b"\xf6"
    if isinstance(obj, int):
        return _head(0, obj) if obj >= 0 else _head(1, -1 - obj)
    if isinstance(obj, (bytes, bytearray)):
        return _head(2, len(obj)) + bytes(obj)
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        return _head(3, len(b)) + b
    if isinstance(obj, (list, tuple)):
        return _head(4, len(obj)) + b"".join(encode(x) for x in obj)
    if isinstance(obj, dict):
        out = _head(5, len(obj))
        for k, v in obj.items():
            out += encode(k) + encode(v)
        return out
    if isinstance(obj, Tag):
        return _head(6, obj.number) + encode(obj.value)
    raise TypeError("cbor encode: unsupported type %r" % type(obj))
