"""Base64url decoder circuit vs python base64 oracle."""

import base64
import random

import pytest

from longfellow_zk_tpu.circuits.base64.decode import Base64Decoder
from longfellow_zk_tpu.compiler.logic import EvaluationBackend, Logic
from longfellow_zk_tpu.fields.fp_instances import fp128
from longfellow_zk_tpu.fields.gf2 import gf2_128


def _bits(L, data):
    return [[L.bit((b >> j) & 1) for j in range(8)] for b in data]


def _val(L, F, byte_bits):
    return sum(int(L.eval(b) == F.of_scalar(1)) << j
               for j, b in enumerate(byte_bits))


@pytest.mark.parametrize("field_fn", [fp128, gf2_128])
def test_base64_decode(field_fn):
    F = field_fn()
    L = Logic(EvaluationBackend(F), F)
    dec = Base64Decoder(L)
    rng = random.Random(1)
    for trial in range(4):
        raw = bytes(rng.randrange(256) for _ in range(rng.randrange(3, 20)))
        enc = base64.urlsafe_b64encode(raw).rstrip(b"=")
        out = dec.base64_rawurl_decode(_bits(L, enc))
        got = bytes(_val(L, F, ob) for ob in out[: len(raw)])
        assert got == raw, (trial, enc, got, raw)


def test_base64_invalid_char_rejected():
    F = fp128()
    L = Logic(EvaluationBackend(F), F)
    dec = Base64Decoder(L)
    with pytest.raises(AssertionError):
        dec.base64_rawurl_decode(_bits(L, b"AB*A"))


def test_base64_decode_len():
    F = fp128()
    L = Logic(EvaluationBackend(F), F)
    dec = Base64Decoder(L)
    raw = b"hello world!"
    enc = base64.urlsafe_b64encode(raw).rstrip(b"=")
    # pad buffer with garbage beyond len; must be ignored
    buf = enc + b"****"
    length = L.bits(8, len(enc))
    out = dec.base64_rawurl_decode_len(_bits(L, buf), length, len(buf))
    got = bytes(_val(L, F, ob) for ob in out[: len(raw)])
    assert got == raw
