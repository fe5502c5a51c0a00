"""Host CBOR decoder + zk_spec registry tests (mirror reference
cbor host_decoder_test.cc, zk_spec coverage)."""

from longfellow_zk_tpu.circuits.cbor.host_decoder import (
    ARRAY,
    BYTES,
    MAP,
    TAG,
    TEXT,
    UNSIGNED,
    decode,
)
from longfellow_zk_tpu.circuits.mdoc.zk_spec import (
    ZK_SPECS,
    find_zk_spec,
    find_zk_spec_by_version,
)


def test_decode_unsigned():
    for val, enc in [(0, b"\x00"), (23, b"\x17"), (24, b"\x18\x18"),
                     (1000, b"\x19\x03\xe8"),
                     (1 << 32, b"\x1b\x00\x00\x00\x01\x00\x00\x00\x00")]:
        d, pos = decode(enc)
        assert d.t == UNSIGNED and d.as_unsigned() == val
        assert pos == len(enc)


def test_decode_strings_and_offsets():
    data = b"\x63abc" + b"\x44wxyz"
    d, pos = decode(data)
    assert d.t == TEXT
    assert d.text(data) == b"abc"
    d2, pos2 = decode(data, pos)
    assert d2.t == BYTES and d2.text(data) == b"wxyz"
    assert d2.str_pos == pos + 1
    # offset tracking for nested sub-documents
    d3, _ = decode(data, pos, offset=100)
    assert d3.header_pos == pos + 100


def test_decode_map_array_tag():
    # {"a": 1, "b": [2, 3]} then tag 24 (embedded CBOR bytes)
    data = bytes.fromhex("a2" + "6161" + "01" + "6162" + "82" + "02" + "03")
    d, pos = decode(data)
    assert d.t == MAP and d.n_items == 2
    kv = d.lookup(data, b"b")
    assert kv is not None
    _, v = kv
    assert v.t == ARRAY and v.n_items == 2
    assert v.index(1).as_unsigned() == 3
    assert d.lookup(data, b"zz") is None

    tagged = bytes.fromhex("d818" + "43" + "010203")
    t, _ = decode(tagged)
    assert t.t == TAG and t.as_tag() == 24
    assert t.tagged_value().t == BYTES


def test_decode_adversarial():
    # truncated payloads and counts must return None, not crash
    assert decode(b"") is None
    assert decode(b"\x18") is None  # missing count byte
    assert decode(b"\x63ab") is None  # short text
    assert decode(b"\x82\x01") is None  # short array
    assert decode(b"\x9b\xff\xff\xff\xff\xff\xff\xff\xff") is None  # huge len
    deep = b"\xc1" * 100 + b"\x01"  # tag nesting > max_depth
    assert decode(deep) is None


def test_zk_spec_registry():
    assert len(ZK_SPECS) == 12  # matches reference kNumZkSpecs
    spec = find_zk_spec(
        "longfellow-libzk-v1",
        "8d079211715200ff06c5109639245502bfe94aa869908d31176aae4016182121")
    assert spec is not None
    assert spec.num_attributes == 1 and spec.version == 7
    assert spec.block_enc_hash == 4151 and spec.block_enc_sig == 4096
    assert find_zk_spec("longfellow-libzk-v1", "00" * 32) is None
    s6 = find_zk_spec_by_version(6, 2)
    assert s6 is not None and s6.block_enc_hash == 4025
