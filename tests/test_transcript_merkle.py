"""Bit-exactness tests against reference spec vectors
(docs/specs/testvectors.md): Fiat-Shamir transcript and Merkle tree."""

import random

import pytest

from longfellow_zk_tpu.fields.fp_instances import p256k1_base
from longfellow_zk_tpu.merkle.merkle import (
    MerkleTree,
    MerkleTreeVerifier,
)
from longfellow_zk_tpu.random_oracle.transcript import Transcript

# Test Vectors for Fiat-Shamir use
# p = 2^256 - 2^32 - 977 (secp256k1 base field), "the 4-word field".

FS_V1_EXPECT = [
    0x8B297F0BFFD583C6C6B6796385D5FD20A08665733B833970EBDD1054BBBC1B14,
    0x0667C08AD7F38EFEC5F30DC8AA4F20D749CDCF96D63A770F9810AC5C0CA8DCB1,
    0xC8037FC12D4DA00B5DC7597E3042F33F72A06F970CB71FB6B103EBB5419D8A6B,
    0xFBBCFA1EAC48728FBFDACC1C21E2F78119457E0846337E46140E38E62856C4C5,
    0x5358AE603691CC759FAEB572FB6642654EA1C3DBC8F81D00276DD8C4DF95AA58,
    0x5266158C3C895DEDE5A23B6CE85A9F564B8059EBFCD1741F54497EC58189873E,
    0x3ECEA4B2343C007FC32F2AFF40DC7320945F101ECAE5D52494DB21AD326E9739,
    0x6462DD575E6B874118607212FEEC7CE5417AE3BF0F2E86604596F35D48BBAEA2,
    0x6D56C703C369EDEA3595DB6B958241580AE9B4A76FEAD961413ED9E9E5852DCD,
    0x6D31073CEE650212A71B7B13E9F951E00EF3B14A008A79DD95047B26A4A83D06,
    0x1B9E2A6666DA63C43E52227D91A8A7F0BD5311F63C2E3A18839133375639E6CB,
    0x332EA49DD23DD4745631ECBB15696192B1FA127256BAF7A0483FD27DB6F09A48,
    0x43E735927CCBDC4D5CE912675D638D6D3DC8EEF3DEF34504304E938846F157D6,
    0xDC4A8868AE75E733A7257A8589230392A98D78594836DFCCD01304742B5B3AD5,
    0x976353931711C634F2691E507B119FD7F6E653D419A2620676122DB08DB18765,
    0x332729AB436DCA654866A9382DEAEE0ADD6FB7E90A80261F1488E56598E8BC99,
]

FS_V2_EXPECT_FIRST = 0x609DB3E9A8F548DF038519FA46CEF23EB8C6553D3C1F698604E60A51613A738E
FS_V2_EXPECT_LAST = 0x79251F49534F5C4B10B798B2DBF6E80A3B07593F616CE6A9617CCC61040AAC78
FS_V3_EXPECT_FIRST = 0xAE1A921288590205FC24543303FF527476359B8DB4A983B2886A133B02F3217E
FS_V3_EXPECT_LAST = 0x47DC31F6D8BC9C44290781176DF3E4B95AC8793A4A42FA5859C564D92D6D5AF5

FS_V4_EXPECT = [0, 0, 0, 0, 0, 0, 3, 0, 4, 5, 10, 30, 27, 22, 100, 189, 3, 92,
                999, 3105, 40886, 51590, 56367, 10678]
FS_V4_PARAMS = [1, 1, 1, 2, 2, 2, 7, 7, 7, 7, 32, 32, 32, 32, 256, 256, 256,
                256, 1000, 10000, 60000, 65535, 100000, 100000]

FS_V5 = [
    (31, [10, 29, 30, 11, 4, 15, 16, 28, 19, 21, 25, 18, 17, 3, 5, 23, 24, 22, 6, 1]),
    (32, [3, 17, 18, 8, 30, 7, 14, 19, 25, 23, 12, 4, 31, 16, 0, 6, 20, 27, 11, 10]),
    (63, [9, 56, 61, 45, 35, 53, 51, 3, 39, 32, 31, 6, 59, 58, 54, 22, 27, 62, 55, 19]),
    (64, [12, 52, 39, 17, 51, 38, 58, 2, 28, 27, 46, 63, 61, 50, 40, 55, 47, 13, 56, 32]),
    (1000, [157, 668, 572, 138, 913, 994, 797, 249, 440, 723, 489, 241, 383, 108,
            710, 341, 406, 585, 42, 692]),
    (65535, [40745, 48408, 17108, 44500, 53993, 10008, 24910, 52200, 61265, 54989,
             41237, 25958, 28697, 61187, 34729, 3525, 9005, 38627, 9724, 12169]),
]


def _fs_state_after_v3():
    F = p256k1_base()
    t = Transcript(b"test")
    t.write_bytes(bytes(range(100)))
    got = t.elts(16, F)
    assert got == FS_V1_EXPECT
    t.write_elt(7, F)
    got2 = t.elts(16, F)
    assert got2[0] == FS_V2_EXPECT_FIRST
    assert got2[15] == FS_V2_EXPECT_LAST
    t.write_elts([8, 9], F)
    got3 = t.elts(16, F)
    assert got3[0] == FS_V3_EXPECT_FIRST
    assert got3[15] == FS_V3_EXPECT_LAST
    return t


def test_fs_vectors_1_to_3():
    _fs_state_after_v3()


def test_fs_vector_4_nat():
    t = _fs_state_after_v3()
    t.write_bytes(b"nats")
    got = [t.nat(n) for n in FS_V4_PARAMS]
    assert got == FS_V4_EXPECT


def test_fs_vector_5_choose():
    t = _fs_state_after_v3()
    t.write_bytes(b"nats")
    for n in FS_V4_PARAMS:
        t.nat(n)
    t.write_bytes(b"choose")
    for m, expect in FS_V5:
        assert t.choose(m, 20) == expect


def test_fs_prf_invalidation_and_clone():
    F = p256k1_base()
    t = Transcript(b"abc")
    a = t.elt(F)
    c = t.clone()
    # clone starts from the hash state; same next challenge... but note the
    # original already squeezed; writes reset the PRF on both.
    t.write_bytes(b"x")
    c.write_bytes(b"x")
    assert t.elt(F) == c.elt(F)


# --- Merkle vectors ---------------------------------------------------------

MERKLE_LEAVES = [
    "4bf5122f344554c53bde2ebb8cd2b7e3d1600ad631c385a5d7cce23c7785459a",
    "dbc1b4c900ffe48d575b5da5c638040125f65db0fe3e24494b76ea986457d986",
    "084fed08b978af4d7d196a7446a86b58009e636b611db16211b65a9aadff29c5",
    "e52d9c508c502347344d8c07ad91cbd6068afc75ff6292f062a09ca381c89e71",
    "e77b9a9ae9e30b0dbdb6f510a264ef9de781501d7b6b92ae89eb059c5ab743db",
]
MERKLE_ROOT = "f22f4501ffd3bdffcecc9e4cd6828a4479aeedd6aa484eb7c1f808ccf71c6e76"
MERKLE_PROOF_01 = [
    "084fed08b978af4d7d196a7446a86b58009e636b611db16211b65a9aadff29c5",
    "f03808f5b8088c61286d505e8e93aa378991d9889ae2d874433ca06acabcd493",
]
MERKLE_PROOF_13 = [
    "e77b9a9ae9e30b0dbdb6f510a264ef9de781501d7b6b92ae89eb059c5ab743db",
    "084fed08b978af4d7d196a7446a86b58009e636b611db16211b65a9aadff29c5",
    "4bf5122f344554c53bde2ebb8cd2b7e3d1600ad631c385a5d7cce23c7785459a",
]


def _build_tree():
    t = MerkleTree(5)
    t.set_leaves([bytes.fromhex(h) for h in MERKLE_LEAVES])
    root = t.build_tree()
    return t, root


def test_merkle_root_vector():
    _, root = _build_tree()
    assert root.hex() == MERKLE_ROOT


@pytest.mark.parametrize(
    "pos,proof_hex",
    [((0, 1), MERKLE_PROOF_01), ((1, 3), MERKLE_PROOF_13)],
)
def test_merkle_compressed_proof_vectors(pos, proof_hex):
    t, root = _build_tree()
    proof = t.generate_compressed_proof(list(pos))
    assert [p.hex() for p in proof] == proof_hex
    v = MerkleTreeVerifier(5, root)
    leaves = [bytes.fromhex(MERKLE_LEAVES[p]) for p in pos]
    assert v.verify_compressed_proof(proof, leaves, list(pos))
    # negative: corrupt a leaf
    bad = [bytes(32) for _ in pos]
    assert not v.verify_compressed_proof(proof, bad, list(pos))
    # negative: truncated proof
    assert not v.verify_compressed_proof(proof[:-1], leaves, list(pos))


def test_merkle_random_roundtrip():
    rng = random.Random(4)
    for n in [1, 2, 3, 8, 13]:
        t = MerkleTree(n)
        leaves = [bytes([rng.randrange(256) for _ in range(32)]) for _ in range(n)]
        t.set_leaves(leaves)
        root = t.build_tree()
        k = rng.randrange(1, n + 1)
        pos = sorted(rng.sample(range(n), k))
        proof = t.generate_compressed_proof(pos)
        v = MerkleTreeVerifier(n, root)
        assert v.verify_compressed_proof(proof, [leaves[p] for p in pos], pos)
