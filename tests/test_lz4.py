"""LZ4 block/frame codec: xxhash32 vectors, round trips, RLE
overlap, corruption detection, DataFrame reader."""

import random
import struct

import pytest

from nowdb_spark.sources import lz4 as L


def test_xxhash32_published_vectors():
    assert L.xxhash32(b"") == 0x02CC5D05
    assert L.xxhash32(b"a") == 0x550D7456
    assert L.xxhash32(b"abc") == 0x32D153FF
    assert (L.xxhash32(b"Nobody inspects the spammish repetition")
            == 0xE2293B2F)
    assert L.xxhash32(b"", seed=1) != L.xxhash32(b"")


@pytest.mark.parametrize("i", range(6))
def test_block_roundtrip(i):
    rng = random.Random(i)
    cases = [b"", b"short", b"ab" * 500, b"x" * 1000,
             bytes(rng.randrange(256) for _ in range(2000)),
             (b"the quick brown fox " * 50)
             + bytes(rng.randrange(256) for _ in range(100))]
    d = cases[i]
    assert L.decompress_block(L.compress_block(d)) == d


def test_rle_overlap_compresses():
    c = L.compress_block(b"x" * 1000)
    assert len(c) < 30                       # offset-1 overlap copy
    assert L.decompress_block(c) == b"x" * 1000


def test_block_guards():
    with pytest.raises(ValueError, match="bad match offset"):
        # token: 1 literal + match, offset 0 (invalid)
        L.decompress_block(bytes([0x10, 65]) + struct.pack("<H", 0))
    with pytest.raises(ValueError, match="truncated"):
        L.decompress_block(bytes([0x50, 65]))  # claims 5 literals
    with pytest.raises(ValueError, match="max_out"):
        L.decompress_block(L.compress_block(b"y" * 5000), max_out=100)


def test_frame_roundtrip_and_checksums():
    data = b"hello world " * 300
    f = L.compress_frame(data, block_size=512)
    assert L.decompress_frame(f) == data
    bad = bytearray(f)
    bad[5] ^= 0x10
    with pytest.raises(ValueError, match="header checksum"):
        L.decompress_frame(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        L.decompress_frame(b"PK\x03\x04xxxx")
    with pytest.raises(ValueError, match="EndMark|truncated"):
        L.decompress_frame(f[:-10])
    # incompressible data takes the uncompressed-block path
    rng = random.Random(3)
    rnd = bytes(rng.randrange(256) for _ in range(500))
    f2 = L.compress_frame(rnd, block_size=256)
    assert L.decompress_frame(f2) == rnd
    (w,) = struct.unpack_from("<I", f2, 7)
    assert w & 0x80000000                    # high bit = raw block


def test_read_lz4_frames_df(spark):
    data = b"training shard payload " * 40
    df = spark.createDataFrame(
        [(6, bytearray(L.compress_frame(data)))],
        "doc_id long, payload binary")
    out = L.read_lz4_frames(df).collect()
    assert out[0]["n_raw"] == len(data)
    assert bytes(out[0]["data"]) == data
