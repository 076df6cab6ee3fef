"""Snappy raw + framing codec: spec-byte decodes, round trips,
RLE overlaps, CRC framing, DataFrame reader."""

import random
import struct

import pytest

from nowdb_spark.sources import snappy as SN


def test_handbuilt_spec_bytes():
    # literal-only: preamble varint 5, tag len-5 literal
    assert SN.decompress_raw(bytes([5, 4 << 2]) + b"abcde") == b"abcde"
    # copy with 1-byte offset: 'ab' then len-4 off-2 overlap copy
    raw = bytes([6, 1 << 2]) + b"ab" + bytes([0b00000001, 2])
    assert SN.decompress_raw(raw) == b"ababab"
    # same via the 2-byte-offset form
    raw2 = (bytes([6, 1 << 2]) + b"ab"
            + bytes([((4 - 1) << 2) | 2]) + struct.pack("<H", 2))
    assert SN.decompress_raw(raw2) == b"ababab"
    # long-literal form (tag 60 => 1 extra length byte)
    lit = bytes(range(70))
    raw3 = bytes([70, 60 << 2, 69]) + lit
    assert SN.decompress_raw(raw3) == lit


@pytest.mark.parametrize("i", range(7))
def test_raw_roundtrip(i):
    rng = random.Random(5)
    cases = [b"", b"short", b"ab" * 500, b"x" * 1000,
             bytes(rng.randrange(256) for _ in range(3000)),
             (b"the quick brown fox " * 80)
             + bytes(rng.randrange(256) for _ in range(64)),
             b"A" * 70 + b"B" * 3]
    d = cases[i]
    assert SN.decompress_raw(SN.compress_raw(d)) == d


def test_rle_compresses():
    c = SN.compress_raw(b"x" * 1000)
    assert len(c) < 80            # copy-2 caps at 64 bytes per copy
    assert SN.decompress_raw(c) == b"x" * 1000


def test_raw_guards():
    with pytest.raises(ValueError, match="length mismatch"):
        SN.decompress_raw(bytes([10, 4 << 2]) + b"abcde")
    with pytest.raises(ValueError, match="bad snappy copy offset"):
        SN.decompress_raw(bytes([4, 0]) + b"a"
                          + bytes([((4 - 1) << 2) | 2])
                          + struct.pack("<H", 9))
    with pytest.raises(ValueError, match="truncated"):
        SN.decompress_raw(bytes([9, 8 << 2]) + b"a")
    with pytest.raises(ValueError, match="max_out"):
        SN.decompress_raw(SN.compress_raw(b"y" * 5000), max_out=100)


def test_framed_roundtrip_and_crc():
    data = b"hello world " * 300
    f = SN.compress_framed(data, chunk_size=512)
    assert SN.decompress_framed(f) == data
    bad = bytearray(f)
    bad[20] ^= 1
    with pytest.raises(ValueError):
        SN.decompress_framed(bytes(bad))
    with pytest.raises(ValueError, match="stream id"):
        SN.decompress_framed(b"not a snappy stream")
    # incompressible chunk takes the 0x01 uncompressed path
    rng = random.Random(9)
    rnd = bytes(rng.randrange(256) for _ in range(400))
    f2 = SN.compress_framed(rnd, chunk_size=200)
    assert f2[10] == 0x01
    assert SN.decompress_framed(f2) == rnd
    # unskippable reserved chunk type errors, skippable is ignored
    f3 = (SN.STREAM_ID + bytes([0x03, 1, 0, 0]) + b"z")
    with pytest.raises(ValueError, match="unskippable"):
        SN.decompress_framed(f3)
    f4 = (SN.STREAM_ID + bytes([0x80, 1, 0, 0]) + b"z"
          + SN.compress_framed(b"tail")[10:])
    assert SN.decompress_framed(f4) == b"tail"


def test_read_snappy_frames_df(spark):
    data = b"training shard payload " * 40
    df = spark.createDataFrame(
        [(8, bytearray(SN.compress_framed(data)))],
        "doc_id long, payload binary")
    out = SN.read_snappy_frames(df).collect()
    assert out[0]["n_raw"] == len(data)
    assert bytes(out[0]["data"]) == data
