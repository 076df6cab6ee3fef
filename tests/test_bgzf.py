"""BGZF splittable-gzip source: spec framing, stdlib interop,
corruption detection, DataFrame reader."""

import gzip
import zlib

import pytest

from nowdb_spark.sources import bgzf as BG


def test_roundtrip_and_gzip_interop():
    data = b"".join(f"line {i} of the corpus\n".encode()
                    for i in range(200))
    b = BG.encode_bgzf(data, block_size=100)
    blocks = list(BG.bgzf_blocks(b))
    out = b"".join(BG.decompress_block(b, c, s) for c, s in blocks)
    assert out == data
    # every block is a standard RFC 1952 member: stdlib reads it all
    assert gzip.decompress(b) == data
    # terminal EOF marker is the spec constant, decodes empty
    c, s = blocks[-1]
    assert b[c:c + s] == BG.BGZF_EOF
    assert BG.decompress_block(b, c, s) == b""


def test_index_is_metadata_only():
    # bgzf_blocks must work even when the deflate payload is garbage
    # (it never inflates) — corrupt a payload byte, index unchanged
    data = bytes(range(256)) * 4
    b = bytearray(BG.encode_bgzf(data, block_size=256))
    good = list(BG.bgzf_blocks(bytes(b)))
    b[good[0][0] + 20] ^= 0xFF                # inside block 0 payload
    assert list(BG.bgzf_blocks(bytes(b))) == good
    with pytest.raises((ValueError, zlib.error)):
        BG.decompress_block(bytes(b), *good[0])


def test_rejects_plain_gz_and_truncation():
    data = b"hello world" * 50
    with pytest.raises(ValueError, match="unsplittable"):
        list(BG.bgzf_blocks(gzip.compress(data)))
    b = BG.encode_bgzf(data, block_size=64)
    with pytest.raises(ValueError, match="overruns|truncated"):
        list(BG.bgzf_blocks(b[:-40]))
    with pytest.raises(ValueError, match="not a gzip member"):
        list(BG.bgzf_blocks(b"PK\x03\x04" + b[4:]))


def test_isize_check():
    data = b"abcdef" * 10
    b = bytearray(BG.encode_bgzf(data, block_size=60))
    (c, s), _ = list(BG.bgzf_blocks(bytes(b)))
    b[c + s - 4:c + s] = (99).to_bytes(4, "little")   # wrong ISIZE
    with pytest.raises(ValueError, match="ISIZE"):
        BG.decompress_block(bytes(b), c, s)


def test_encode_guards():
    with pytest.raises(ValueError, match="block_size"):
        BG.encode_bgzf(b"x", block_size=0)
    with pytest.raises(ValueError, match="block_size"):
        BG.encode_bgzf(b"x", block_size=1 << 20)


def test_read_bgzf_df(spark):
    data = b"0123456789" * 5                   # 50 bytes
    payload = BG.encode_bgzf(data, block_size=16)
    df = spark.createDataFrame([(4, bytearray(payload))],
                               "doc_id long, payload binary")
    rows = sorted((r["block_idx"], r["n_raw"], bytes(r["chunk"]))
                  for r in BG.read_bgzf(df).collect())
    assert [r[0] for r in rows] == [0, 1, 2, 3]
    assert b"".join(r[2] for r in rows) == data
    assert [r[1] for r in rows] == [16, 16, 16, 2]
