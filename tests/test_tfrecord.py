"""TFRecord source: CRC-32C known answers, framing, proto wire parse,
DataFrame reader, directory guard."""

import struct

import pytest

from nowdb_spark.sources import tfrecord as TF


def test_crc32c_known_answers():
    # published CRC-32C (Castagnoli) test vectors
    assert TF.crc32c(b"123456789") == 0xE3069283
    assert TF.crc32c(b"") == 0x00000000
    assert TF.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert TF.crc32c(b"\xff" * 32) == 0x62A8AB43


def test_framing_roundtrip_and_crc_detection():
    recs = [b"hello", b"", b"x" * 300]
    framed = TF.write_tfrecord_frames(recs)
    assert list(TF.read_tfrecord_frames(framed)) == recs
    data_corrupt = bytearray(framed)
    data_corrupt[14] ^= 1                      # inside record 0 data
    with pytest.raises(ValueError, match="CRC"):
        list(TF.read_tfrecord_frames(bytes(data_corrupt)))
    len_corrupt = bytearray(framed)
    len_corrupt[2] ^= 1                        # inside the u64 length
    with pytest.raises(ValueError, match="length CRC"):
        list(TF.read_tfrecord_frames(bytes(len_corrupt)))
    with pytest.raises(ValueError, match="truncated"):
        list(TF.read_tfrecord_frames(framed[:-2]))


@pytest.mark.parametrize("packed", [True, False])
def test_example_roundtrip(packed):
    feats = {"doc": ("bytes", [b"abc", b"d"]),
             "ids": ("int64", [5, -7, 1 << 40]),
             "score": ("float", [1.5, -2.25])}
    got = TF.parse_example(TF.encode_example(feats, packed=packed))
    assert got["doc"] == ("bytes", [b"abc", b"d"])
    assert got["ids"] == ("int64", [5, -7, 1 << 40])
    assert got["score"] == ("float", [1.5, -2.25])


def test_unknown_fields_skipped():
    # prepend an unknown varint field (tag 99) and an unknown
    # fixed64 (tag 98) — proto semantics: skip by wire type
    body = TF.encode_example({"ids": ("int64", [3])})
    extra = (TF._write_varint((99 << 3) | 0) + TF._write_varint(7)
             + TF._write_varint((98 << 3) | 1)
             + struct.pack("<Q", 123))
    got = TF.parse_example(extra + body)
    assert got["ids"] == ("int64", [3])


def test_varint_guards():
    with pytest.raises(ValueError, match="truncated varint"):
        TF._read_varint(b"\x80\x80", 0)
    with pytest.raises(ValueError, match="varint too long"):
        TF._read_varint(b"\x80" * 11 + b"\x01", 0)


def test_read_tfrecords_df(spark):
    shard = TF.write_tfrecord_frames([
        TF.encode_example({"doc": ("bytes", [b"r0"]),
                           "ids": ("int64", [1, -2])}),
        TF.encode_example({"score": ("float", [0.5])}, packed=False),
    ])
    df = spark.createDataFrame([(7, bytearray(shard))],
                               "doc_id long, payload binary")
    rows = {(r["rec_idx"], r["name"]): r
            for r in TF.read_tfrecords(df).collect()}
    assert bytes(rows[(0, "doc")]["bytes_vals"][0]) == b"r0"
    assert rows[(0, "ids")]["int64_vals"] == [1, -2]
    assert rows[(1, "score")]["float_vals"] == [0.5]
    assert rows[(0, "ids")]["kind"] == "int64"


def test_read_tfrecord_dir_guard(spark, tmp_path):
    p = tmp_path / "tfr"
    p.mkdir()
    (p / "a.tfrecord").write_bytes(TF.write_tfrecord_frames(
        [TF.encode_example({"ids": ("int64", [9])})]))
    out = TF.read_tfrecord_dir(spark, str(p)).collect()
    assert out[0]["int64_vals"] == [9]
    with pytest.raises(ValueError, match="exceed max_file_bytes"):
        TF.read_tfrecord_dir(spark, str(p), max_file_bytes=3)
