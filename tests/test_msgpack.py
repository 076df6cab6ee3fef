"""MessagePack source: spec known answers, round trips, stream
decode, DataFrame reader, directory guard."""

import struct

import pytest

from nowdb_spark.sources import msgpack as MP


def test_spec_known_answers():
    assert MP.encode(5) == b"\x05"
    assert MP.encode(-3) == b"\xfd"
    assert MP.encode(200) == b"\xcc\xc8"
    assert MP.encode(-200) == b"\xd1\xff\x38"
    assert MP.encode("abc") == b"\xa3abc"
    assert MP.encode(None) == b"\xc0"
    assert MP.encode(True) == b"\xc3"
    assert MP.encode([1, 2]) == b"\x92\x01\x02"
    assert MP.encode({"a": 1}) == b"\x81\xa1a\x01"
    assert MP.encode(1.5) == b"\xcb" + struct.pack(">d", 1.5)


@pytest.mark.parametrize("v", [
    0, 127, 128, 65535, 65536, -32, -33, -129, 1 << 40, -(1 << 40),
    "x" * 40, b"\x00\x01" * 200, [1, "a", None, [True, 2.5]],
    {"k": {"n": -5}, "l": [1, 2, 3]}, 3.25, False, "",
    list(range(20)),
])
def test_roundtrip(v):
    b = MP.encode(v)
    got, end = MP.decode_one(b)
    assert got == v and end == len(b)


def test_stream_and_guards():
    s = b"".join(MP.encode({"id": i}) for i in range(4))
    assert [r["id"] for r in MP.decode_stream(s)] == [0, 1, 2, 3]
    with pytest.raises(ValueError, match="truncated"):
        MP.decode_one(MP.encode("hello")[:-2])
    with pytest.raises(ValueError, match="0xc1"):
        MP.decode_one(b"\xc1")
    # float32 decodes even though the encoder always emits float64
    v, _ = MP.decode_one(b"\xca" + struct.pack(">f", 2.5))
    assert v == 2.5


def test_read_msgpack_records_df(spark):
    shard = (MP.encode({"id": 100, "t": "r0", "z": None})
             + MP.encode({"id": -7, "s": 0.25}))
    df = spark.createDataFrame([(3, bytearray(shard))],
                               "doc_id long, payload binary")
    rows = {(r["rec_idx"], r["key"]): (r["val_str"], r["val_num"])
            for r in MP.read_msgpack_records(df).collect()}
    assert rows[(0, "id")] == (None, 100.0)
    assert rows[(0, "t")] == ("r0", None)
    assert rows[(0, "z")] == (None, None)
    assert rows[(1, "id")] == (None, -7.0)
    assert rows[(1, "s")] == (None, 0.25)


def test_read_msgpack_dir_guard(spark, tmp_path):
    p = tmp_path / "mp"
    p.mkdir()
    (p / "a.msgpack").write_bytes(MP.encode({"id": 9}))
    out = MP.read_msgpack_dir(spark, str(p)).collect()
    assert out[0]["val_num"] == 9.0
    with pytest.raises(ValueError, match="exceed max_file_bytes"):
        MP.read_msgpack_dir(spark, str(p), max_file_bytes=1)
