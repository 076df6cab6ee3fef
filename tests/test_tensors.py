"""Tensor-shard sources: NPY (spec parse vs np.save), safetensors
(round trip + validation), Arrow IPC shards, directory loader guard."""

import io
import struct

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from nowdb_spark.sources import tensors as TS


# ------------------------------------------------------------------
# NPY byte-level
# ------------------------------------------------------------------
def test_npy_parse_matches_numpy_writer():
    # our parser must read numpy's OWN writer output (v1 header)
    for arr in [np.arange(12, dtype=np.float32).reshape(3, 4),
                np.arange(6, dtype=np.int64).reshape(2, 3),
                np.array([], dtype=np.float64),
                np.arange(24, dtype=np.int16).reshape(2, 3, 4)]:
        buf = io.BytesIO()
        np.save(buf, arr)
        descr, fortran, shape, flat = TS.parse_npy(buf.getvalue())
        assert shape == arr.shape
        assert not fortran
        np.testing.assert_array_equal(flat, arr.ravel())


def test_npy_parse_fortran_from_numpy():
    arr = np.asfortranarray(np.arange(12, dtype=np.float64).reshape(3, 4))
    buf = io.BytesIO()
    np.save(buf, arr)
    descr, fortran, shape, flat = TS.parse_npy(buf.getvalue())
    assert fortran and shape == (3, 4)
    # flat must come back in C order despite Fortran physical layout
    np.testing.assert_array_equal(flat, np.arange(12, dtype=np.float64))


@pytest.mark.parametrize("version", [1, 2, 3])
@pytest.mark.parametrize("fortran", [False, True])
def test_npy_roundtrip_versions(version, fortran):
    arr = (np.arange(20, dtype=np.int32) * 3 - 7).reshape(4, 5)
    b = TS.encode_npy(arr, version=version, fortran=fortran)
    assert b[6] == version
    descr, f, shape, flat = TS.parse_npy(b)
    assert f is fortran or f == fortran
    assert shape == (4, 5)
    np.testing.assert_array_equal(flat, arr.ravel())
    # numpy itself must also read our v1 writer output
    if version == 1:
        np.testing.assert_array_equal(np.load(io.BytesIO(b)), arr)


def test_npy_header_alignment():
    b = TS.encode_npy(np.zeros(3, dtype=np.float32))
    # data section starts 64-aligned (modern numpy convention)
    (hlen,) = struct.unpack_from("<H", b, 8)
    assert (10 + hlen) % 64 == 0


def test_npy_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        TS.parse_npy(b"PK\x03\x04 not npy")
    good = TS.encode_npy(np.arange(4, dtype=np.int64))
    with pytest.raises(ValueError, match="truncated"):
        TS.parse_npy(good[:-8])
    with pytest.raises(ValueError, match="version"):
        TS.parse_npy(b"\x93NUMPY\x07\x00" + good[8:])


# ------------------------------------------------------------------
# safetensors byte-level
# ------------------------------------------------------------------
def test_safetensors_roundtrip():
    tensors = {
        "emb": np.arange(12, dtype=np.float32).reshape(3, 4) / 2.0,
        "ids": np.array([5, 10, 1 << 40], dtype=np.int64),
        "mask": np.array([True, False, True]),
        "bytes": np.arange(7, dtype=np.uint8),
    }
    b = TS.encode_safetensors(tensors, metadata={"doc": "42"})
    meta, parsed = TS.parse_safetensors(b)
    assert meta == {"doc": "42"}
    got = {name: (tag, shape, flat) for name, tag, shape, flat in parsed}
    assert got["emb"][0] == "F32" and got["emb"][1] == (3, 4)
    np.testing.assert_array_equal(got["emb"][2],
                                  tensors["emb"].ravel())
    assert got["ids"][0] == "I64"
    np.testing.assert_array_equal(got["ids"][2], tensors["ids"])
    assert got["mask"][0] == "BOOL" and got["bytes"][0] == "U8"


def test_safetensors_known_layout():
    # hand-built bytes straight from the published format description
    hdr = (b'{"t":{"dtype":"I32","shape":[2],"data_offsets":[0,8]}}')
    payload = struct.pack("<Q", len(hdr)) + hdr + struct.pack("<ii", 7, -3)
    meta, [(name, tag, shape, flat)] = TS.parse_safetensors(payload)
    assert (name, tag, shape) == ("t", "I32", (2,))
    np.testing.assert_array_equal(flat, [7, -3])


def test_safetensors_bf16_widening():
    # bf16(1.5) = 0x3FC0 (top half of f32 1.5)
    hdr = b'{"x":{"dtype":"BF16","shape":[1],"data_offsets":[0,2]}}'
    payload = struct.pack("<Q", len(hdr)) + hdr + struct.pack("<H", 0x3FC0)
    _, [(_, tag, _, flat)] = TS.parse_safetensors(payload)
    assert tag == "BF16" and flat[0] == np.float32(1.5)


def test_safetensors_validation():
    hdr = b'{"t":{"dtype":"I32","shape":[2],"data_offsets":[0,99]}}'
    bad = struct.pack("<Q", len(hdr)) + hdr + b"\0" * 8
    with pytest.raises(ValueError, match="outside data section"):
        TS.parse_safetensors(bad)
    hdr = b'{"t":{"dtype":"I32","shape":[2],"data_offsets":[0,4]}}'
    bad = struct.pack("<Q", len(hdr)) + hdr + b"\0" * 4
    with pytest.raises(ValueError, match="extent"):
        TS.parse_safetensors(bad)
    hdr = (b'{"a":{"dtype":"U8","shape":[4],"data_offsets":[0,4]},'
           b'"b":{"dtype":"U8","shape":[4],"data_offsets":[2,6]}}')
    bad = struct.pack("<Q", len(hdr)) + hdr + b"\0" * 6
    with pytest.raises(ValueError, match="overlap"):
        TS.parse_safetensors(bad)
    with pytest.raises(ValueError, match="dtype"):
        hdr = b'{"t":{"dtype":"C64","shape":[1],"data_offsets":[0,8]}}'
        TS.parse_safetensors(struct.pack("<Q", len(hdr)) + hdr + b"\0" * 8)


# ------------------------------------------------------------------
# DataFrame-level readers
# ------------------------------------------------------------------
def _payload_df(spark, payloads):
    rows = [(i, bytearray(p)) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_read_npy_shards(spark):
    arrs = [np.arange(6, dtype=np.float32).reshape(2, 3),
            np.asfortranarray(np.arange(4, dtype=np.int64).reshape(2, 2))]
    df = _payload_df(spark, [TS.encode_npy(arrs[0]),
                             TS.encode_npy(arrs[1], version=2,
                                           fortran=True)])
    out = {r["doc_id"]: r for r in TS.read_npy_shards(df).collect()}
    assert out[0]["shape"] == [2, 3] and not out[0]["fortran_order"]
    assert out[0]["values"] == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]
    assert out[1]["fortran_order"]
    assert out[1]["values"] == [0.0, 1.0, 2.0, 3.0]  # canonical C order


def test_read_safetensors_df(spark):
    b = TS.encode_safetensors(
        {"emb": np.array([1.5, -2.0], dtype=np.float32)},
        metadata={"k": "v"})
    out = TS.read_safetensors(_payload_df(spark, [b])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["name"], r["dtype"], r["shape"]) == ("emb", "F32", [2])
    assert r["values"] == [1.5, -2.0] and r["meta"] == {"k": "v"}


def _arrow_file_bytes(ids, scores, batch_rows=2):
    tbl = pa.table({"sample_id": pa.array(ids, pa.int64()),
                    "score": pa.array(scores, pa.float64())})
    sink = pa.BufferOutputStream()
    with pa.ipc.new_file(sink, tbl.schema) as w:
        for b in tbl.to_batches(max_chunksize=batch_rows):
            w.write_batch(b)
    return sink.getvalue().to_pybytes()


def test_read_arrow_shards(spark):
    b0 = _arrow_file_bytes([1, 2, 3], [0.5, 1.5, 2.5])
    b1 = _arrow_file_bytes([9], [9.0])
    out = TS.read_arrow_shards(
        _payload_df(spark, [b0, b1]),
        "doc_id long, sample_id long, score double")
    rows = sorted((r["doc_id"], r["sample_id"], r["score"])
                  for r in out.collect())
    assert rows == [(0, 1, 0.5), (0, 2, 1.5), (0, 3, 2.5), (1, 9, 9.0)]


def test_read_tensor_dir_guard_and_decode(spark, tmp_path):
    p = tmp_path / "shards"
    p.mkdir()
    (p / "a.npy").write_bytes(TS.encode_npy(np.arange(3, dtype=np.int32)))
    out = TS.read_tensor_dir(spark, str(p), "npy").collect()
    assert out[0]["values"] == [0.0, 1.0, 2.0]
    with pytest.raises(ValueError, match="exceed max_file_bytes"):
        TS.read_tensor_dir(spark, str(p), "npy", max_file_bytes=10)
    with pytest.raises(ValueError, match="out_schema"):
        TS.read_tensor_dir(spark, str(p), "arrow")
    with pytest.raises(ValueError, match="unknown tensor shard kind"):
        TS.read_tensor_dir(spark, str(p), "hdf5")
