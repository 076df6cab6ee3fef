"""TFRecord shard ingestion — the TensorFlow training-data container.

Both layers parsed from the published public formats, no TF
dependency:

- **Framing** (TFRecord): per record ``u64 LE length, u32 masked
  CRC-32C of the length bytes, data, u32 masked CRC-32C of data``.
  CRC-32C is the Castagnoli polynomial (reflected 0x82F63B78, init
  and xorout 0xFFFFFFFF); the mask is TensorFlow's
  ``((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod 2³²)``. Every
  record's both CRCs are verified; corruption raises with the record
  index.
- **Payload** (``tf.train.Example``): protocol-buffers wire format —
  varints (LEB128), length-delimited submessages, packed and
  unpacked repeated scalars — interpreted against Example's fixed
  schema: ``Example.features(1) → Features.feature(1) = map<string,
  Feature>`` (a map entry is a submessage with key=1, value=2),
  ``Feature.bytes_list(1)/float_list(2)/int64_list(3)``, lists with
  ``value(1)`` repeated (floats fixed32, int64 varint; both packed
  forms handled). Unknown fields are skipped by wire type, as proto
  semantics require.

Scale shape: one shard file per input row, decoded independently in
a narrow mapInPandas kernel; no shuffle. Directory loads go through
the shared binaryFile size guard. Reference parity: the reference
engine has no container formats — training-pipeline extension
surface (SURVEY.md §2).
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nowdb_spark.sources.binlimits import (
    MAX_BINARYFILE_BYTES, check_file_sizes)

# ------------------------------------------------------------------
# CRC-32C (Castagnoli), table-driven, reflected
# ------------------------------------------------------------------
_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = (c >> 8) ^ _CRC32C_TABLE[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------------------
# framing
# ------------------------------------------------------------------
def read_tfrecord_frames(b: bytes):
    """Yield record payloads; verifies BOTH masked CRCs per record."""
    i, idx = 0, 0
    n = len(b)
    while i < n:
        if i + 12 > n:
            raise ValueError(f"record {idx}: truncated length header")
        lb = b[i:i + 8]
        (length,) = struct.unpack("<Q", lb)
        (lcrc,) = struct.unpack_from("<I", b, i + 8)
        if masked_crc(lb) != lcrc:
            raise ValueError(f"record {idx}: length CRC mismatch")
        i += 12
        if i + length + 4 > n:
            raise ValueError(f"record {idx}: truncated data")
        data = b[i:i + length]
        (dcrc,) = struct.unpack_from("<I", b, i + length)
        if masked_crc(data) != dcrc:
            raise ValueError(f"record {idx}: data CRC mismatch")
        yield data
        i += length + 4
        idx += 1


def write_tfrecord_frames(records) -> bytes:
    out = bytearray()
    for data in records:
        lb = struct.pack("<Q", len(data))
        out += lb
        out += struct.pack("<I", masked_crc(lb))
        out += data
        out += struct.pack("<I", masked_crc(bytes(data)))
    return bytes(out)


# ------------------------------------------------------------------
# proto wire format
# ------------------------------------------------------------------
def _read_varint(b: bytes, i: int):
    x = 0
    shift = 0
    while True:
        if i >= len(b):
            raise ValueError("truncated varint")
        c = b[i]
        i += 1
        x |= (c & 0x7F) << shift
        if not c & 0x80:
            return x, i
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _write_varint(x: int) -> bytes:
    x &= 0xFFFFFFFFFFFFFFFF        # int64 two's complement on wire
    out = bytearray()
    while True:
        c = x & 0x7F
        x >>= 7
        if x:
            out.append(c | 0x80)
        else:
            out.append(c)
            return bytes(out)


def _fields(b: bytes):
    """Yield (field_num, wire_type, value) over one message; value is
    int for varint/fixed, bytes for length-delimited. Unknown wire
    types raise; callers skip unknown FIELDS freely."""
    i = 0
    while i < len(b):
        tag, i = _read_varint(b, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _read_varint(b, i)
        elif wt == 1:
            v = struct.unpack_from("<Q", b, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(b, i)
            if i + ln > len(b):
                raise ValueError("truncated length-delimited field")
            v = b[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<I", b, i)[0]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, v


def _signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def _parse_feature(b: bytes):
    """Feature → ('bytes'|'float'|'int64', list)."""
    for fnum, wt, v in _fields(b):
        if fnum == 1 and wt == 2:            # BytesList
            return "bytes", [bv for fn, w, bv in _fields(v)
                             if fn == 1 and w == 2]
        if fnum == 2 and wt == 2:            # FloatList
            vals = []
            for fn, w, fv in _fields(v):
                if fn != 1:
                    continue
                if w == 2:                   # packed
                    vals.extend(struct.unpack(f"<{len(fv) // 4}f", fv))
                elif w == 5:                 # unpacked fixed32
                    vals.append(struct.unpack("<f",
                                              struct.pack("<I", fv))[0])
            return "float", vals
        if fnum == 3 and wt == 2:            # Int64List
            vals = []
            for fn, w, iv in _fields(v):
                if fn != 1:
                    continue
                if w == 2:                   # packed varints
                    j = 0
                    while j < len(iv):
                        x, j = _read_varint(iv, j)
                        vals.append(_signed64(x))
                elif w == 0:
                    vals.append(_signed64(iv))
            return "int64", vals
    return None, []


def parse_example(b: bytes) -> dict:
    """tf.train.Example bytes → {name: (kind, values)}."""
    out = {}
    for fnum, wt, v in _fields(b):
        if fnum != 1 or wt != 2:             # Example.features
            continue
        for fn, w, entry in _fields(v):
            if fn != 1 or w != 2:            # Features.feature map
                continue
            key, feat = None, None
            for en, ew, ev in _fields(entry):
                if en == 1 and ew == 2:
                    key = ev.decode("utf-8")
                elif en == 2 and ew == 2:
                    feat = ev
            if key is not None and feat is not None:
                out[key] = _parse_feature(feat)
    return out


def _ld(fnum: int, payload: bytes) -> bytes:
    return _write_varint((fnum << 3) | 2) + _write_varint(
        len(payload)) + payload


def encode_example(features: dict, packed: bool = True) -> bytes:
    """{name: (kind, values)} → tf.train.Example bytes. ``packed``
    toggles the repeated-scalar encoding so the parser's both paths
    stay exercised."""
    entries = b""
    for key, (kind, values) in features.items():
        if kind == "bytes":
            body = b"".join(_ld(1, v) for v in values)
            feat = _ld(1, body)
        elif kind == "float":
            if packed:
                body = _ld(1, struct.pack(f"<{len(values)}f", *values))
            else:
                body = b"".join(
                    _write_varint((1 << 3) | 5) + struct.pack("<f", v)
                    for v in values)
            feat = _ld(2, body)
        elif kind == "int64":
            if packed:
                body = _ld(1, b"".join(_write_varint(v)
                                       for v in values))
            else:
                body = b"".join(_write_varint(1 << 3)
                                + _write_varint(v) for v in values)
            feat = _ld(3, body)
        else:
            raise ValueError(f"unknown feature kind {kind!r}")
        entries += _ld(1, _ld(1, key.encode("utf-8")) + _ld(2, feat))
    return _ld(1, entries)


# ------------------------------------------------------------------
# DataFrame reader
# ------------------------------------------------------------------
def read_tfrecords(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload",
                   id_type: str = "long") -> DataFrame:
    """(id, shard bytes) rows → one row per (record, feature):
    (id, rec_idx, name, kind, bytes_vals, float_vals, int64_vals) —
    the non-matching value columns are NULL. Narrow mapInPandas."""
    conv = str if id_type == "string" else int

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        cols = [id_col, "rec_idx", "name", "kind",
                "bytes_vals", "float_vals", "int64_vals"]
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                for ri, rec in enumerate(
                        read_tfrecord_frames(bytes(payload))):
                    for name, (kind, vals) in sorted(
                            parse_example(rec).items()):
                        out.append((
                            conv(did), ri, name, kind,
                            [bytearray(v) for v in vals]
                            if kind == "bytes" else None,
                            [float(v) for v in vals]
                            if kind == "float" else None,
                            [int(v) for v in vals]
                            if kind == "int64" else None))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} {id_type}, rec_idx long, name string, "
                "kind string, bytes_vals array<binary>, "
                "float_vals array<double>, int64_vals array<long>")


def read_tfrecord_dir(spark: SparkSession, path: str,
                      max_file_bytes: int = MAX_BINARYFILE_BYTES
                      ) -> DataFrame:
    """Whole-file loader with the shared size guard (paths key the
    shards)."""
    check_file_sizes(spark, path, max_file_bytes, "TFRecord shard",
                     "Re-shard at record boundaries and retry.")
    files = (spark.read.format("binaryFile").load(path)
             .select(F.col("path").alias("shard"),
                     F.col("content").alias("payload")))
    return read_tfrecords(files, id_col="shard", id_type="string")
