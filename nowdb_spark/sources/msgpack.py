"""MessagePack record-shard ingestion.

Implements the published MessagePack format specification (the
single-page spec at msgpack.org/spec): positive/negative fixint,
fixstr/str8/16/32, bin8/16/32, fixarray/array16/32, fixmap/map16/32,
nil/bool, uint8-64, int8-64, float32/64. A shard is the streaming
convention: top-level objects concatenated back-to-back (one map per
record). Decoder is bounds-checked and raises on truncation or
reserved type bytes; encoder is the canonical-shortest-form twin the
decoder round-trips against.

Scale shape: one shard per input row, decoded in a narrow
mapInPandas kernel — no shuffle; directory loads behind the shared
binaryFile size guard. Reference parity: the reference engine has no
container formats (training-pipeline extension surface).
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nowdb_spark.sources.binlimits import (
    MAX_BINARYFILE_BYTES, check_file_sizes)


def _need(b: bytes, i: int, n: int):
    if i + n > len(b):
        raise ValueError(f"truncated msgpack at byte {i}")


def decode_one(b: bytes, i: int = 0):
    """Decode one object at offset ``i`` → (value, next_offset)."""
    _need(b, i, 1)
    t = b[i]
    i += 1
    if t <= 0x7F:                       # positive fixint
        return t, i
    if t >= 0xE0:                       # negative fixint
        return t - 256, i
    if 0x80 <= t <= 0x8F:               # fixmap
        return _map(b, i, t & 0x0F)
    if 0x90 <= t <= 0x9F:               # fixarray
        return _arr(b, i, t & 0x0F)
    if 0xA0 <= t <= 0xBF:               # fixstr
        return _str(b, i, t & 0x1F)
    if t == 0xC0:
        return None, i
    if t == 0xC2:
        return False, i
    if t == 0xC3:
        return True, i
    if t in (0xC4, 0xC5, 0xC6):         # bin8/16/32
        n, i = _len(b, i, t - 0xC4)
        _need(b, i, n)
        return bytes(b[i:i + n]), i + n
    if t == 0xCA:
        _need(b, i, 4)
        return struct.unpack_from(">f", b, i)[0], i + 4
    if t == 0xCB:
        _need(b, i, 8)
        return struct.unpack_from(">d", b, i)[0], i + 8
    if t in (0xCC, 0xCD, 0xCE, 0xCF):   # uint8/16/32/64
        n = 1 << (t - 0xCC)
        _need(b, i, n)
        return int.from_bytes(b[i:i + n], "big"), i + n
    if t in (0xD0, 0xD1, 0xD2, 0xD3):   # int8/16/32/64
        n = 1 << (t - 0xD0)
        _need(b, i, n)
        return int.from_bytes(b[i:i + n], "big", signed=True), i + n
    if t in (0xD9, 0xDA, 0xDB):         # str8/16/32
        n, i = _len(b, i, t - 0xD9)
        return _str(b, i, n)
    if t == 0xDC or t == 0xDD:          # array16/32
        n, i = _len(b, i, 1 if t == 0xDC else 2)
        return _arr(b, i, n)
    if t == 0xDE or t == 0xDF:          # map16/32
        n, i = _len(b, i, 1 if t == 0xDE else 2)
        return _map(b, i, n)
    raise ValueError(f"unsupported msgpack type byte 0x{t:02x}")


def _len(b: bytes, i: int, p: int):
    n = 1 << p
    _need(b, i, n)
    return int.from_bytes(b[i:i + n], "big"), i + n


def _str(b: bytes, i: int, n: int):
    _need(b, i, n)
    return b[i:i + n].decode("utf-8"), i + n


def _arr(b: bytes, i: int, n: int):
    out = []
    for _ in range(n):
        v, i = decode_one(b, i)
        out.append(v)
    return out, i


def _map(b: bytes, i: int, n: int):
    out = {}
    for _ in range(n):
        k, i = decode_one(b, i)
        v, i = decode_one(b, i)
        out[k] = v
    return out, i


def decode_stream(b: bytes):
    """Yield top-level objects from a concatenated stream."""
    i = 0
    while i < len(b):
        v, i = decode_one(b, i)
        yield v


def encode(v) -> bytes:
    """Canonical shortest-form encoder (the round-trip twin)."""
    if v is None:
        return b"\xc0"
    if v is True:
        return b"\xc3"
    if v is False:
        return b"\xc2"
    if isinstance(v, int):
        if 0 <= v <= 0x7F:
            return bytes([v])
        if -32 <= v < 0:
            return bytes([v & 0xFF])
        if v >= 0:
            for code, n in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if v < (1 << (8 * n)):
                    return bytes([code]) + v.to_bytes(n, "big")
            raise ValueError("uint too large")
        for code, n in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
            if -(1 << (8 * n - 1)) <= v:
                return bytes([code]) + v.to_bytes(n, "big",
                                                  signed=True)
        raise ValueError("int too small")
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, str):
        e = v.encode("utf-8")
        if len(e) <= 31:
            return bytes([0xA0 | len(e)]) + e
        for code, n in ((0xD9, 1), (0xDA, 2), (0xDB, 4)):
            if len(e) < (1 << (8 * n)):
                return bytes([code]) + len(e).to_bytes(n, "big") + e
    if isinstance(v, (bytes, bytearray)):
        for code, n in ((0xC4, 1), (0xC5, 2), (0xC6, 4)):
            if len(v) < (1 << (8 * n)):
                return (bytes([code]) + len(v).to_bytes(n, "big")
                        + bytes(v))
    if isinstance(v, (list, tuple)):
        if len(v) <= 15:
            head = bytes([0x90 | len(v)])
        elif len(v) < (1 << 16):
            head = b"\xdc" + len(v).to_bytes(2, "big")
        else:
            head = b"\xdd" + len(v).to_bytes(4, "big")
        return head + b"".join(encode(x) for x in v)
    if isinstance(v, dict):
        if len(v) <= 15:
            head = bytes([0x80 | len(v)])
        elif len(v) < (1 << 16):
            head = b"\xde" + len(v).to_bytes(2, "big")
        else:
            head = b"\xdf" + len(v).to_bytes(4, "big")
        return head + b"".join(encode(k) + encode(x)
                               for k, x in v.items())
    raise ValueError(f"cannot msgpack-encode {type(v).__name__}")


def read_msgpack_records(df: DataFrame, id_col: str = "doc_id",
                         payload_col: str = "payload",
                         id_type: str = "long") -> DataFrame:
    """(id, shard bytes) rows → one row per top-level map record:
    (id, rec_idx, key, val_str, val_num) — scalar map values typed
    into a string or double column (ints exact up to 2^53; the
    fixture contract keeps them small). Narrow mapInPandas."""
    conv = str if id_type == "string" else int

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        cols = [id_col, "rec_idx", "key", "val_str", "val_num"]
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                for ri, rec in enumerate(
                        decode_stream(bytes(payload))):
                    if not isinstance(rec, dict):
                        raise ValueError(
                            f"record {ri} is not a map")
                    for k in sorted(rec):
                        v = rec[k]
                        out.append((
                            conv(did), ri, str(k),
                            v if isinstance(v, str) else None,
                            float(v) if isinstance(v, (int, float))
                            and not isinstance(v, bool) else None))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} {id_type}, rec_idx long, key string, "
                "val_str string, val_num double")


def read_msgpack_dir(spark: SparkSession, path: str,
                     max_file_bytes: int = MAX_BINARYFILE_BYTES
                     ) -> DataFrame:
    check_file_sizes(spark, path, max_file_bytes, "msgpack shard",
                     "Re-shard at record boundaries and retry.")
    files = (spark.read.format("binaryFile").load(path)
             .select(F.col("path").alias("shard"),
                     F.col("content").alias("payload")))
    return read_msgpack_records(files, id_col="shard",
                                id_type="string")
