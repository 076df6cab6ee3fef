"""Tensor-shard ingestion: NPY, safetensors, Arrow IPC.

Training pipelines ship embeddings, token ids and activations as
tensor files; the engine reads all three de-facto formats
distributed (one file per row in, typed rows out, no driver-side
loop):

- **NPY** (`numpy.lib.format`, the NEP-1 on-disk layout): magic
  ``\\x93NUMPY``, version byte pair (1,0)/(2,0)/(3,0), little-endian
  header length (u16 for v1, u32 for v2/3), a Python-literal dict
  header ``{'descr','fortran_order','shape'}`` space-padded to the
  alignment boundary, then the raw array bytes. Parsed HERE from the
  published spec (not ``np.load``) so the reader is testable against
  numpy's own writer.
- **safetensors** (the huggingface tensor container): 8-byte LE u64
  header size, a JSON header mapping tensor name →
  ``{dtype, shape, data_offsets}`` (plus optional ``__metadata__``
  string map), then the raw little-endian buffers; offsets are
  relative to the end of the header. Parsed here per the published
  format description, with bounds/overlap validation.
- **Arrow IPC file** (= Feather v2): read via ``pyarrow.ipc`` — the
  canonical public implementation — batch-at-a-time.

All readers are narrow mapInPandas kernels: each input row (one
shard file) decodes independently inside its partition; nothing
shuffles. Whole-file loads from a directory go through the shared
binaryFile size guard (sources/binlimits.py).

Reference parity note: the reference engine (toschoo/nowdb) has no
tensor-file handling; this module belongs to the training-pipeline
extension surface (SURVEY.md §2 pipeline family).
"""

from __future__ import annotations

import ast
import json
import struct
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from nowdb_spark.sources.binlimits import (
    MAX_BINARYFILE_BYTES, check_file_sizes)

_NPY_MAGIC = b"\x93NUMPY"

# safetensors dtype tag → (numpy dtype, is_bf16). BF16 has no numpy
# dtype: it is the top half of an f32, so the decoder widens u2<<16
# and reinterprets.
_ST_DTYPES = {
    "F64": ("<f8", False), "F32": ("<f4", False), "F16": ("<f2", False),
    "BF16": ("<u2", True),
    "I64": ("<i8", False), "I32": ("<i4", False), "I16": ("<i2", False),
    "I8": ("i1", False), "U8": ("u1", False), "BOOL": ("|b1", False),
    "U16": ("<u2", False), "U32": ("<u4", False), "U64": ("<u8", False),
}
_ST_TAG_OF = {np.dtype(v[0]): k for k, v in _ST_DTYPES.items()
              if not v[1]}


# ------------------------------------------------------------------
# NPY
# ------------------------------------------------------------------
def parse_npy(b: bytes):
    """Parse one .npy payload per the numpy format spec.

    Returns ``(descr, fortran_order, shape, flat)`` where ``flat`` is
    the element sequence in C (row-major) order regardless of the
    file's physical order — Fortran files are transposed on read, so
    downstream checksums see one canonical order.
    """
    if len(b) < 10 or b[:6] != _NPY_MAGIC:
        raise ValueError("not an NPY file (bad magic)")
    major, minor = b[6], b[7]
    if major == 1:
        (hlen,) = struct.unpack_from("<H", b, 8)
        hstart = 10
    elif major in (2, 3):
        (hlen,) = struct.unpack_from("<I", b, 8)
        hstart = 12
    else:
        raise ValueError(f"unsupported NPY version {major}.{minor}")
    if hstart + hlen > len(b):
        raise ValueError("NPY header overruns file")
    header = b[hstart:hstart + hlen].decode("utf-8")
    try:
        meta = ast.literal_eval(header.strip())
    except (ValueError, SyntaxError) as exc:
        raise ValueError(f"bad NPY header literal: {exc}") from exc
    descr = meta["descr"]
    fortran = bool(meta["fortran_order"])
    shape = tuple(int(d) for d in meta["shape"])
    dt = np.dtype(descr)
    if dt.hasobject:
        raise ValueError("object-dtype NPY not supported")
    count = 1
    for d in shape:
        count *= d
    need = hstart + hlen + count * dt.itemsize
    if need > len(b):
        raise ValueError(f"NPY data truncated: need {need}, "
                         f"have {len(b)}")
    arr = np.frombuffer(b, dtype=dt, count=count, offset=hstart + hlen)
    arr = arr.reshape(shape, order="F" if fortran else "C")
    return descr, fortran, shape, np.ascontiguousarray(arr).ravel()


def encode_npy(arr: "np.ndarray", version: int = 1,
               fortran: bool = False) -> bytes:
    """Spec-faithful .npy writer (v1/v2/v3 headers, C or Fortran
    body) — the independent twin `parse_npy` round-trips against
    (tests also cross-check the parser against ``np.save`` output)."""
    arr = np.asarray(arr)
    descr = arr.dtype.str  # numpy normalizes: '<f4', '|i1', ...
    meta = ("{'descr': %r, 'fortran_order': %s, 'shape': %s, }"
            % (descr, fortran, repr(tuple(arr.shape))))
    body = meta.encode("utf-8")
    prefix = 10 if version == 1 else 12
    # pad with spaces + final \n so prefix+header is 64-aligned
    total = prefix + len(body) + 1
    pad = (64 - total % 64) % 64
    header = body + b" " * pad + b"\n"
    out = bytearray(_NPY_MAGIC)
    out += bytes([version, 0])
    if version == 1:
        if len(header) > 0xFFFF:
            raise ValueError("header too large for NPY v1")
        out += struct.pack("<H", len(header))
    else:
        out += struct.pack("<I", len(header))
    out += header
    out += np.ascontiguousarray(
        arr.T if fortran else arr).astype(descr).tobytes()
    return bytes(out)


def _id_cast(id_type: str):
    return str if id_type == "string" else int


def read_npy_shards(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload",
                    id_type: str = "long") -> DataFrame:
    """(id, npy bytes) rows → (id, descr, fortran_order, shape,
    values) with values flattened to C order as doubles. Narrow
    mapInPandas; stats/filters over `values` stay JVM-side
    (F.aggregate / F.transform) in callers."""
    conv = _id_cast(id_type)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        cols = [id_col, "descr", "fortran_order", "shape", "values"]
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                descr, fortran, shape, flat = parse_npy(bytes(payload))
                out.append((conv(did), descr, fortran,
                            [int(d) for d in shape],
                            [float(v) for v in flat]))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} {id_type}, descr string, "
                "fortran_order boolean, shape array<long>, "
                "values array<double>")


# ------------------------------------------------------------------
# safetensors
# ------------------------------------------------------------------
def parse_safetensors(b: bytes):
    """Parse one safetensors payload.

    Returns ``(metadata, tensors)`` where metadata is the optional
    ``__metadata__`` string map and tensors is a list of
    ``(name, dtype_tag, shape, flat ndarray)`` in header order.
    Validates offsets: in-bounds, non-negative extents, matching
    ``prod(shape) * itemsize``, and no overlap between buffers.
    """
    if len(b) < 8:
        raise ValueError("not a safetensors file (too short)")
    (hlen,) = struct.unpack_from("<Q", b, 0)
    if 8 + hlen > len(b):
        raise ValueError("safetensors header overruns file")
    try:
        header = json.loads(b[8:8 + hlen].decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as exc:
        raise ValueError(f"bad safetensors header: {exc}") from exc
    data = memoryview(b)[8 + hlen:]
    metadata = header.pop("__metadata__", {}) or {}
    spans = []
    tensors = []
    for name, spec in header.items():
        tag = spec["dtype"]
        if tag not in _ST_DTYPES:
            raise ValueError(f"unsupported safetensors dtype {tag!r}")
        np_dt, is_bf16 = _ST_DTYPES[tag]
        dt = np.dtype(np_dt)
        shape = tuple(int(d) for d in spec["shape"])
        s, e = (int(x) for x in spec["data_offsets"])
        count = 1
        for d in shape:
            count *= d
        if not (0 <= s <= e <= len(data)):
            raise ValueError(f"tensor {name!r}: offsets [{s},{e}) "
                             f"outside data section of {len(data)} B")
        if e - s != count * dt.itemsize:
            raise ValueError(
                f"tensor {name!r}: extent {e - s} != "
                f"prod(shape)*itemsize {count * dt.itemsize}")
        spans.append((s, e, name))
        flat = np.frombuffer(data[s:e], dtype=dt, count=count)
        if is_bf16:  # widen: bf16 is the high half of an f32
            flat = (flat.astype(np.uint32) << 16).view(np.float32)
        tensors.append((name, tag, shape, flat))
    spans.sort()
    for (s1, e1, n1), (s2, e2, n2) in zip(spans, spans[1:]):
        if s2 < e1:
            raise ValueError(f"tensors {n1!r} and {n2!r} overlap")
    return metadata, tensors


def encode_safetensors(tensors: dict, metadata: dict = None) -> bytes:
    """safetensors writer (header JSON + packed LE buffers), the
    round-trip twin of `parse_safetensors`."""
    header = {}
    bufs = []
    off = 0
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        le = arr.astype(arr.dtype.newbyteorder("<")) \
            if arr.dtype.byteorder == ">" else arr
        tag = _ST_TAG_OF.get(np.dtype(le.dtype.str.replace(">", "<")))
        if tag is None:
            raise ValueError(f"no safetensors tag for dtype {arr.dtype}")
        raw = le.tobytes()
        header[name] = {"dtype": tag, "shape": list(arr.shape),
                        "data_offsets": [off, off + len(raw)]}
        bufs.append(raw)
        off += len(raw)
    if metadata:
        header["__metadata__"] = {str(k): str(v)
                                  for k, v in metadata.items()}
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    hjson += b" " * ((8 - (8 + len(hjson)) % 8) % 8)  # align data to 8
    return struct.pack("<Q", len(hjson)) + hjson + b"".join(bufs)


def read_safetensors(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload",
                     id_type: str = "long") -> DataFrame:
    """(id, safetensors bytes) rows → one row per TENSOR:
    (id, name, dtype, shape, values, meta). Values are flattened to
    doubles (exact for the integer-valued fixtures; document-scale
    i64 ids that exceed 2^53 should keep I64 shards separate and use
    a dedicated reader). Narrow mapInPandas."""
    conv = _id_cast(id_type)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        cols = [id_col, "name", "dtype", "shape", "values", "meta"]
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                meta, tensors = parse_safetensors(bytes(payload))
                for name, tag, shape, flat in tensors:
                    out.append((conv(did), name, tag,
                                [int(d) for d in shape],
                                [float(v) for v in flat],
                                {str(k): str(v)
                                 for k, v in meta.items()}))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} {id_type}, name string, dtype string, "
                "shape array<long>, values array<double>, "
                "meta map<string,string>")


# ------------------------------------------------------------------
# Arrow IPC (Feather v2)
# ------------------------------------------------------------------
def read_arrow_shards(df: DataFrame, out_schema: str,
                      id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """(id, Arrow-IPC-file bytes) rows → the shard's rows, with the
    shard id prepended. ``out_schema`` is the Spark DDL of the OUTPUT
    (id column first, then the columns every shard carries —
    tensor-shard fleets are schema-homogeneous by construction).
    Batches stream out one record batch at a time, so a shard never
    needs to fit in a single pandas frame beyond its largest batch.
    """
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pyarrow as _pa

        for pdf in batches:
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                rd = _pa.ipc.open_file(_pa.BufferReader(bytes(payload)))
                shard_id = did if isinstance(did, str) else int(did)
                for i in range(rd.num_record_batches):
                    part = rd.get_batch(i).to_pandas()
                    part.insert(0, id_col, shard_id)
                    yield part

    return df.select(id_col, payload_col).mapInPandas(
        kernel, out_schema)


def read_tensor_dir(spark: SparkSession, path: str, kind: str,
                    out_schema: str = None,
                    max_file_bytes: int = MAX_BINARYFILE_BYTES
                    ) -> DataFrame:
    """Whole-file loader: every file under ``path`` becomes one shard
    row (size-guarded, metadata-only pre-check), decoded by format:
    kind='npy' | 'safetensors' | 'arrow' (arrow needs out_schema,
    WITHOUT the id column — paths key the shards here)."""
    check_file_sizes(spark, path, max_file_bytes, f"{kind} shard",
                     "Re-shard the tensors and retry.")
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content")
             .withColumnRenamed("path", "shard")
             .withColumnRenamed("content", "payload"))
    if kind == "npy":
        return read_npy_shards(files, id_col="shard", id_type="string")
    if kind == "safetensors":
        return read_safetensors(files, id_col="shard",
                                id_type="string")
    if kind == "arrow":
        if not out_schema:
            raise ValueError("arrow shards need out_schema")
        return read_arrow_shards(files, f"shard string, {out_schema}",
                                 id_col="shard")
    raise ValueError(f"unknown tensor shard kind {kind!r}")
