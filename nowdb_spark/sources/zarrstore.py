"""Zarr v2 array stores (zipped) — the chunked-tensor format of
large-scale ML/scientific corpora (public spec: zarr v2 storage
layout). A store is a key→bytes map; this module reads the common
shipping form, a ZIP "ZipStore", with:

* ``.zarray`` — JSON array metadata: zarr_format 2, shape, chunks,
  dtype (NumPy typestr, e.g. "<f4"/"<i8"), order "C"/"F",
  fill_value, compressor (null or {"id": "zlib", "level": n}; the
  numcodecs zlib codec is stdlib-replayable, others are gated),
* chunk keys ``"i.j.…"`` — grid indices joined by '.', each the
  (optionally zlib-compressed) raw buffer of ONE chunk, edge chunks
  stored at FULL chunk shape and trimmed on read,
* missing chunk keys — fill_value (sparse stores).

Scale shape: one store per row (binary column), decoded in a narrow
mapInPandas kernel — file-parallel like the other wd* shard readers;
no shuffle. The encoder twin builds byte-exact stores for fixtures
and the oracle replays the per-element arithmetic.

Reference parity note: the reference engine has no tensor formats;
this belongs to the training-data-pipeline extension family.
"""

from __future__ import annotations

import io
import json
import zipfile
import zlib
from itertools import product

from pyspark.sql import DataFrame

# per-store payload guard: a single binary cell this large would blow
# the Arrow batch / task heap — same rationale as binlimits'
# whole-file bound, applied per row here
MAX_STORE_BYTES = 256 * 1024 * 1024


def encode_zarr_zipstore(arr, chunks, compressor: "str | None" = None,
                         level: int = 6,
                         drop_chunks: "set | None" = None) -> bytes:
    """Byte-exact v2 ZipStore from a numpy array: .zarray metadata +
    C-order chunk buffers (edge chunks zero-padded to full chunk
    shape per the spec). ``drop_chunks`` omits chunk keys (they read
    back as fill_value). compressor: None or 'zlib'."""
    import numpy as np

    arr = np.asarray(arr)
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "order": "C",
        "fill_value": 0,
        "filters": None,
        "compressor": ({"id": "zlib", "level": level}
                       if compressor == "zlib" else None),
    }
    buf = io.BytesIO()
    grid = [range((s + c - 1) // c)
            for s, c in zip(arr.shape, chunks)]
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(".zarray", json.dumps(meta, sort_keys=True))
        for idx in product(*grid):
            key = ".".join(str(i) for i in idx)
            if drop_chunks and key in drop_chunks:
                continue
            full = np.zeros(chunks, dtype=arr.dtype)
            sl = tuple(slice(i * c, min((i + 1) * c, s))
                       for i, c, s in zip(idx, chunks, arr.shape))
            part = arr[sl]
            full[tuple(slice(0, p) for p in part.shape)] = part
            raw = full.tobytes(order="C")
            if compressor == "zlib":
                raw = zlib.compress(raw, level)
            zf.writestr(key, raw)
    return buf.getvalue()


def decode_zarr_zipstore(b: bytes):
    """Parse one ZipStore → dict(shape, chunks, dtype, order,
    n_chunks_stored, values: numpy array). Raises on zarr_format≠2,
    non-zlib compressors, or filters (honest gates)."""
    import numpy as np

    zf = zipfile.ZipFile(io.BytesIO(b))
    names = set(zf.namelist())
    if ".zarray" not in names:
        raise ValueError("zarr: no .zarray metadata key")
    meta = json.loads(zf.read(".zarray"))
    if meta.get("zarr_format") != 2:
        raise NotImplementedError(
            f"zarr format {meta.get('zarr_format')} not supported "
            "(v2 only; v3 moves metadata to zarr.json)")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") != "zlib":
        raise NotImplementedError(
            f"zarr compressor {comp.get('id')!r} needs numcodecs "
            "(absent here) — zlib/raw chunks are decoded for real")
    if meta.get("filters"):
        raise NotImplementedError("zarr filters not supported")
    shape = tuple(meta["shape"])
    chunks = tuple(meta["chunks"])
    dtype = np.dtype(meta["dtype"])
    order = meta.get("order", "C")
    fill = meta.get("fill_value") or 0
    out = np.full(shape, fill, dtype=dtype)
    grid = [range((s + c - 1) // c) for s, c in zip(shape, chunks)]
    n_stored = 0
    for idx in product(*grid):
        key = ".".join(str(i) for i in idx)
        if key not in names:
            continue
        raw = zf.read(key)
        if comp is not None:
            raw = zlib.decompress(raw)
        n_stored += 1
        block = np.frombuffer(raw, dtype=dtype).reshape(chunks,
                                                        order=order)
        sl = tuple(slice(i * c, min((i + 1) * c, s))
                   for i, c, s in zip(idx, chunks, shape))
        out[sl] = block[tuple(slice(0, x.stop - x.start)
                              for x in sl)]
    return {"shape": shape, "chunks": chunks, "dtype": dtype.str,
            "order": order, "n_chunks_stored": n_stored,
            "values": out}


def read_zarr_zipstores(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """Distributed ZipStore ingestion: one row per store →
    (id, dtype, n_rows, n_cols, n_chunks, val_sum, val_wsum) with
    val_sum = Σ values and val_wsum = Σ (flat_pos+1)·value over the
    trimmed C-order array — position-weighted so chunk-placement
    mistakes (wrong grid index, untrimmed edge padding) change the
    answer. Narrow, zero-shuffle; shares the binary size guard."""
    schema = (f"{id_col} long, dtype string, n_rows long, "
              "n_cols long, n_chunks long, val_sum long, "
              "val_wsum long")

    def kernel(batches):
        import pandas as _pd

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if len(b) > MAX_STORE_BYTES:
                    raise ValueError(
                        f"zarr zipstore payload {len(b)} bytes "
                        f"exceeds the {MAX_STORE_BYTES} per-row "
                        "bound — split the store or raise "
                        "MAX_STORE_BYTES deliberately")
                m = decode_zarr_zipstore(b)
                if m["values"].dtype.kind not in "iu":
                    raise NotImplementedError(
                        f"zarr dtype {m['dtype']} has float values; "
                        "the long checksum columns would truncate "
                        "them — use decode_zarr_zipstore directly "
                        "or add double checksum columns")
                flat = m["values"].reshape(-1)
                wsum = int(sum((i + 1) * int(v)
                               for i, v in enumerate(flat.tolist())))
                rows.append((int(did), m["dtype"],
                             int(m["shape"][0]),
                             int(m["shape"][1]
                                 if len(m["shape"]) > 1 else 1),
                             m["n_chunks_stored"],
                             int(flat.sum()), wsum))
            yield _pd.DataFrame(rows, columns=[
                id_col, "dtype", "n_rows", "n_cols", "n_chunks",
                "val_sum", "val_wsum"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)
