"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the decode kernels are
STUBS behind `_HAVE_CODECS` — the Spark-side plumbing (binary schema,
Arrow batch shape, mapInPandas signature, partitioning) is real and
tested. Swap `_fake_decode` for a PIL/libav call and nothing else
changes.

Design for 100 TB of media: binary payloads stay in their partition
(mapInPandas = narrow, zero shuffle); metadata extraction emits small
typed rows; frame sampling / resize emit binary again. Batch size is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch — lower it for
large blobs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real codecs are not in this container — keep the import gated
    import PIL.Image  # type: ignore # noqa: F401
    _HAVE_CODECS = True
except ImportError:
    _HAVE_CODECS = False

META_SCHEMA = ("doc_id long, n_bytes long, fake_width long, "
               "fake_height long, fmt string")


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: derives a plausible
    (width, height, format) purely from the byte length so oracles can
    reproduce it. Replace with a real decoder when codecs exist."""
    n = len(payload)
    return {
        "n_bytes": n,
        "fake_width": n % 64 + 1,
        "fake_height": (n // 64) % 64 + 1,
        "fmt": "fake/raw",
    }


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real decode entry point — requires codec libs."""
    if not _HAVE_CODECS:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "metadata plumbing uses _fake_decode")
    raise NotImplementedError("wire to PIL.Image.open(io.BytesIO(payload))")


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture an opaque binary column from text (the testdata has
    no real media; utf-8 bytes stand in for an encoded image)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_meta(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """mapInPandas metadata extraction over binary payloads.

    Narrow (per-partition) operation: Arrow ships (id, binary) batches
    to Python, the kernel emits typed metadata rows.
    """
    # NOTE: the kernel must be closure-self-contained (no references
    # to module globals) — executors unpickle it without having
    # nowdb_spark importable when the engine is used as a path-added
    # library rather than an installed package.
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def fake_decode(b: bytes) -> dict:
            n = len(b)
            return {"n_bytes": n, "fake_width": n % 64 + 1,
                    "fake_height": (n // 64) % 64 + 1, "fmt": "fake/raw"}

        for pdf in batches:
            metas = pdf[payload_col].map(lambda b: fake_decode(bytes(b)))
            out = _pd.DataFrame(list(metas))
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(kernel, META_SCHEMA)


def resize_image(df: DataFrame, width: int = 32, height: int = 32,
                 id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """'Resize' plumbing: binary in → binary out at a fixed target
    size (width*height bytes — what a thumbnailer's output shape looks
    like). The deterministic fake truncates/cycles payload bytes to
    the target length; a real implementation swaps in PIL resize and
    nothing else changes. Narrow, zero-shuffle."""
    schema = f"{id_col} long, resized binary, out_w int, out_h int"
    target = width * height

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def fake_resize(b: bytes) -> bytes:
            if not b:
                return bytes(target)
            reps = target // len(b) + 1
            return (b * reps)[:target]

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "resized": [fake_resize(bytes(b))
                            for b in pdf[payload_col]],
                "out_w": width,
                "out_h": height,
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def feature_extract(df: DataFrame, dim: int = 16,
                    id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """Binary → fixed-dim float feature vector (the embedding-
    extraction plumbing: array<float> column, Arrow-batched, narrow).
    The deterministic fake folds a rolling byte hash into `dim`
    buckets and L2-normalizes; a real model inference call has the
    same signature and batch shape."""
    schema = f"{id_col} long, features array<float>"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as _pd

        def fake_features(b: bytes) -> list:
            acc = [0.0] * dim
            h = 2166136261
            for i, byte in enumerate(b):
                h = (h ^ byte) * 16777619 % (1 << 32)
                acc[i % dim] += (h % 1000) / 1000.0
            norm = math.sqrt(sum(v * v for v in acc)) or 1.0
            return [v / norm for v in acc]

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "features": [fake_features(bytes(b))
                             for b in pdf[payload_col]],
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 997,
                 id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """'Frame sampling' plumbing: emit one row per sampled offset with
    a sliced binary chunk (what a video frame sampler's shuffle/output
    shape looks like). Deterministic; works on any binary column."""
    schema = f"{id_col} long, frame_no long, chunk binary"

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                for fno, off in enumerate(range(0, len(b), every_n_bytes)):
                    rows.append((did, fno, b[off:off + 16]))
            yield _pd.DataFrame(rows, columns=[id_col, "frame_no", "chunk"])

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)
