"""WebDataset-style tar shard ingestion — the training-data container.

Large multimodal training corpora ship as tar shards whose members
pair by basename: `000123.jpg` + `000123.txt` + `000123.json` form
one SAMPLE (the WebDataset convention). This module reads tar bytes
with stdlib tarfile (ustar/pax/gnu all handled), explodes members,
and regroups them into one row per sample with a map of
extension → payload — fully distributed (binaryFile rows fan out,
member decode never crosses a file boundary; the sample regroup is
the only shuffle and it keys on (shard, basename)).

Reference parity note: the reference engine has no archive handling;
this belongs to the training-data-pipeline extension surface
(SURVEY.md §2 pipeline family).
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nowdb_spark.sources.binlimits import (
    MAX_BINARYFILE_BYTES, check_file_sizes)

MEMBER_SCHEMA = ("shard string, basename string, ext string, "
                 "payload binary")

# size guard shared with the WARC reader (see sources/binlimits.py)
WDS_MAX_FILE_BYTES = MAX_BINARYFILE_BYTES


def _split_name(name: str):
    """WebDataset split: basename = up to the FIRST dot of the final
    path component, ext = the rest ('a/b/000123.seg.png' →
    ('000123', 'seg.png'))."""
    leaf = name.rsplit("/", 1)[-1]
    base, _, ext = leaf.partition(".")
    return base, ext


def tar_members(df: DataFrame, path_col: str = "path",
                content_col: str = "content") -> DataFrame:
    """(shard path, tar bytes) rows → one row per regular member:
    (shard, basename, ext, payload). Narrow mapInPandas."""
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io as _io
        import tarfile as _tar

        import pandas as _pd

        cols = ["shard", "basename", "ext", "payload"]
        for pdf in batches:
            out = []
            for shard, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    tf = _tar.open(fileobj=_io.BytesIO(bytes(content)),
                                   mode="r:*")
                except _tar.TarError:
                    continue
                with tf:
                    for m in tf:
                        if not m.isreg():
                            continue
                        base, ext = _split_name(m.name)
                        out.append((shard, base, ext,
                                    tf.extractfile(m).read()))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(F.col(path_col).alias(path_col),
                     F.col(content_col).alias(content_col)) \
             .mapInPandas(kernel, MEMBER_SCHEMA)


def parse_tar_bytes(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """Member-level tar parse over a BYTES COLUMN (vs tar_members'
    whole-file rows): same tarfile walk, id passthrough — lets the
    encode→parse→regroup round trip run fully distributed with no
    filesystem involvement."""
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io as _io
        import tarfile as _tar

        import pandas as _pd

        cols = [id_col, "basename", "ext", "payload"]
        for pdf in batches:
            out = []
            for did, content in zip(pdf[id_col], pdf[payload_col]):
                try:
                    tf = _tar.open(fileobj=_io.BytesIO(bytes(content)),
                                   mode="r:*")
                except _tar.TarError:
                    continue
                with tf:
                    for m in tf:
                        if not m.isreg():
                            continue
                        base, ext = _split_name(m.name)
                        out.append((int(did), base, ext,
                                    tf.extractfile(m).read()))
            yield _pd.DataFrame(out, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} long, basename string, ext string, "
                "payload binary")


def read_webdataset(spark: SparkSession, path: str,
                    max_file_bytes: int = WDS_MAX_FILE_BYTES) -> DataFrame:
    """Tar shards under ``path`` → one row per SAMPLE:
    (shard, basename, parts: map<ext, binary>). The regroup shuffles
    on (shard, basename) — the only wide step; at production scale
    pre-sorted shards keep each sample's members adjacent so the
    map-side combine does nearly all the work.

    Shards larger than ``max_file_bytes`` raise ValueError up front
    (metadata-only listing; see binlimits.py) — re-shard them (the
    WebDataset convention is ~1 GB shards anyway) rather than raising
    the cap past the ~2 GiB binaryFile row limit."""
    check_file_sizes(spark, path, max_file_bytes, "WebDataset shard",
                     "Re-shard at sample boundaries and retry.")
    files = spark.read.format("binaryFile").load(path)
    members = tar_members(files.select("path", "content"))
    return (members
            .groupBy("shard", "basename")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("ext", "payload")))
                .alias("parts")))


def synth_tar_shards(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic one-shard-per-id tar bytes (the wd01 gate / bench
    fixture): id%3+1 samples, each a .txt ('d{id} s{k}') + .cls
    ('{(id+k)%10}') member pair. Narrow mapInPandas."""
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        def synth(did: int) -> bytes:
            did = int(did)
            members = []
            for s in range(did % 3 + 1):
                members.append((f"{did}_{s}.txt",
                                f"d{did} s{s}".encode()))
                members.append((f"{did}_{s}.cls",
                                str((did + s) % 10).encode()))
            return encode_tar(members)

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].values,
                "payload": [synth(x) for x in pdf[id_col]],
            })

    return df.select(id_col).mapInPandas(
        kernel, f"{id_col} long, payload binary")


def sample_regroup(shards: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Member parse + (id, basename) sample regroup over a tar-bytes
    column — the distributed WebDataset core shared by the wd01 gate
    row and the bench rate."""
    return (parse_tar_bytes(shards, id_col=id_col)
            .groupBy(id_col, "basename")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("ext", "payload")))
                .alias("parts")))


def encode_tar(members: list) -> bytes:
    """Fixture builder: real ustar bytes from [(name, payload), …]
    (deterministic mtime so shards are byte-stable)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()
