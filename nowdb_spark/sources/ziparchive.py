"""ZIP shard ingestion — the other archive container corpora ship in.

Mirrors sources/webdataset.py's tar path: zip bytes (whole files via
binaryFile, or a bytes column) explode to one row per member via
stdlib zipfile (stored + deflate members both decode), with the same
first-dot basename/ext split and (shard, basename) sample regroup.
DEFLATE decompression happens inside the per-file kernel — narrow,
file-parallel, no shuffle until the optional regroup.

Reference parity note: the reference engine has no archive handling;
this belongs to the training-data-pipeline extension surface
(SURVEY.md §2 pipeline family).
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nowdb_spark.sources.binlimits import (
    MAX_BINARYFILE_BYTES, check_file_sizes)
from nowdb_spark.sources.webdataset import _split_name

ZIP_MAX_FILE_BYTES = MAX_BINARYFILE_BYTES


def parse_zip_bytes(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """Member-level zip parse over a BYTES COLUMN: one row per
    regular member (id, basename, ext, payload). Directories and
    unreadable archives are skipped, never a task failure."""
    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io as _io
        import zipfile as _zip

        import pandas as _pd

        for pdf in batches:
            out = []
            for did, content in zip(pdf[id_col], pdf[payload_col]):
                try:
                    zf = _zip.ZipFile(_io.BytesIO(bytes(content)))
                except (_zip.BadZipFile, OSError):
                    continue
                with zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        base, ext = _split_name(info.filename)
                        try:
                            payload = zf.read(info)
                        except (_zip.BadZipFile, NotImplementedError):
                            continue
                        out.append((int(did), base, ext, payload))
            yield _pd.DataFrame(out, columns=[id_col, "basename",
                                              "ext", "payload"])

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} long, basename string, ext string, "
                "payload binary")


def read_zip(spark: SparkSession, path: str,
             max_file_bytes: int = ZIP_MAX_FILE_BYTES) -> DataFrame:
    """Zip archives under ``path`` → one row per SAMPLE:
    (shard, basename, parts: map<ext, binary>) — the zip twin of
    read_webdataset, same size pre-check and single regroup
    shuffle."""
    check_file_sizes(spark, path, max_file_bytes, "ZIP archive",
                     "Re-shard at member boundaries and retry.")
    files = spark.read.format("binaryFile").load(path)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io as _io
        import zipfile as _zip

        import pandas as _pd

        for pdf in batches:
            out = []
            for shard, content in zip(pdf["path"], pdf["content"]):
                try:
                    zf = _zip.ZipFile(_io.BytesIO(bytes(content)))
                except (_zip.BadZipFile, OSError):
                    continue
                with zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        base, ext = _split_name(info.filename)
                        try:
                            payload = zf.read(info)
                        except (_zip.BadZipFile, NotImplementedError):
                            continue
                        out.append((shard, base, ext, payload))
            yield _pd.DataFrame(out, columns=["shard", "basename",
                                              "ext", "payload"])

    members = files.select("path", "content").mapInPandas(
        kernel, "shard string, basename string, ext string, "
                "payload binary")
    return (members
            .groupBy("shard", "basename")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("ext", "payload")))
                .alias("parts")))


def encode_zip(members: list, compress: bool = True) -> bytes:
    """Fixture builder: real zip bytes from [(name, payload), …]
    (deterministic date_time so archives are byte-stable)."""
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        for name, payload in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = method
            zf.writestr(info, payload)
    return buf.getvalue()
