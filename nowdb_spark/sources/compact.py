"""Context compaction — the Spark image of the reference's background
sorter (store/storewrk.c:33-160: pending files → sorted, compressed
reader files).

Row-at-a-time INSERTs leave one tiny parquet file each (the moral
equivalent of nowdb's pending files). `compact_context` rewrites a
context into right-sized, stamp-sorted files:

  - sortWithinPartitions(stamp) reproduces the reader-file ordering
    that makes range scans sequential,
  - file count is chosen from the actual byte size (target ~128 MB
    per file — the cluster-friendly parquet size),
  - day-bucket partitioning is preserved,
  - the rewrite is atomic per context (write to .compact-tmp, swap).

At 100 TB this runs per-partition (compact only buckets whose file
count exceeds a threshold), exactly like the reference sorts only
full pending files.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nowdb_spark.catalog import TypeDef

TARGET_FILE_BYTES = 128 * 1024 * 1024


def context_file_stats(ctx_dir: Path) -> tuple[int, int]:
    """(n_files, total_bytes) of a context's parquet data."""
    n = b = 0
    for p in Path(ctx_dir).rglob("*.parquet"):
        n += 1
        b += p.stat().st_size
    return n, b


def compact_context(spark: SparkSession, ctx_dir: str | Path,
                    tdef: TypeDef,
                    target_file_bytes: int = TARGET_FILE_BYTES,
                    min_files: int = 8,
                    codec: str | None = None) -> dict:
    """Rewrite a context into few, sorted files. Returns a report
    {files_before, files_after, bytes}."""
    ctx_dir = Path(ctx_dir)
    n_before, total = context_file_stats(ctx_dir)
    if n_before <= min_files:
        return {"files_before": n_before, "files_after": n_before,
                "bytes": total, "skipped": True}

    df = spark.read.parquet(str(ctx_dir))
    stamp = tdef.stamp_prop
    n_files = max(1, total // target_file_bytes + 1)
    tmp = ctx_dir.with_suffix(".compact-tmp")
    shutil.rmtree(tmp, ignore_errors=True)

    if stamp is not None and "__tb" in df.columns:
        out = (df.repartition(int(n_files), F.col("__tb"))
               .sortWithinPartitions("__tb", stamp))
        w = out.write.mode("overwrite").partitionBy("__tb")
        if codec:
            w = w.option("compression", codec)
        w.parquet(str(tmp))
    else:
        out = df.coalesce(int(n_files))
        if stamp is not None:
            out = out.sortWithinPartitions(stamp)
        w = out.write.mode("overwrite")
        if codec:
            w = w.option("compression", codec)
        w.parquet(str(tmp))

    old = ctx_dir.with_suffix(".compact-old")
    shutil.rmtree(old, ignore_errors=True)
    ctx_dir.rename(old)
    tmp.rename(ctx_dir)
    shutil.rmtree(old, ignore_errors=True)
    n_after, _ = context_file_stats(ctx_dir)
    return {"files_before": n_before, "files_after": n_after,
            "bytes": total, "skipped": False}
