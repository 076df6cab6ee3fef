"""Shared binaryFile size guard.

``spark.read.format("binaryFile")`` materializes each file as ONE row;
Spark's byte-array and Arrow limits sit just under 2 GiB, and a file
over the line fails as an opaque Arrow/negative-length error deep in a
task. Real crawl WARCs and WebDataset tar shards flirt with 1 GiB+ by
convention, so whole-file readers PRE-CHECK sizes (a metadata-only
listing — content is never read) and raise a clear, actionable error
instead.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# headroom under the hard ~2 GiB (2_147_483_647 B) row limit
MAX_BINARYFILE_BYTES = 1_800_000_000


def check_file_sizes(spark: SparkSession, path: str,
                     max_file_bytes: int, kind: str,
                     reshard_hint: str) -> None:
    """Metadata-only listing of ``path``; raises ValueError naming up
    to 5 offending files if any exceeds ``max_file_bytes``."""
    listing = spark.read.format("binaryFile").load(path)
    over = (listing.select("path", "length")
            .where(F.col("length") > int(max_file_bytes))
            .limit(5).collect())
    if over:
        names = ", ".join(f"{r['path']} ({r['length']:,} B)"
                          for r in over)
        raise ValueError(
            f"{kind} file(s) exceed max_file_bytes="
            f"{int(max_file_bytes):,} and would overflow the ~2 GiB "
            f"binaryFile row limit: {names}. {reshard_hint}")
