"""Bucketed storage: pre-shuffled on-disk layout for repeated joins.

The reference co-locates edge rows with their origin vertex through
B-tree clustering (store/, index/); the Spark-native equivalent is
bucketing — `bucketBy(n, key)` hashes rows into a fixed number of
files per partition at WRITE time, so every later equi-join or
aggregation on the bucket key reads co-located data and skips its
Exchange entirely. At 100 TB this converts the nightly fact-fact join
from two full shuffles into a zero-shuffle sort-merge over matching
bucket files; the write-side shuffle is paid once, not per query.

Bucketing needs table metadata (bucket spec lives in the catalog, not
the parquet footer), so these helpers register the data as a catalog
table backed by an explicit path. `spark.sql.sources.bucketing.enabled`
is on by default; reads require no special conf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32,
                   sort_cols: list[str] | None = None,
                   path: str | None = None,
                   fmt: str = "parquet") -> None:
    """Write `df` as a bucketed catalog table.

    `sort_cols` additionally sorts rows inside each bucket file —
    joins on (bucket, sort) prefix can then skip their local sort too
    (plan shows SortMergeJoin with neither Exchange nor Sort on that
    side). `n_buckets` must match across tables meant to co-join.
    """
    w = df.write.format(fmt).mode("overwrite") \
        .bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def cojoin(spark: SparkSession, left: str, right: str,
           on: list[str], how: str = "inner") -> DataFrame:
    """Join two bucketed tables on their bucket key. With matching
    bucket specs the physical plan contains no Exchange on either
    side (verified by tests/test_bucketing.py's plan gate)."""
    return spark.table(left).join(spark.table(right), on, how)
