"""Streaming sketch maintenance: persisted HLL / Count-Min state kept
current by a stream.

The batch sketches (operators/sketches.py) are algebraic — HLL merges
by register max, CMS by cell sum — which makes their streaming twins
trivial and EXACT: each micro-batch writes its own partial sketch
under ``batch=<id>``; the merged read-side view equals the sketch of
everything ever streamed, bit-for-bit (the maintenance never
approximates beyond what the batch sketch already does).

This is the cardinality / heavy-hitter monitor a 100 TB ingest needs:
state on disk is O(registers), per-batch work is one map + one tiny
groupBy, and a replayed micro-batch (failure before checkpoint
commit) OVERWRITES its own partition — idempotent by construction,
the same discipline as streaming/dedup.maintain_index_batch (which
must additionally self-exclude on read; sketches read nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nowdb_spark.operators import sketches as sk


def maintain_sketch_batch(batch_df: DataFrame, batch_id: int, col: str,
                          hll_dir: str | None = None,
                          cms_dir: str | None = None) -> None:
    """ONE micro-batch: write this batch's partial HLL register table
    and/or CMS counter table under ``batch=<id>`` (overwrite — replay
    rewrites identical files)."""
    if hll_dir is not None:
        sk.hll_sketch(batch_df, col).write.mode("overwrite") \
            .parquet(f"{hll_dir}/batch={batch_id}")
    if cms_dir is not None:
        sk.cms_sketch(batch_df, col).write.mode("overwrite") \
            .parquet(f"{cms_dir}/batch={batch_id}")


def stream_sketch_maintenance(stream_df: DataFrame, col: str,
                              checkpoint_dir: str,
                              hll_dir: str | None = None,
                              cms_dir: str | None = None):
    """foreachBatch writer keeping the persisted sketches current.
    Seed either directory with a batch-built sketch under
    ``batch=seed`` to continue from an existing corpus."""
    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        maintain_sketch_batch(batch_df, batch_id, col, hll_dir, cms_dir)

    return (stream_df.writeStream
            .foreachBatch(per_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
            .trigger(availableNow=True))


def read_hll(spark: SparkSession, hll_dir: str) -> DataFrame:
    """Merged register table across every batch partition — feed to
    operators.sketches.hll_estimate."""
    return (spark.read.option("basePath", hll_dir).parquet(hll_dir)
            .groupBy("register").agg(F.max("max_rank").alias("max_rank")))


def read_cms(spark: SparkSession, cms_dir: str) -> DataFrame:
    """Merged counter table across every batch partition."""
    return (spark.read.option("basePath", cms_dir).parquet(cms_dir)
            .groupBy("row_id", "cell").agg(F.sum("cnt").alias("cnt")))
