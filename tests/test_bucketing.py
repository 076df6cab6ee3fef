"""Bucketed co-located joins: the write-once-shuffle-never layout.
Plan gates assert the Exchange really disappears."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nowdb_spark.plans.inspect import plan_string
from nowdb_spark.sources.bucketing import write_bucketed, cojoin


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    facts = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    dims = spark.range(2_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
    write_bucketed(facts, "b_facts", ["k"], n_buckets=8,
                   sort_cols=["k"], path=str(tmp_path / "facts"))
    write_bucketed(dims, "b_dims", ["k"], n_buckets=8,
                   sort_cols=["k"], path=str(tmp_path / "dims"))
    yield "b_facts", "b_dims"
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    # force SMJ (broadcast would hide the bucketing win at toy size)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cojoin(spark, left, right, ["k"])
        plan = plan_string(j, "formatted")
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange" not in plan, plan[:2000]
        # correctness, not just shape
        assert j.count() == 2_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    left, _ = bucketed_pair
    agg = spark.table(left).groupBy("k").agg(F.sum("v").alias("s"))
    plan = plan_string(agg, "formatted")
    assert "Exchange" not in plan, plan[:2000]
    assert agg.count() == 10_000


def test_unbucketed_baseline_does_shuffle(spark, tmp_path):
    """Sanity: the same join over plain parquet DOES exchange — the
    bucketing test above is meaningful."""
    facts = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    dims = spark.range(2_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
    facts.write.mode("overwrite").parquet(str(tmp_path / "pf"))
    dims.write.mode("overwrite").parquet(str(tmp_path / "pd"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.read.parquet(str(tmp_path / "pf")).join(
            spark.read.parquet(str(tmp_path / "pd")), ["k"])
        plan = plan_string(j, "formatted")
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
