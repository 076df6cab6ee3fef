"""Approximate-aggregate error bounds vs exact computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from nowdb_spark.functions import aggregates as A
from nowdb_spark.workload import QUERIES
from tests.conftest import SF_DIR


def test_approx_within_bounds(spark):
    """q26 now carries its own bounds contract: the query emits
    booleans asserting each approximation sits inside the published
    error, alongside the exact columns the oracle hash-matches."""
    rows = QUERIES["q26_approx_aggs"].spark(spark, SF_DIR).collect()
    assert rows
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = {r["l_returnflag"]: r for r in
             li.groupBy("l_returnflag").agg(
                 F.countDistinct("l_orderkey").alias("d"),
                 F.count(F.lit(1)).alias("c")).collect()}
    for g in rows:
        e = exact[g["l_returnflag"]]
        assert g["approx_orders_ok"] and g["approx_med_ok"], g
        assert g["orders_exact"] == e["d"] and g["cnt"] == e["c"]


def test_median_approx_close_to_exact(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    row = li.agg(
        A.median(F.col("l_quantity")).alias("exact"),
        A.median_approx(F.col("l_quantity")).alias("approx")).first()
    assert abs(row["approx"] - row["exact"]) <= 1.0
