"""Approximate-aggregate error bounds vs exact computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from nowdb_spark.functions import aggregates as A
from nowdb_spark.workload import QUERIES
from tests.conftest import SF_DIR


def test_approx_within_bounds(spark):
    got = {r["l_returnflag"]: r for r in
           QUERIES["q26_approx_aggs"].spark(spark, SF_DIR).collect()}
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = {r["l_returnflag"]: r for r in
             li.groupBy("l_returnflag").agg(
                 F.countDistinct("l_orderkey").alias("d"),
                 F.percentile(F.col("l_extendedprice"), F.lit(0.5))
                 .alias("m")).collect()}
    for k, e in exact.items():
        g = got[k]
        assert abs(g["approx_orders"] - e["d"]) / e["d"] < 0.1
        assert abs(g["approx_med_price"] - e["m"]) / e["m"] < 0.1


def test_median_approx_close_to_exact(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    row = li.agg(
        A.median(F.col("l_quantity")).alias("exact"),
        A.median_approx(F.col("l_quantity")).alias("approx")).first()
    assert abs(row["approx"] - row["exact"]) <= 1.0
