"""Skew helpers: salted aggregation/join must equal their direct
counterparts on data with one pathological hot key."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nowdb_spark.operators import skew as K


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 7 (the hot key), rest uniform
    df = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 13).cast("double").alias("v"))
    return df.cache()


def test_salted_agg_matches_direct(spark, skewed):
    direct = {(r["k"]): (r["n"], r["s"]) for r in
              skewed.groupBy("k")
              .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
              .collect()}
    salted = K.salted_agg(
        skewed, "k", salt_source="row_id", n_salts=8,
        partial_aggs=[F.count(F.lit(1)).alias("pn"),
                      F.sum("v").alias("ps")],
        final_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")])
    got = {(r["k"]): (r["n"], r["s"]) for r in salted.collect()}
    assert got == direct


def test_salted_join_matches_direct(spark, skewed):
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("d"))
    direct = sorted((r["row_id"], r["d"]) for r in
                    skewed.join(dim, "k").collect())
    salted = sorted((r["row_id"], r["d"]) for r in
                    K.salted_join(skewed, dim, "k", n_salts=8,
                                  salt_source="row_id").collect())
    assert salted == direct
    assert len(salted) == 20_000


def test_salted_join_left(spark, skewed):
    dim = spark.range(5).select(  # most keys unmatched
        F.col("id").alias("k"), F.lit("x").alias("d"))
    direct = skewed.join(dim, "k", "left").count()
    salted = K.salted_join(skewed, dim, "k", n_salts=4,
                           salt_source="row_id", how="left").count()
    assert salted == direct


def test_hot_key_split_join_matches_plain_join(spark):
    """Split join == plain join on a skewed dataset, for inner and
    left; the hot branch broadcasts its build rows."""
    from nowdb_spark.operators.skew import hot_key_split_join

    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 1), (3, 2), (9, 0)],
        "k long, v long")
    small = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (4, "unused")], "k long, name string")

    for how in ("inner", "left"):
        want = sorted(tuple(r) for r in big.join(small, "k", how).collect())
        got_df = hot_key_split_join(big, small, "k",
                                    hot_threshold=100, how=how)
        got = sorted(tuple(r) for r in got_df.collect())
        assert got == want, (how, len(got), len(want))
    plan = (hot_key_split_join(big, small, "k", hot_threshold=100)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan

    # caller-supplied hot keys skip the counting pass
    got = sorted(tuple(r) for r in hot_key_split_join(
        big, small, "k", hot_keys=[1]).collect())
    want = sorted(tuple(r) for r in big.join(small, "k").collect())
    assert got == want
