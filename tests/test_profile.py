"""Dataset profiling: one-pass stats vs hand-computed values,
approx path sanity, null handling."""

from pyspark.sql import functions as F

from nowdb_spark.operators.profile import profile


def test_profile_values(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (3, 4.0, None), (3, 6.0, "a")],
        "k long, v double, s string")
    p = {r["column"]: r for r in profile(df).collect()}
    assert p["k"]["n_rows"] == 4 and p["k"]["n_nulls"] == 0
    assert p["k"]["n_distinct"] == 3
    assert (p["k"]["min_str"], p["k"]["max_str"]) == ("1", "3")
    assert p["v"]["n_nulls"] == 1 and p["v"]["n_distinct"] == 3
    assert p["v"]["mean"] == 4.0
    assert p["s"]["n_nulls"] == 1 and p["s"]["n_distinct"] == 2
    assert p["s"]["mean"] is None and p["s"]["stddev"] is None


def test_profile_min_is_numeric_not_lexicographic(spark):
    df = spark.createDataFrame([(9,), (10,), (100,)], "k long")
    p = {r["column"]: r for r in profile(df).collect()}
    assert (p["k"]["min_str"], p["k"]["max_str"]) == ("9", "100")


def test_profile_approx_close(spark):
    df = spark.range(10000).select((F.col("id") % 1000).alias("k"))
    p = {r["column"]: r for r in profile(df, approx=True).collect()}
    assert abs(p["k"]["n_distinct"] - 1000) <= 100   # rsd 5%
