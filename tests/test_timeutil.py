"""timeutil unit tests: exactness of the i64-ns policy incl. negative
(pre-1970) stamps and the DAWN/DUSK range constants."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nowdb_spark import timeutil as TU


def test_parse_time_literal():
    assert TU.parse_time_literal("1970-01-01") == 0
    assert TU.parse_time_literal("1970-01-02") == 86400 * TU.NS_PER_SEC
    assert TU.parse_time_literal("2018-03-05T12:30:00") == int(
        dt.datetime(2018, 3, 5, 12, 30,
                    tzinfo=dt.timezone.utc).timestamp()) * TU.NS_PER_SEC
    assert TU.parse_time_literal("1960-01-01") < 0  # pre-epoch


def test_exact_division_boundaries(spark):
    ns_values = [
        1_704_068_217_102_229_522,   # sub-µs tail
        1_704_068_217_102_229_999,
        -1,                          # just before epoch
        -86400 * TU.NS_PER_SEC + 5,  # pre-1970
        0,
    ]
    df = spark.createDataFrame([(v,) for v in ns_values], "ns long")
    got = df.select(
        TU.ns_to_us(F.col("ns")).alias("us"),
        TU.epoch(F.col("ns")).alias("s"),
    ).collect()
    for (v,), row in zip([(v,) for v in ns_values], got):
        assert row["us"] == v // 1000, v      # python floor-div semantics
        assert row["s"] == v // TU.NS_PER_SEC, v


def test_extractors_pre_epoch(spark):
    ns = TU.parse_time_literal("1960-06-15T10:20:30")
    df = spark.createDataFrame([(ns,)], "ns long")
    row = df.select(
        TU.year(F.col("ns")).alias("y"), TU.month(F.col("ns")).alias("m"),
        TU.mday(F.col("ns")).alias("d"), TU.hour(F.col("ns")).alias("h"),
        TU.minute(F.col("ns")).alias("mi"),
        TU.second(F.col("ns")).alias("s"),
        TU.wday(F.col("ns")).alias("wd"),
    ).first()
    assert (row["y"], row["m"], row["d"]) == (1960, 6, 15)
    assert (row["h"], row["mi"], row["s"]) == (10, 20, 30)
    assert row["wd"] == dt.date(1960, 6, 15).isoweekday() % 7


def test_subsecond_components(spark):
    ns = 1_500_000_000 * TU.NS_PER_SEC + 123 * TU.NS_PER_MS \
        + 456 * TU.NS_PER_US + 789
    df = spark.createDataFrame([(ns,)], "ns long")
    row = df.select(
        TU.milli(F.col("ns")).alias("ms"),
        TU.micro(F.col("ns")).alias("us"),
        TU.nano(F.col("ns")).alias("nn"),
    ).first()
    assert (row["ms"], row["us"], row["nn"]) == (123, 456, 789)


def test_dawn_dusk(spark):
    row = (spark.range(1)
           .select(TU.dawn().alias("dawn"), TU.dusk().alias("dusk"))
           .first())
    assert row["dawn"] == -(2**63)
    assert row["dusk"] == 2**63 - 1


def test_parse_time_literal_pre_epoch_fraction():
    from nowdb_spark.timeutil import parse_time_literal
    assert parse_time_literal("1969-12-31T23:59:59.500000") == -500_000_000
    assert parse_time_literal("1970-01-01T00:00:00.500000") == 500_000_000
    assert parse_time_literal("1969-12-31") == -86_400_000_000_000
