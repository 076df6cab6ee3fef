"""Stamp-encoding robustness: every ts-consuming operator must return
identical results no matter which physical encoding the parquet file
uses for the stamp column.

This is the regression test for the round-3 incident: the driver
regenerated /root/testdata and events.ts silently changed from parquet
TIMESTAMP(NANOS) to timestamp[us] (TIMESTAMP_NTZ in Spark), the
``nanosAsLong`` conf no-oped, and every ns-arithmetic query threw
DATATYPE_MISMATCH.  The engine's stamp policy (int64 ns,
reference types/types.h:70-71) is now enforced at the load edge by
``timeutil.normalize_stamps`` for all three encodings:

  * INT64 Long ns                (what the engine itself writes)
  * parquet TIMESTAMP(NANOS)     (via spark.sql.legacy.parquet.nanosAsLong)
  * parquet timestamp[us] / NTZ  (what pandas/pyarrow writers emit)

The fixture writes the SAME events sample in each encoding; every
parametrized operator must produce byte-identical rows over each.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from nowdb_spark.timeutil import normalize_stamps
from tests.conftest import SF_DIR

ENCODINGS = ("long_ns", "ts_nanos", "ts_micros")


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    """The sf0.001 events sample, written in all three encodings."""
    base = tmp_path_factory.mktemp("stamp_enc")
    tbl = pq.read_table(f"{SF_DIR}/events.parquet")
    i = tbl.schema.get_field_index("ts")
    col = tbl.column(i)
    if pa.types.is_timestamp(col.type):
        ns = col.cast(pa.timestamp("ns")).cast(pa.int64())
    else:
        ns = col.cast(pa.int64())
    out = {}
    variants = {
        "long_ns": ns,
        "ts_nanos": ns.cast(pa.timestamp("ns")),
        "ts_micros": (ns.cast(pa.timestamp("ns"))
                      .cast(pa.timestamp("us"))),
    }
    for name, column in variants.items():
        d = base / name
        d.mkdir()
        t = tbl.set_column(i, pa.field("ts", column.type), column)
        # version 2.6 keeps TIMESTAMP(NANOS) as NANOS (no us coercion)
        pq.write_table(t, d / "events.parquet", version="2.6")
        out[name] = str(d)
    return out


def _load(spark, d):
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong",
                      "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_stamps(spark.read.parquet(f"{d}/events.parquet"))


def test_written_encodings_differ(encoded_dirs):
    # the fixture must actually exercise three physical types
    types = {
        name: str(pq.read_schema(f"{d}/events.parquet").field("ts").type)
        for name, d in encoded_dirs.items()
    }
    assert types["long_ns"] == "int64"
    assert types["ts_nanos"] == "timestamp[ns]"
    assert types["ts_micros"] == "timestamp[us]"


def test_normalized_schema_is_long(spark, encoded_dirs):
    for d in encoded_dirs.values():
        df = _load(spark, d)
        assert dict(df.dtypes)["ts"] == "bigint", d


def test_normalized_values_identical(spark, encoded_dirs):
    ref = None
    for name in ENCODINGS:
        rows = sorted(
            _load(spark, encoded_dirs[name])
            .select("event_id", "ts").collect())
        if ref is None:
            ref = rows
        else:
            assert rows == ref, name


# --- ts-consuming operators over each encoding ----------------------

def _ops(df):
    """Representative ns-arithmetic consumers: range filter, bucket
    agg (downsample), time extraction — the q04/q13/ts01 shapes that
    broke in round 3."""
    from nowdb_spark import timeutil as TU
    lo, hi = 1704844800000000000, 1705708800000000000
    rng = df.filter((F.col("ts") >= lo) & (F.col("ts") < hi)).count()
    day = 86_400_000_000_000
    buckets = sorted(
        df.groupBy((F.col("ts") - F.pmod(F.col("ts"), F.lit(day)))
                   .alias("b"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6)
             .alias("s"))
        .collect())
    hours = sorted(
        df.select("event_id", TU.hour(F.col("ts")).alias("h"))
        .limit(500).collect())
    return rng, buckets, hours


@pytest.mark.parametrize("name", ENCODINGS[1:])
def test_operators_identical_across_encodings(spark, encoded_dirs, name):
    want = _ops(_load(spark, encoded_dirs["long_ns"]))
    got = _ops(_load(spark, encoded_dirs[name]))
    assert got == want


def test_engine_mount_normalizes(spark, tmp_path, encoded_dirs):
    """The engine mount path must expose Long-ns ts for every
    encoding (dialect nq04/nq13/nq15 shape)."""
    from nowdb_spark.engine import Engine
    for name, d in encoded_dirs.items():
        eng = Engine(spark, tmp_path / f"eng_{name}")
        eng.rexecute(f"create scope s_{name}")
        eng.rexecute(f"use s_{name}")
        eng.scope.mount("events", f"{d}/events.parquet")
        row = eng.one_row(
            "select count(*) as n from events "
            "where ts >= 1704844800000000000 "
            "and ts < 1705708800000000000")
        assert row is not None and row[0] > 0, name
