"""Shared fixtures: one tuned SparkSession per test run + a DuckDB
oracle connection with the testdata tables registered as views
(mirrors the driver's correctness gate)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from nowdb_spark.session import get_spark

SF_DIR = os.environ.get("NOWDB_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nowdb_spark_tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def normalize(rows, colnames):
    """Rows → order-insensitive comparable form (sorted tuples with
    columns sorted by name and floats quantized)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def conv(v):
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            return ("f", round(v, 9))
        if isinstance(v, int):
            return ("i", v)
        return ("s", str(v))

    out = [tuple(conv(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def assert_query_matches(spark, oracle, spec, sf_dir=SF_DIR):
    """Run spark impl + DuckDB oracle, compare rows order-insensitively."""
    sdf = spec.spark(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    ores = oracle.execute(spec.oracle)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    assert sorted(scols) == sorted(ocols), (
        f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}")
    assert len(srows) == len(orows), (
        f"row count mismatch: spark={len(srows)} oracle={len(orows)}")
    got = normalize([tuple(r) for r in srows], scols)
    want = normalize(orows, ocols)
    if got != want:
        for g, w in zip(got, want):
            assert g == w, f"first differing row:\n  spark={g}\n  oracle={w}"
        raise AssertionError("row multiset mismatch")
